package graft

import graft.ops.Cusum
import graft.streaming.{CusumEvent, StreamCusum}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CUSUM: bit-parity with the batch secondary-sort fold
  * across micro-batch splits; late rows degrade to None. */
class StreamCusumSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // key "a": drifting series split across two batches (statistics must
  // continue from state); key "b": one calm sample per batch
  private val events = Seq(
    CusumEvent("a", 10L, 1L, 12.0, 10.0, 2.0),
    CusumEvent("a", 20L, 2L, 15.0, 10.0, 2.0),
    CusumEvent("b", 5L, 1L, 9.5, 10.0, 2.0),
    // ---- batch split ----
    CusumEvent("a", 30L, 3L, 16.0, 10.0, 2.0),
    CusumEvent("a", 40L, 4L, 3.0, 10.0, 2.0),
    CusumEvent("b", 6L, 2L, 10.5, 10.0, 2.0))

  test("streamed CUSUM is bit-identical to the batch fold across batches") {
    val expected = Cusum.cusum(
        events.toDF("key", "t", "tie", "v", "mu", "sigma"),
        k = 0.5, h = 1.0)
      .orderBy($"key", $"t", $"tie")
      .as[(String, Long, Long, Double, Double, Double, Boolean)]
      .collect().toSeq
    val in = MemoryStream[CusumEvent]
    val q = StreamCusum.detect(in.toDS(), k = 0.5, h = 1.0)
      .writeStream.format("memory").queryName("scusum_out")
      .outputMode("append").start()
    try {
      in.addData(events.take(3)); q.processAllAvailable()
      in.addData(events.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("scusum_out")
      .orderBy($"key", $"t", $"tie")
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Boolean])].collect().toSeq
    assert(streamed.forall(_._5.isDefined))
    assert(streamed.map(r =>
      (r._1, r._2, r._3, r._4, r._5.get, r._6.get, r._7.get)) == expected)
    // the drift run actually alarms at h = 1.0, the calm key never does
    val byKey = streamed.groupBy(_._1)
    assert(byKey("a").exists(_._7.get))
    assert(byKey("b").forall(!_._7.get))
  }

  test("a late row emits None and leaves the fold frontier untouched") {
    val in = MemoryStream[CusumEvent]
    val q = StreamCusum.detect(in.toDS(), k = 0.5, h = 1.0)
      .writeStream.format("memory").queryName("scusum_late")
      .outputMode("append").start()
    try {
      in.addData(events.take(2)); q.processAllAvailable()
      // t = 15 is before the frontier (t = 20): must not fold
      in.addData(CusumEvent("a", 15L, 9L, 100.0, 10.0, 2.0))
      q.processAllAvailable()
      in.addData(events(3)); q.processAllAvailable() // t = 30 continues
    } finally q.stop()
    val rows = spark.table("scusum_late")
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Boolean])].collect()
    assert(rows.find(_._2 == 15L).get._5.isEmpty)
    // t = 30 folded from the t = 20 frontier, not from the late row
    val expected = Cusum.cusum(
        (events.take(2) :+ events(3))
          .toDF("key", "t", "tie", "v", "mu", "sigma"), k = 0.5, h = 1.0)
      .filter($"t" === 30L)
      .as[(String, Long, Long, Double, Double, Double, Boolean)]
      .collect().head
    assert(rows.find(_._2 == 30L).get._5.get == expected._5)
  }
}
