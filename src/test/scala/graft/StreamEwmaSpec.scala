package graft

import graft.ops.Ewma
import graft.streaming.{EwmaEvent, StreamEwma}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming EWMA: bit-parity with the batch secondary-sort fold across
  * micro-batches, and the explicit late-row degradation. */
class StreamEwmaSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // key 1: four samples split across two micro-batches (the 25.0 at
  // t=40 must continue the chain from state); key 2: a single sample
  private val events = Seq(
    EwmaEvent(1L, 10L, 1L, 4.0), EwmaEvent(1L, 20L, 2L, 8.0),
    EwmaEvent(2L, 5L, 1L, 1.0), EwmaEvent(1L, 30L, 3L, 0.0),
    // ---- batch split ----
    EwmaEvent(1L, 40L, 4L, 25.0), EwmaEvent(2L, 6L, 2L, 3.0))

  test("streamed EWMA is bit-identical to the batch fold across batches") {
    val expected = Ewma.ema(
        events.toDF("k", "t", "tie", "v"), $"k", $"t", $"tie", $"v",
        alpha = 0.25)
      .orderBy($"key", $"t", $"tie")
      .select($"key", $"t", $"tie", $"v", $"ema")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val in = MemoryStream[EwmaEvent]
    val q = StreamEwma.smooth(in.toDS(), alpha = 0.25)
      .writeStream.format("memory").queryName("sewma_out")
      .outputMode("append").start()
    try {
      in.addData(events.take(4)); q.processAllAvailable()
      in.addData(events.drop(4)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sewma_out")
      .orderBy($"key", $"t", $"tie")
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(streamed.forall(_._5.isDefined))
    val got = streamed.map(r => (r._1, r._2, r._3, r._4, r._5.get))
    assert(got.map(_._5).map(java.lang.Double.doubleToLongBits) ==
      expected.map(_._5).map(java.lang.Double.doubleToLongBits))
    assert(got == expected)
  }

  test("late rows emit null ema and never move the fold frontier") {
    val in = MemoryStream[EwmaEvent]
    val q = StreamEwma.smooth(in.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("sewma_late")
      .outputMode("append").start()
    try {
      in.addData(EwmaEvent(1L, 100L, 1L, 10.0)); q.processAllAvailable()
      // late: before the frontier — must not rewrite the chain
      in.addData(EwmaEvent(1L, 50L, 0L, 99.0)); q.processAllAvailable()
      // on-time: folds from the 10.0 seed, not from the late 99.0
      in.addData(EwmaEvent(1L, 200L, 2L, 20.0)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sewma_late")
      .orderBy($"t").as[(Long, Long, Long, Double, Option[Double])]
      .collect().toSeq
    assert(rows.map(r => (r._2, r._5)) == Seq(
      (50L, None), (100L, Some(10.0)), (200L, Some(15.0))))
  }
}
