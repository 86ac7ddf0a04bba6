package graft

import graft.ops.Sampling
import graft.streaming.StreamEmbargo
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class EmbargoEv(id: Long, ts: java.sql.Timestamp)

/** Streaming embargo gate: stateless parity with the batch flag at
  * every micro-batch split — including a "late" row from before the
  * cutoff arriving in a later batch (stateless ⇒ classified
  * identically, never re-bucketed by arrival time). */
class StreamEmbargoSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private def t(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  // frozen cutoff: Jan 20, embargo 2 days → train < Jan 18, test ≥ Jan 20
  private def cutoffFrame =
    Seq(Tuple1(t(20))).toDF("cutoff").localCheckpoint(true)

  private val batch1 = Seq(EmbargoEv(1, t(5)), EmbargoEv(2, t(19)), EmbargoEv(3, t(25)))
  private val batch2 = Seq(EmbargoEv(4, t(18)), EmbargoEv(5, t(20)), EmbargoEv(6, t(2))) // 6 is late

  test("streamed flags equal the batch flags across batch splits") {
    val cut = cutoffFrame
    val all = (batch1 ++ batch2).toDS().toDF()
    val expected = all.crossJoin(broadcast(cut))
      .select($"id", Sampling.embargoPart($"ts", $"cutoff", 2).as("part"))
      .as[(Long, String)].collect().toMap

    val in = MemoryStream[EmbargoEv]
    val q = StreamEmbargo.gate(in.toDS().toDF(), cut, gapDays = 2)
      .select($"id", $"part")
      .writeStream.format("memory").queryName("semb_out")
      .outputMode("append").start()
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("semb_out").as[(Long, String)].collect().toMap
    assert(got == expected)
    // the band semantics themselves
    assert(got(1) == "train" && got(6) == "train") // late row still train
    assert(got(2) == "purged" && got(4) == "purged")
    assert(got(3) == "test" && got(5) == "test")
  }
}
