package graft

import graft.ops.Drift
import graft.streaming.StreamDriftScreen
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming drift screen: the streamed frozen-edge histogram screened
  * with the SHARED q192 fold equals the batch screen over the same
  * rows at every micro-batch boundary, state stays O(keys × bins), and
  * a genuinely shifted source surfaces with the top KS statistic. */
class StreamDriftScreenSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // reference corpus: values 1..40 across sources — quartile edges
  private val ref = (1L to 40L).map(i => ("g", s"s${(i % 4) + 1}", i))
    .toDF("g", "source", "x")
  private def edges = Drift.referenceEdges(ref, Seq("g"), col("x"),
    col("source"), Seq(0.25, 0.5, 0.75))

  // batch 1: all four sources draw from the reference range;
  // batch 2: s4 shifts entirely above the top edge (drift), the rest
  // keep drawing in-range
  private val batch1 = Seq(
    ("g", "s1", 3L), ("g", "s1", 12L), ("g", "s1", 22L), ("g", "s1", 33L),
    ("g", "s2", 5L), ("g", "s2", 15L), ("g", "s2", 25L), ("g", "s2", 35L),
    ("g", "s3", 7L), ("g", "s3", 17L), ("g", "s3", 27L), ("g", "s3", 37L),
    ("g", "s4", 9L), ("g", "s4", 19L), ("g", "s4", 29L), ("g", "s4", 39L))
  private val batch2 = Seq(
    ("g", "s1", 4L), ("g", "s1", 24L),
    ("g", "s2", 6L), ("g", "s2", 26L),
    ("g", "s3", 8L), ("g", "s3", 28L),
    ("g", "s4", 999L), ("g", "s4", 888L), ("g", "s4", 777L),
    ("g", "s4", 666L), ("g", "s4", 555L), ("g", "s4", 444L))

  private def batchScreen(rows: Seq[(String, String, Long)]) =
    StreamDriftScreen.screen(
      StreamDriftScreen.binnedCounts(rows.toDF("g", "source", "x"), edges,
        Seq("g"), Seq("source"), col("x")),
      "source").orderBy($"source").collect().map(_.toString).toSeq

  test("streamed histogram + shared fold equals the batch screen at every batch boundary") {
    val in = MemoryStream[(String, String, Long)]
    val q = StreamDriftScreen.binnedCounts(
        in.toDF().toDF("g", "source", "x"), edges,
        Seq("g"), Seq("source"), col("x"))
      .writeStream.format("memory").queryName("sdrift_hist")
      .outputMode("complete").start()
    try {
      in.addData(batch1); q.processAllAvailable()
      val s1 = StreamDriftScreen.screen(
          spark.table("sdrift_hist").select($"source", $"bin", $"c"), "source")
        .orderBy($"source").collect().map(_.toString).toSeq
      assert(s1 == batchScreen(batch1))

      in.addData(batch2); q.processAllAvailable()
      val s2 = StreamDriftScreen.screen(
          spark.table("sdrift_hist").select($"source", $"bin", $"c"), "source")
        .orderBy($"source").collect().map(_.toString).toSeq
      assert(s2 == batchScreen(batch1 ++ batch2))

      // O(keys x bins) state: the histogram holds at most 4 sources x
      // 4 bins rows no matter how many raw rows streamed through
      assert(spark.table("sdrift_hist").count() <= 16)

      // the shifted source carries the top KS statistic after batch 2
      val top = StreamDriftScreen.screen(
          spark.table("sdrift_hist").select($"source", $"bin", $"c"), "source")
        .orderBy($"d_stat".desc).select($"source").first().getString(0)
      assert(top == "s4")
    } finally q.stop()
  }

  test("the fold is the q192 fold: exact-value bins reproduce the batch screen shape") {
    // bin = raw value (the q192 exact-ECDF form) through the same fold:
    // ranks are a contiguous 1..m, exactly one rejection regime
    val hist = (batch1 ++ batch2).toDF("g", "source", "x")
      .groupBy($"source", $"x".as("bin")).agg(count(lit(1)).as("c"))
    val out = Drift.ksScreenFold(hist, "source", alpha = 0.05)
      .orderBy($"p_rank").collect()
    assert(out.map(_.getLong(3)).toSeq == (1L to out.length).toSeq)
    // rejected set is a prefix of the p-value ranking (BH step-up shape)
    val flags = out.map(_.getBoolean(4)).toSeq
    assert(flags == flags.sortBy(!_))
  }
}
