package graft

import graft.streaming.StreamHeavyHitters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming Space-Saving heavy hitters: exact-below-capacity parity
  * with the batch count, bounded state, and count conservation under
  * eviction. */
class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def lastSnapshot(table: String): Map[(Int, String), Long] = {
    // Update mode re-emits a bucket's whole counter set each batch;
    // the latest emission per (bucket, word) is the current counter
    val rows = spark.table(table)
      .groupBy($"bucket", $"word").agg(max($"n").as("n"))
      .collect()
    rows.map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("counts are exact (== batch groupBy) while buckets fit capacity") {
    val batch1 = Seq.fill(5)("spark") ++ Seq.fill(3)("scan") ++ Seq("agg")
    val batch2 = Seq.fill(4)("spark") ++ Seq("agg", "agg", "join")
    val in = MemoryStream[String]
    val q = StreamHeavyHitters.heavyHitters(
        StreamHeavyHitters.pairs(in.toDS().toDF("w"), col("w"), buckets = 2),
        capacity = 16)
      .toDF("bucket", "word", "n")
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = lastSnapshot("hh_out").map { case ((_, w), n) => w -> n }
    val want = (batch1 ++ batch2).groupBy(identity).map { case (w, ws) =>
      w -> ws.size.toLong }
    assert(got == want)
  }

  test("state stays capacity-bounded and counter sum is conserved under eviction") {
    // one bucket (buckets = 1), capacity 2, 5 distinct words
    val words = Seq("a", "a", "a", "b", "c", "d", "e")
    val in = MemoryStream[String]
    val q = StreamHeavyHitters.heavyHitters(
        StreamHeavyHitters.pairs(in.toDS().toDF("w"), col("w"), buckets = 1),
        capacity = 2)
      .toDF("bucket", "word", "n")
      .writeStream.format("memory").queryName("hh_cap")
      .outputMode("update").start()
    try { in.addData(words: _*); q.processAllAvailable() } finally q.stop()

    val snap = spark.table("hh_cap").collect()
      .map(r => r.getString(1) -> r.getLong(2))
    assert(snap.length <= 2)                    // capacity bound
    assert(snap.map(_._2).sum == words.length)  // Space-Saving conservation
    // the Space-Saving guarantee: every count is an overestimate, so
    // the max counter bounds the true max frequency (3 for "a") from
    // above — the true heavy hitter can never be under-reported
    assert(snap.map(_._2).max >= 3L)
  }
}
