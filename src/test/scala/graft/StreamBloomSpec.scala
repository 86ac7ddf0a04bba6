package graft

import graft.ops.{Sketch, TextOps}
import graft.streaming.StreamBloom
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming Bloom gate: stateless probe parity with the batch gate at
  * every micro-batch split, and the no-false-negative contract — every
  * span actually present in the frozen reference flags true. */
class StreamBloomSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val m = 16384L

  private def hashed(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("h1", TextOps.h64($"s"))
      .withColumn("h2", TextOps.h64b($"s") % 1000000007L)

  // frozen reference: spans r0..r9
  private val refSpans = (0 until 10).map(i => s"ref span number $i")
  private def bloom = Sketch.bloomWords(
    hashed(refSpans.toDF("s")).select($"h1", $"h2"), m)
    .localCheckpoint(true)

  // stream: half in-reference, half novel, split across two batches
  private val batch1 = Seq("ref span number 0", "ref span number 3",
    "novel alpha", "novel beta")
  private val batch2 = Seq("ref span number 7", "novel gamma")

  test("streamed gate equals the batch probe at each boundary; no false negatives") {
    val b = bloom
    val in = MemoryStream[String]
    val q = StreamBloom.gate(hashed(in.toDF().toDF("s")), b, m)
      .select($"s", $"bloom_hit")
      .writeStream.format("memory").queryName("sbloom_out")
      .outputMode("append").start()
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sbloom_out")
      .as[(String, Boolean)].collect().sortBy(_._1).toSeq
    val batch = Sketch.bloomProbe(hashed((batch1 ++ batch2).toDF("s")), b, m)
      .select($"s", $"bloom_hit")
      .as[(String, Boolean)].collect().sortBy(_._1).toSeq
    assert(streamed == batch)
    // Bloom contract: every genuinely-in-reference span flags true
    val hits = streamed.toMap
    assert(Seq("ref span number 0", "ref span number 3",
      "ref span number 7").forall(hits(_)))
    // with 30 set bits in 16384, the novel spans' 3-probe FP chance is
    // ~1e-8 — deterministic hashes make this a fixed outcome, not luck
    assert(Seq("novel alpha", "novel beta", "novel gamma")
      .forall(sp => !hits(sp)))
  }
}
