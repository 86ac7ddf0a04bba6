package graft

import graft.ops.CorpusPipelineV2
import graft.streaming.StreamTierGate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming tier gate: the per-row stream decision must admit
  * exactly the documents the batch tierGate keeps, with the same
  * tier attribution, and must not depend on delivery grouping. */
class StreamTierGateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha", "s1"), (2L, "beta", "s1"), (3L, "gamma", "s1"),
    (4L, "delta", "s2"), (5L, "epsilon", "s2"),
    (6L, "zeta", "s3"), (7L, "eta", "s4"))
    .toDF("doc_id", "text", "source")
    .withColumn("n_chars", length($"text").cast("long"))

  private def tiers = Seq(("s1", "lo"), ("s2", "hi"),
    ("s3", null.asInstanceOf[String])).toDF("source", "tier")

  test("stream admissions equal the batch tierGate, tiers attributed") {
    val batchKept = CorpusPipelineV2.tierGate(docs, tiers)._1
      .select($"doc_id").as[Long].collect().toSet

    val dir = Files.createTempDirectory("graft-tg").toString
    docs.write.mode("overwrite").parquet(dir)
    val in = spark.readStream.schema(docs.schema).parquet(dir)
    val q = StreamTierGate.gate(in, tiers)
      .writeStream.format("memory").queryName("tg_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("tg_out")

    val streamKept = out.filter($"keep")
      .select($"doc_id").as[Long].collect().toSet
    assert(streamKept == batchKept,
      s"\nstream: $streamKept\nbatch:  $batchKept")
    // every arriving doc got a decision row (the gate never drops
    // silently), and tier attribution matches the frozen table
    assert(out.count() == docs.count())
    val byTier = out.select($"source", $"tier").distinct()
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byTier == Map("s1" -> Some("lo"), "s2" -> Some("hi"),
      "s3" -> None, "s4" -> None))
    // hi and no-evidence sources pass whole
    assert(out.filter($"source".isin("s2", "s3", "s4") && !$"keep")
      .count() == 0)
  }

  test("re-delivery gets the identical verdict (order-free decision)") {
    val dir = Files.createTempDirectory("graft-tg2").toString
    // two files, overlapping docs — a redelivered doc must decide
    // identically both times
    docs.limit(5).write.mode("overwrite").parquet(dir)
    docs.write.mode("append").parquet(dir)
    val in = spark.readStream.schema(docs.schema).parquet(dir)
    val q = StreamTierGate.gate(in, tiers)
      .writeStream.format("memory").queryName("tg_out2")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val verdicts = spark.table("tg_out2")
      .select($"doc_id", $"keep").distinct()
      .groupBy($"doc_id").agg(countDistinct($"keep").as("n"))
      .filter($"n" > 1).count()
    assert(verdicts == 0L)
  }
}
