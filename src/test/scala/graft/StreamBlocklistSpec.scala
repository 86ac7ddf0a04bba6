package graft

import graft.ops.TextOps
import graft.streaming.StreamBlocklist
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming blocklist gate: the stateless per-row scorer must emit
  * exactly the rows the batch groupBy aggregation computes over the
  * same documents. */
class StreamBlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("bad", "worse")
  private val docsSeq = Seq(
    (1L, "good text only here"),
    (2L, "bad apple in a good barrel"),
    (3L, "bad bad worse bad"),
    (4L, "BAD shouting case"))

  test("streaming per-row scores equal the batch aggregation") {
    val batch = TextOps.blocklistStats(
        docsSeq.toDF("doc_id", "text").select($"doc_id".as("doc"),
          explode(TextOps.tokens($"text")).as("token")),
        words)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().toSet

    val dir = Files.createTempDirectory("graft-blk").toString
    docsSeq.toDF("doc", "text").write.mode("overwrite").parquet(dir)
    val in = spark.readStream
      .schema(docsSeq.toDF("doc", "text").schema).parquet(dir)
    val q = StreamBlocklist.score(in, words)
      .writeStream.format("memory").queryName("blk_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("blk_out")
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().toSet

    assert(got == batch, s"\ngot:  $got\nwant: $batch")
    // case-insensitive hit: doc 4's shout is caught; doc 1 survives
    assert(got.exists(r => r._1 == 4L && r._3 == 1L && !r._6))
    assert(got.exists(r => r._1 == 1L && r._3 == 0L && r._6))
  }
}
