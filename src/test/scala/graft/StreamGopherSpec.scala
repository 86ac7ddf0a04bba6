package graft

import graft.ops.TextOps
import graft.streaming.StreamGopher
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming Gopher gate: the stateless per-row scorer must emit
  * exactly the rows the batch explode + groupBy aggregation computes
  * over the same documents — stats AND first-failing-rule decision. */
class StreamGopherSpec extends SparkSpec {
  import spark.implicits._

  // one doc per rule outcome: too short, symbol-heavy, non-alpha,
  // missing stopwords, and a kept doc
  private val docsSeq = Seq(
    (1L, "the of and"),
    (2L, "the of ### #ab c# word... more... sym# and here twelve ok fine yes"),
    (3L, "then off 1234 5678 9012 3456 7890 2345 6789 0123 4567 8901"),
    (4L, "alpha words only here but zero stop hits at all in plain sight"),
    (5L, "the quick brown fox and the lazy dog of the farm all day" +
      " they ran and ran with joy"))

  private type Row6 = (Long, Long, Double, Double, Double, Long, String)

  test("streaming per-row scores equal the batch aggregation") {
    val df = docsSeq.toDF("doc", "text")
    val batch = TextOps.gopherRules(df, $"doc", $"text", minWords = 12)
      .as[Row6].collect().toSet

    val rowLevel = TextOps.gopherRulesRow(df, $"doc", $"text", minWords = 12)
      .as[Row6].collect().toSet
    assert(rowLevel == batch, s"\nrow:  $rowLevel\nbatch: $batch")

    val dir = Files.createTempDirectory("graft-gopher").toString
    df.write.mode("overwrite").parquet(dir)
    val in = spark.readStream.schema(df.schema).parquet(dir)
    val q = StreamGopher.score(in, minWords = 12)
      .writeStream.format("memory").queryName("gopher_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("gopher_out").as[Row6].collect().toSet
    assert(got == batch, s"\ngot:  $got\nwant: $batch")
    // every decision class is exercised
    assert(got.map(_._7) ==
      Set("word_count", "symbol_ratio", "alpha_fraction", "stopwords", "kept"))
  }
}
