package graft

import graft.ops.TextOps
import graft.streaming.StreamNovelty
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming novelty: span-grain stream-static checks, folded per doc,
  * must equal the batch noveltyVsReference over the same frames. */
class StreamNoveltySpec extends SparkSpec {
  import spark.implicits._

  private val reference = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "one two three four five six"))
  private val arrivals = Seq(
    (11L, "alpha beta gamma delta epsilon zeta"), // mostly covered
    (12L, "seven eight nine ten eleven"),          // fully novel
    (13L, "x y"))                                  // too short: no spans

  test("stream-static span checks fold to the batch novelty fractions") {
    val store = StreamNovelty.spans(
      reference.toDF("doc", "text"), w = 3).localCheckpoint()
    val dir = Files.createTempDirectory("graft-nov").toString
    arrivals.toDF("doc", "text").write.mode("overwrite").parquet(dir)
    val in = spark.readStream
      .schema(arrivals.toDF("doc", "text").schema).parquet(dir)
    val q = StreamNovelty.checks(StreamNovelty.spans(in, w = 3), store)
      .writeStream.format("memory").queryName("nov_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val folded = spark.table("nov_out")
      .groupBy($"doc")
      .agg(count(lit(1)).as("n_spans"),
        sum(when($"novel", 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", $"n_novel".cast("double") / $"n_spans")
      .as[(Long, Long, Long, Double)].collect().toSet

    val batch = TextOps.noveltyVsReference(
        StreamNovelty.spans(arrivals.toDF("doc", "text"), w = 3),
        StreamNovelty.spans(reference.toDF("doc", "text"), w = 3))
      .as[(Long, Long, Long, Double)].collect().toSet

    assert(folded == batch, s"\ngot:  $folded\nwant: $batch")
    // doc 11: 4 spans, only the one containing 'zeta' is novel
    assert(folded.exists(r => r._1 == 11L && r._2 == 4L && r._3 == 1L))
    // doc 12: all spans novel; doc 13 emits nothing (no spans)
    assert(folded.exists(r => r._1 == 12L && r._2 == r._3))
    assert(!folded.exists(_._1 == 13L))
  }
}
