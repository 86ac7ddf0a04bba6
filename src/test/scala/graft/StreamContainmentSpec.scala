package graft

import graft.ops.TextOps
import graft.streaming.StreamContainment
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming containment: the stream-static join over the frozen corpus
  * token store must reproduce exactly the new-vs-old half of the batch
  * blockedContainment run over corpus ∪ arrivals. */
class StreamContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "s", "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "s", "alpha beta gamma delta"),
    (3L, "t", "iota kappa lambda mu nu"),
    (4L, "s", "one two three four five six"))
  // doc 11 ⊂ doc 1 (subset), doc 12 partially overlaps 4, doc 13 other block
  private val arrivals = Seq(
    (11L, "s", "beta gamma delta"),
    (12L, "s", "one two three nine ten"),
    (13L, "t", "iota kappa lambda"))

  private def batchHalf: Set[(Long, Long, Long, Double, Long)] = {
    val all = (corpus ++ arrivals).toDF("doc", "block", "text")
    val tr = all.select($"doc", $"block",
      explode(array_distinct(split(trim($"text"), "\\s+"))).as("token"))
    val newIds = arrivals.map(_._1).toSet
    TextOps.blockedContainment(tr)
      .filter($"containment" >= 0.6)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
      // keep only new-vs-old pairs, oriented (new, old) like the stream
      .filter(t => newIds(t._1) ^ newIds(t._2))
      .map(t => if (newIds(t._1)) t else (t._2, t._1, t._3, t._4, t._5))
  }

  test("stream-static containment equals the batch operator's new-vs-old half") {
    val store = StreamContainment.prep(
      corpus.toDF("doc", "block", "text")).localCheckpoint()
    val dir = Files.createTempDirectory("graft-cont").toString
    arrivals.toDF("doc", "block", "text").write.mode("overwrite").parquet(dir)
    val in = spark.readStream
      .schema(arrivals.toDF("doc", "block", "text").schema).parquet(dir)
    val q = StreamContainment.matches(StreamContainment.prep(in), store, 0.6)
      .writeStream.format("memory").queryName("cont_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("cont_out")
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    val want = batchHalf
    assert(got.nonEmpty && got == want, s"\ngot:  $got\nwant: $want")
    // the engineered subset case is present and fully contained
    assert(got.exists { case (d1, d2, _, c, sub) =>
      d1 == 11L && d2 == 1L && c == 1.0 && sub == 11L })
  }
}
