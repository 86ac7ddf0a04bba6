package graft

import graft.ops.Drift
import graft.streaming.StreamDrift
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming drift bins: frozen-edge assignment over a stream, folded,
  * must equal the batch histogram regardless of how arrivals were
  * split into deliveries. */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  private val reference = Seq.tabulate(16)(i => ("g", (i + 1).toDouble, i.toLong))
  private val arrivals = Seq(
    ("g", 0.5, 100L), ("g", 3.0, 101L), ("g", 7.5, 102L),
    ("g", 11.0, 103L), ("g", 15.5, 104L), ("g", 99.0, 105L))

  test("stream fold equals the batch histogram across split deliveries") {
    val edges = Drift.referenceEdges(
        reference.toDF("k", "x", "id"), Seq("k"), $"x", $"id",
        Seq(0.25, 0.5, 0.75))
      .localCheckpoint()
    val dir = Files.createTempDirectory("graft-drift").toString
    // two separate deliveries of the same logical batch
    val (d1, d2) = arrivals.splitAt(3)
    d1.toDF("k", "x", "id").write.parquet(s"$dir/in")
    d2.toDF("k", "x", "id").write.mode("append").parquet(s"$dir/in")
    val in = spark.readStream
      .schema(arrivals.toDF("k", "x", "id").schema).parquet(s"$dir/in")
    val q = StreamDrift.assignBins(in, edges, Seq("k"), $"x")
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val folded = spark.table("drift_out")
      .groupBy($"k", $"bin").agg(count(lit(1)).as("n"))
      .as[(String, Int, Long)].collect().toSet
    val batch = Drift.assignBins(
        arrivals.toDF("k", "x", "id"), edges, Seq("k"), $"x")
      .groupBy($"k", $"bin").agg(count(lit(1)).as("n"))
      .as[(String, Int, Long)].collect().toSet
    assert(folded == batch, s"\ngot:  $folded\nwant: $batch")
    // edges 4/8/12 over ref 1..16: arrivals land 2 in bin 1 (0.5, 3.0),
    // then one each in bins 2 and 3, and two past the top edge
    assert(folded == Set(("g", 1, 2L), ("g", 2, 1L), ("g", 3, 1L), ("g", 4, 2L)))
  }
}
