package graft

import graft.streaming.StreamResample
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming resample: batch/stream parity — the same op over the same
  * rows must produce identical buckets whether run as a static frame or
  * as a file-source stream drained with AvailableNow. */
class StreamResampleSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling resample matches the batch result") {
    val rows = Seq(
      ("2024-01-01 05:59:59", "a", 1.0),
      ("2024-01-01 06:00:00", "a", 3.0),  // boundary -> earlier bucket
      ("2024-01-01 06:00:01", "a", 5.0),
      ("2024-01-01 07:30:00", "b", 7.0))
    val static = rows.toDF("t", "k", "v").withColumn("t", $"t".cast("timestamp"))

    val dir = Files.createTempDirectory("graft-stream-in").toString
    static.write.mode("overwrite").parquet(dir)

    val batchOut = StreamResample.resample(static, $"t", Seq($"k"), $"v",
        seconds = 21600, stats = Seq("mean", "count"))
      .select($"k", date_format($"label", "yyyy-MM-dd HH:mm:ss").as("l"),
        $"mean", $"count")
      .orderBy($"k", $"l")
      .as[(String, String, Double, Long)].collect().toSeq

    // closed-right check against hand-computed buckets
    assert(batchOut == Seq(
      ("a", "2024-01-01 03:00:00", 2.0, 2L),   // 05:59:59 + 06:00:00
      ("a", "2024-01-01 09:00:00", 5.0, 1L),
      ("b", "2024-01-01 09:00:00", 7.0, 1L)))

    val stream = spark.readStream.schema(static.schema).parquet(dir)
    val q = StreamResample.resample(stream, $"t", Seq($"k"), $"v",
        seconds = 21600, stats = Seq("mean", "count"))
      .writeStream
      .format("memory").queryName("sr_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamOut = spark.table("sr_out")
      .select($"k", date_format($"label", "yyyy-MM-dd HH:mm:ss").as("l"),
        $"mean", $"count")
      .orderBy($"k", $"l")
      .as[(String, String, Double, Long)].collect().toSeq
    assert(streamOut == batchOut)
  }
}
