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

  test("streaming resample over an NTZ-encoded source matches the TZ result") {
    // the r7 break came from the driver's parquet flipping to naive
    // timestamps; the stateful streaming path (window + watermark +
    // usOf label) must digest either encoding identically
    val rows = Seq(
      ("2024-03-01 11:59:59", "a", 2.0),
      ("2024-03-01 12:00:00", "a", 4.0),
      ("2024-03-01 12:00:01", "b", 6.0),
      ("2024-03-01 13:45:00", "b", 8.0))
    val base = rows.toDF("t", "k", "v")
    val results = Seq("timestamp", "timestamp_ntz").map { enc =>
      val dir = Files.createTempDirectory(s"graft-stream-$enc").toString
      val encoded = base.withColumn("t", $"t".cast(enc))
      encoded.write.mode("overwrite").parquet(dir)
      val in = spark.readStream.schema(encoded.schema).parquet(dir)
      assert(in.schema("t").dataType.typeName ==
        (if (enc == "timestamp") "timestamp" else "timestamp_ntz"))
      val name = s"sr_${enc.replace("_", "")}"
      val q = StreamResample.resample(in, $"t", Seq($"k"), $"v",
          seconds = 3600, stats = Seq("sum", "count"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.table(name)
        .select($"k", date_format($"label", "yyyy-MM-dd HH:mm:ss").as("l"),
          $"sum".cast("double"), $"count")
        .orderBy($"k", $"l")
        .as[(String, String, Double, Long)].collect().toSeq
    }
    assert(results.head.nonEmpty && results.head == results.last)
  }
}
