package graft

import graft.streaming.StreamAnomaly
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Stream-static join parity: the windowed anomaly against a static
  * climatology must be identical whether the events arrive as a static
  * frame or as a drained file stream. */
class StreamAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("streaming anomaly vs static climatology matches the batch result") {
    val rows = Seq(
      ("2024-01-01 05:00:00", "a", 1.0),
      ("2024-01-01 05:10:00", "a", 3.0),
      ("2024-01-01 07:00:00", "a", 9.0),
      ("2024-01-01 05:30:00", "b", 4.0),
      ("2024-01-01 05:40:00", "c", 2.0)) // key unknown to the climatology
    val static = rows.toDF("t", "k", "v").withColumn("t", $"t".cast("timestamp"))
    val clim = Seq(("a", 1.5), ("b", 5.0)).toDF("key", "cmean")

    val dir = Files.createTempDirectory("graft-anom-in").toString
    static.write.mode("overwrite").parquet(dir)

    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select($"key", date_format($"label", "yyyy-MM-dd HH:mm:ss").as("l"),
        $"mean", $"cmean", $"anomaly", $"count")
      .orderBy($"key", $"l")
      .as[(String, String, Double, Option[Double], Option[Double], Long)]
      .collect().toSeq

    val batchOut = shape(StreamAnomaly.anomalies(
      static, $"t", $"k", $"v", clim, seconds = 3600))
    // closed-right ownership: 05:00:00 and 07:00:00 sit on boundaries and
    // belong to the EARLIER hourly bucket (mid labels 04:30 / 06:30);
    // the unknown key surfaces with null cmean/anomaly (left join)
    assert(batchOut == Seq(
      ("a", "2024-01-01 04:30:00", 1.0, Some(1.5), Some(-0.5), 1L),
      ("a", "2024-01-01 05:30:00", 3.0, Some(1.5), Some(1.5), 1L),
      ("a", "2024-01-01 06:30:00", 9.0, Some(1.5), Some(7.5), 1L),
      ("b", "2024-01-01 05:30:00", 4.0, Some(5.0), Some(-1.0), 1L),
      ("c", "2024-01-01 05:30:00", 2.0, None, None, 1L)))

    val stream = spark.readStream.schema(static.schema).parquet(dir)
    val q = StreamAnomaly.anomalies(stream, $"t", $"k", $"v", clim, seconds = 3600)
      .writeStream
      .format("memory").queryName("anom_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    assert(shape(spark.table("anom_out")) == batchOut)
  }
}
