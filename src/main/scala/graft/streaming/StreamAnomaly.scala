package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming anomaly against a static climatology — the stream-static
  * join pattern composed with the watermarked tumbling resample: bucket
  * the live feed per key ([[StreamResample]], decimal-exact mean), then
  * broadcast-join the (small, static) climatology and emit the
  * departure from it.
  *
  * This is the incremental twin of the batch anomaly map (q82): the
  * same two operators, with the all-years climatology precomputed
  * batch-side and the per-bucket mean arriving from the stream. Scale
  * shape: streaming state is keys × open windows (watermark-bounded,
  * from StreamResample); the climatology never enters state — it rides
  * each micro-batch as a broadcast, so updating it is a redeploy of a
  * small table, not a stateful migration.
  */
object StreamAnomaly {

  /** `clim` carries (key, cmean). Works on streaming and static frames
    * alike — batch/stream parity is StreamAnomalySpec's contract.
    * LEFT join: a key the climatology doesn't know yet (a new sensor
    * before the next redeploy) still surfaces, with null cmean/anomaly
    * — an anomaly detector must not silently swallow unknown keys. */
  def anomalies(df: DataFrame, tsCol: Column, key: Column, value: Column,
      clim: DataFrame, seconds: Long,
      watermark: String = "1 hour"): DataFrame =
    StreamResample.resample(df, tsCol, Seq(key.as("key")), value,
        seconds, watermark, stats = Seq("mean", "count"))
      .join(broadcast(clim), Seq("key"), "left")
      .withColumn("anomaly", col("mean") - col("cmean"))
}
