package graft.streaming

import graft.ops.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming time-resample: the batch tumbling-window downsample
  * (graft.ops.TimeResample) expressed over `window()` so the identical
  * aggregation runs under Structured Streaming with watermark-bounded
  * state.
  *
  * The reference is strictly batch (SURVEY.md §2.8); this is the
  * forward-looking extension: the same closed-right bucket ownership
  * (a value exactly on a boundary belongs to the earlier bucket —
  * implemented by shifting the event time back one microsecond before
  * windowing) and the same mid-interval label, but incremental.
  *
  * Scale: state per (keys × open windows) only; the watermark bounds
  * open windows, so state size is key-cardinality × (watermark / bucket)
  * — independent of stream length. Output mode `append` emits each
  * bucket exactly once when the watermark passes its end.
  */
object StreamResample {

  /** Works on both streaming and static frames (window() is the same
    * logical op; Catalyst picks the stateful or hash aggregation). */
  def resample(df: DataFrame, tsCol: Column, keys: Seq[Column], value: Column,
      seconds: Long, watermark: String = "1 hour",
      stats: Seq[String] = Seq("mean")): DataFrame = {
    val aggs = stats.map {
      case "mean"  => Exact.davg(value).as("mean")
      case "sum"   => Exact.dsum(value).as("sum")
      case "min"   => min(value).as("min")
      case "max"   => max(value).as("max")
      case "count" => count(value).as("count")
      case other   => throw new IllegalArgumentException(s"unsupported stat: $other")
    }
    // Event-time watermarks accept only TIMESTAMP
    // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE for NTZ), so normalize the
    // event column at entry — value-identity under the pinned-UTC
    // session, no-op for already-TZ input. StreamResampleSpec runs the
    // same stream from both encodings and asserts identical buckets.
    val tsName = tsCol.toString
    val tdf = df.withColumn(tsName,
      tsCol.cast(org.apache.spark.sql.types.TimestampType))
    val src = if (tdf.isStreaming) tdf.withWatermark(tsName, watermark) else tdf
    val shifted = col(tsName) - expr("INTERVAL 1 MICROSECOND")
    src
      .groupBy(window(shifted, s"$seconds seconds") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("label",
        timestamp_micros(graft.ops.TimeEnc.usOf(col("window.start")) + lit(seconds * 500000L)))
      .drop("window")
  }
}
