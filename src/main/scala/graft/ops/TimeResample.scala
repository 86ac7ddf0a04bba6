package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series downsampling with the reference's semantics
  * (calculations.py time_resample, 68-137):
  *
  *  - tumbling buckets of a fixed duration or a calendar month/year,
  *    epoch/boundary-aligned (`origin='start_day'`);
  *  - `closed` side: with closed-right, a value exactly on a boundary
  *    belongs to the *earlier* bucket (implemented by shifting the
  *    timestamp back one microsecond before truncating);
  *  - output label shifted to the bucket midpoint per the reference's
  *    offset table (calculations.py:111-113: '1D'→12h, '1M'→15D, '1Y'→6M);
  *  - stats mean/min/max/sum chosen by the mapping's `timeshot`
  *    (mop_utils.py:908-910).
  *
  * Buckets are computed with integer microsecond arithmetic (no UDF), so
  * the whole aggregation stays in whole-stage codegen and shuffles once on
  * (keys, bucket) — at 100 TB this is a single partial-aggregated shuffle
  * whose width is the output cardinality, not the input size.
  */
object TimeResample {

  sealed trait Freq
  /** Fixed-width bucket (seconds). */
  final case class Fixed(seconds: Long) extends Freq
  case object Monthly extends Freq
  case object Yearly extends Freq

  sealed trait Closed
  case object ClosedLeft extends Closed
  case object ClosedRight extends Closed

  /** Bucket start for a timestamp. */
  def bucketStart(ts: Column, freq: Freq, closed: Closed): Column = {
    val t = closed match {
      case ClosedRight => ts - expr("INTERVAL 1 MICROSECOND")
      case ClosedLeft  => ts
    }
    freq match {
      case Fixed(s) =>
        val us = TimeEnc.usOf(t)
        timestamp_micros(us - pmod(us, lit(s * 1000000L)))
      case Monthly => date_trunc("month", t)
      case Yearly  => date_trunc("year", t)
    }
  }

  /** Mid-interval label (reference offset table, calculations.py:111-113). */
  def midLabel(start: Column, freq: Freq): Column = freq match {
    case Fixed(s) => timestamp_micros(TimeEnc.usOf(start) + lit(s * 500000L))
    case Monthly  => start + expr("INTERVAL 15 DAYS")
    case Yearly   => start + expr("INTERVAL 6 MONTHS")
  }

  /** Downsample `value` over `tsCol` within `keys`. `stats` ⊆
    * {mean,min,max,sum,count}. Output: keys, `label` (bucket midpoint
    * timestamp), one column per stat. */
  def resample(df: DataFrame, tsCol: Column, keys: Seq[Column], value: Column,
      freq: Freq, closed: Closed = ClosedRight,
      stats: Seq[String] = Seq("mean")): DataFrame = {
    val start = bucketStart(tsCol, freq, closed)
    val aggs = stats.map {
      case "mean"  => Exact.davg(value).as("mean")
      case "sum"   => Exact.dsum(value).as("sum")
      case "min"   => min(value).as("min")
      case "max"   => max(value).as("max")
      case "count" => count(value).as("count")
      case other   => throw new IllegalArgumentException(s"unsupported stat: $other")
    }
    df.withColumn("__bucket", start)
      .groupBy(col("__bucket") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("label", midLabel(col("__bucket"), freq))
      .drop("__bucket")
  }

  /** Upsample to a regular grid with linear interpolation
    * (calculations.py:127-129 resample().interpolate('linear')) — see
    * Interp.interpolateToGrid, which implements the kernel. */
}
