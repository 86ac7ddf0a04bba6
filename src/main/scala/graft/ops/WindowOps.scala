package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Ordered / window operators (SURVEY.md §2.5).
  *
  * Reference semantics sources (cited file:line into /root/reference):
  *  - running sum over an ordered axis: app_functions.py:191-201 (MSF
  *    cumulative sum over depth) and mop_utils.py:791-812 (time integral)
  *  - cumulative-minus-column-total: app_functions.py:199-201
  *  - last valid level per column ("ocean_floor"): calculations.py:683-698
  *  - midpoint bounds with end extrapolation: mop_utils.py:679-755
  *
  * All are expressed as Spark window functions so they stay inside
  * whole-stage codegen and shuffle only on the partition keys — at 100 TB
  * each group (a water column, a time series) is small; the partition count
  * scales with the key cardinality, not with array size.
  */
object WindowOps {
  private val Dec = DecimalType(18, Exact.Scale)

  /** Exact running sum of `value` ordered by `order` within `partition`.
    * Decimal accumulation keeps it reproducible across engines. */
  def runningSum(value: Column, partition: Seq[Column], order: Seq[Column]): Column = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sum(value.cast(Dec)).over(w).cast(DoubleType)
  }

  /** Running sum minus the full-partition total — the meridional
    * overturning shape (cumsum over depth minus column total,
    * app_functions.py:191-201). */
  def runningSumMinusTotal(value: Column, partition: Seq[Column], order: Seq[Column]): Column = {
    val wRun = Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(partition: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    (sum(value.cast(Dec)).over(wRun) - sum(value.cast(Dec)).over(wAll))
      .cast(DoubleType)
  }

  /** Last non-null `value` along `order` per group — "ocean_floor"
    * (deepest valid cell, calculations.py:683-698). Returns one row per
    * group with the picked value and its order position. */
  def lastNonNull(df: DataFrame, group: Seq[Column], order: Column, value: Column): DataFrame =
    df.filter(value.isNotNull)
      .groupBy(group: _*)
      .agg(
        max_by(value, order).as("last_value"),
        max(order).as("last_pos"),
        count(value).as("n_valid"))

  /** Exact per-group median, deterministic by construction: rank the
    * values with a total order, keep the middle one (odd n) or two
    * (even n), decimal-exact average. Engine-specific percentile
    * implementations differ in interpolation edge cases; this one is a
    * plain window + filtered aggregate and reproduces everywhere.
    * `tieBreak` must make the order total. Output: keys + `median`. */
  def exactMedian(df: DataFrame, keys: Seq[Column], value: Column,
      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(value.asc, tieBreak.asc)
    val wAll = Window.partitionBy(keys: _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      // integer div: Spark `/` on longs is double division
      .filter(expr("__rn = (__n + 1) div 2 OR __rn = (__n + 2) div 2"))
      .groupBy(keys: _*)
      .agg((Exact.dsum(value) / count(lit(1))).as("median"))
  }

  /** Exact per-group quantile ladder by the nearest-rank (lower) rule:
    * the q-quantile is the element at rank ceil(q·n) under a total
    * order — an actual data element, never an interpolation, so every
    * engine returns the identical value (percentile built-ins differ in
    * interpolation rules). One ranking window reused for all requested
    * quantiles (the q list explodes against the ranked rows map-side).
    * Output: keys + (q, qvalue), one row per group per quantile. */
  def exactQuantiles(df: DataFrame, keys: Seq[Column], value: Column,
      tieBreak: Column, qs: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(value.asc, tieBreak.asc)
    val wAll = Window.partitionBy(keys: _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .filter(col("__rn") === greatest(lit(1L), ceil(col("q") * col("__n"))))
      .select(keys ++ Seq(col("q"), value.as("qvalue")): _*)
  }

  /** Midpoint cell bounds over an ordered 1-D coordinate with extrapolated
    * ends (mop_utils.py:714-724: bounds are neighbor midpoints; first/last
    * extend by half the adjacent spacing), optionally clamped (the
    * reference clamps latitude to ±90 and heights to >= 0,
    * mop_utils.py:729-741).
    *
    * PRECONDITION: this variant windows over the WHOLE frame (one
    * unpartitioned sort), which is only safe because its input is a
    * single coordinate axis — O(10²–10³) rows. Never hand it a
    * data-sized frame: Spark would serialize it into one task. For a
    * catalog-wide bounds pass (every axis of every file at once) use
    * [[midpointBoundsBy]], which keys the window on the axis id.
    *
    * Input: df with a numeric coordinate column `coordCol` (rows assumed
    * distinct on it). Output: coord, bnd_lo, bnd_hi.
    */
  def midpointBounds(df: DataFrame, coordCol: String, clampLo: Option[Double] = None,
      clampHi: Option[Double] = None): DataFrame =
    boundsSelect(df, Nil, coordCol, clampLo, clampHi)

  /** [[midpointBounds]] partitioned by an axis key — the catalog-scale
    * variant: one pass computes bounds for EVERY axis of every file,
    * with the window keyed on `partition` so parallelism scales with
    * the axis count, not capped at one task. Output: partition columns,
    * coord, bnd_lo, bnd_hi. Clamps apply to every partition; axes with
    * different clamp rules (latitude vs height) go in separate calls —
    * or clamp downstream on the axis class. */
  def midpointBoundsBy(df: DataFrame, partition: Seq[Column], coordCol: String,
      clampLo: Option[Double] = None, clampHi: Option[Double] = None): DataFrame = {
    require(partition.nonEmpty,
      "midpointBoundsBy needs partition keys; use midpointBounds for one axis")
    boundsSelect(df, partition, coordCol, clampLo, clampHi)
  }

  private def boundsSelect(df: DataFrame, partition: Seq[Column], coordCol: String,
      clampLo: Option[Double], clampHi: Option[Double]): DataFrame = {
    val w = (if (partition.isEmpty) Window.partitionBy()
             else Window.partitionBy(partition: _*)).orderBy(col(coordCol))
    val x = col(coordCol)
    val prev = lag(x, 1).over(w)
    val next = lead(x, 1).over(w)
    val lo0 = when(prev.isNull, x - (next - x) / 2.0).otherwise((prev + x) / 2.0)
    val hi0 = when(next.isNull, x + (x - prev) / 2.0).otherwise((x + next) / 2.0)
    val lo = clampLo.map(v => greatest(lo0, lit(v))).getOrElse(lo0)
    val hi1 = clampLo.map(v => greatest(hi0, lit(v))).getOrElse(hi0)
    val hi = clampHi.map(v => least(hi1, lit(v))).getOrElse(hi1)
    val lo1 = clampHi.map(v => least(lo, lit(v))).getOrElse(lo)
    df.select(partition ++ Seq(x, lo1.as("bnd_lo"), hi.as("bnd_hi")): _*)
  }
}
