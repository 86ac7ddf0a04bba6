package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group feature normalization — the standardization pass of a
  * training-data pipeline (z-score a quality signal within its source
  * so thresholds are comparable across crawls).
  *
  * One stats shuffle (groupBy keys → decimal-exact Σx, Σx², n), then
  * the small stats table broadcasts back and the z itself is map-side.
  * μ and σ come out of the exact decimal sums through a PINNED double
  * chain — μ = Σx/n, σ² = (Σx² − Σx·Σx/n)/n, z = (x − μ)/√σ² with the
  * same association in the DuckDB twin — so both engines produce
  * bit-identical doubles. A constant group (σ² ≤ 0) yields NULL rather
  * than the engine-dependent x/0. Group count = key cardinality
  * (sources, tables): broadcast-small by contract.
  *
  * The join-back is NULL-SAFE (`<=>`): groupBy treats a NULL key as a
  * group like any other, so rows with a NULL group key keep their
  * stats instead of silently dropping out of an `=` equi-join. */
object Normalize {

  /** Null-safe broadcast join-back of a per-group `small` frame whose
    * keys were renamed to `skeys`; drops the renamed keys after. */
  private def joinBack(df: DataFrame, small: DataFrame,
      keys: Seq[String], skeys: Seq[String]): DataFrame = {
    val cond = keys.zip(skeys)
      .map { case (k, s) => col(k) <=> col(s) }.reduce(_ && _)
    df.join(broadcast(small), cond).drop(skeys: _*)
  }

  /** df + (mean, z) for `x` within each group of `keys` (column
    * names, so the broadcast join-back is unambiguous). */
  def zscore(df: DataFrame, keys: Seq[String], x: Column): DataFrame = {
    val skeys = keys.map(k => s"__zs_$k")
    val stats = df.groupBy(keys.map(col): _*)
      .agg(Exact.dsum(x.cast("double")).as("__sx"),
        Exact.dsum(x.cast("double") * x.cast("double")).as("__sxx"),
        count(x).cast("double").as("__n"))
      .select(keys.zip(skeys).map { case (k, s) => col(k).as(s) } ++
        Seq(col("__sx"), col("__sxx"), col("__n")): _*)
    val mean = col("__sx") / col("__n")
    val variance =
      (col("__sxx") - col("__sx") * col("__sx") / col("__n")) / col("__n")
    joinBack(df, stats, keys, skeys)
      .withColumn("mean", mean)
      .withColumn("z",
        when(variance > 0, (x.cast("double") - mean) / sqrt(variance)))
      .drop("__sx", "__sxx", "__n")
  }

  /** Curriculum binning: each row's group-relative quantile bucket —
    * bin 1 holds rows at or below the first threshold, the last bin
    * everything above the highest. Thresholds are EXACT data elements
    * (the nearest-rank rule of [[WindowOps.exactQuantiles]], q89), so
    * bucket edges are engine-identical — no interpolation, no
    * engine-specific percentile flavor. One ranking window for the
    * thresholds, a broadcast join-back, and the bin itself is a
    * map-side fold over the (tiny, sorted) threshold array:
    * bin = 1 + #(thresholds strictly below x). */
  def quantileBins(df: DataFrame, keys: Seq[String], x: Column,
      tieBreak: Column, qs: Seq[Double]): DataFrame = {
    val skeys = keys.map(k => s"__qb_$k")
    val th = WindowOps.exactQuantiles(df, keys.map(col), x, tieBreak, qs)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(col("qvalue").cast("double")))
        .as("__th"))
      .select(keys.zip(skeys).map { case (k, s) => col(k).as(s) } :+
        col("__th"): _*)
    joinBack(df, th, keys, skeys)
      .withColumn("__x", x.cast("double"))
      .withColumn("bin", expr(
        "1 + aggregate(__th, 0, (a, t) -> a + IF(__x > t, 1, 0))"))
      .drop("__th", "__x")
  }
}
