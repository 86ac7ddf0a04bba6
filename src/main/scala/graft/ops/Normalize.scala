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
  * (sources, tables): broadcast-small by contract. */
object Normalize {

  /** df + (mean, z) for `x` within each group of `keys` (column
    * names, so the broadcast join-back is unambiguous). */
  def zscore(df: DataFrame, keys: Seq[String], x: Column): DataFrame = {
    val stats = df.groupBy(keys.map(col): _*)
      .agg(Exact.dsum(x.cast("double")).as("__sx"),
        Exact.dsum(x.cast("double") * x.cast("double")).as("__sxx"),
        count(x).cast("double").as("__n"))
    val mean = col("__sx") / col("__n")
    val variance =
      (col("__sxx") - col("__sx") * col("__sx") / col("__n")) / col("__n")
    df.join(broadcast(stats), keys)
      .withColumn("mean", mean)
      .withColumn("z",
        when(variance > 0, (x.cast("double") - mean) / sqrt(variance)))
      .drop("__sx", "__sxx", "__n")
  }
}
