package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join — the runtime-filter pattern made
  * explicit: build a bloom filter over the small side's join keys
  * (one aggregation, merge is a bitwise OR so the sketch is
  * partitioning-independent), broadcast the few-hundred-KB bitset, and
  * drop non-matching big-side rows BEFORE they reach the shuffle; the
  * exact semi join then runs over the survivors.
  *
  * At 100 TB this is the difference between shuffling the full fact
  * table and shuffling only the ~selectivity fraction that can
  * possibly match — the same plan shape AQE's runtime bloom filter
  * injects when statistics allow, available here deterministically and
  * regardless of thresholds. False positives only cost wasted rows
  * (the exact join removes them); false negatives cannot occur, so the
  * result is identical to the plain semi join — which is exactly what
  * the oracle checks.
  *
  * The membership probe is a broadcast-closure UDF (the one place a
  * UDF earns its seat: Spark's might_contain expression is not
  * registered for public use, and the probe is a pure bitset lookup
  * dominated by the scan it avoids).
  */
object Bloom {

  def semiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bcast = big.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k))
    big.filter(might(col(bigKey)))
      .join(small.select(col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }

  /** The prefiltered frame alone (no completing join) — for measuring
    * pruning and for pipelines that tolerate the fpp. */
  def prefilter(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bcast = big.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k))
    big.filter(might(col(bigKey)))
  }
}
