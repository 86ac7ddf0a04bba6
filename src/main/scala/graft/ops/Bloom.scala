package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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
  * Keys must be integral (the probe is mightContainLong; a string
  * column would hash differently on insert and probe and silently drop
  * matches — rejected up front instead). When `expectedItems <= 0` the
  * small side is counted first, so the fpp holds at any scale factor
  * instead of silently degrading past a hardcoded capacity.
  *
  * The membership probe is a broadcast-closure UDF (the one place a
  * UDF earns its seat: Spark's might_contain expression is not
  * registered for public use, and the probe is a pure bitset lookup
  * dominated by the scan it avoids).
  */
object Bloom {

  private def requireIntegral(df: DataFrame, c: String): Unit =
    df.schema(c).dataType match {
      case LongType | IntegerType | ShortType | ByteType => ()
      case t => throw new IllegalArgumentException(
        s"Bloom prefilter needs an integral key column; '$c' is $t")
    }

  /** The prefiltered big side alone (no completing join) — for
    * measuring pruning and for pipelines that tolerate the fpp. */
  def prefilter(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    requireIntegral(big, bigKey)
    requireIntegral(small, smallKey)
    // count unconditionally: the small side is small by contract, and
    // stat.bloomFilter NPEs on a fully empty frame (null aggregate)
    val cnt = small.count()
    if (cnt == 0L) return big.filter(lit(false))
    val n = if (expectedItems > 0) expectedItems else cnt
    val bf = small.stat.bloomFilter(smallKey, n, fpp)
    val bcast = big.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k))
    big.filter(might(col(bigKey).cast("long")))
  }

  def semiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame =
    prefilter(big, small, bigKey, smallKey, expectedItems, fpp)
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
}
