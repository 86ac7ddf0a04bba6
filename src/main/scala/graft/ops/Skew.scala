package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Skew mitigation for hot keys.
  *
  * A plain `groupBy(key)` or `join(key)` shuffles every row of a hot key
  * to one reducer: with a Zipf-ish key (a handful of sources owning most
  * of a 100 TB corpus) that one task runs for hours while the rest of the
  * cluster idles. AQE's skew-join splitting handles the *join* read side;
  * these operators handle the aggregation side and the
  * medium-dimension-join side, both as deterministic plan-level rewrites:
  *
  *  - [[saltedStats]]: two-phase aggregation — partial agg on
  *    (key, salt), final agg on key. The first shuffle spreads each hot
  *    key over `buckets` reducers; the second moves only
  *    `buckets × n_keys` pre-aggregated rows. Decimal sums are
  *    associative, so the salted result is bit-identical to the direct
  *    [[Exact.dsum]] (SkewSpec asserts it).
  *  - [[replicateSmallJoin]]: the salted twin of a broadcast join for a
  *    small side too big to broadcast — replicate the small side
  *    `buckets`× (explode), salt the big side by row hash, equi-join on
  *    (keys, salt). Each hot key's rows land on `buckets` different
  *    reducers instead of one.
  *
  * The salt is the cross-engine row hash [[TextOps.h64]] of a caller-
  * chosen column, not `rand()`: reruns, retries and different partition
  * counts produce the identical placement, keeping results reproducible
  * (speculative-execution-safe) at any scale.
  */
object Skew {
  private val Dec = DecimalType(18, 6)

  /** Per-key row count and decimal-exact sum of `value`, aggregated in
    * two salted phases. Equal to
    * `df.groupBy(key).agg(count, Exact.dsum(value))` for any `buckets`.
    * `saltOn` should be high-cardinality (a row id). */
  def saltedStats(df: DataFrame, key: Column, value: Column, saltOn: Column,
      buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(TextOps.h64(saltOn), lit(buckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(value.cast(Dec)).as("__s"))
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n_rows"),
        sum(col("__s")).cast(DoubleType).as("sum_value"))

  /** Inner equi-join on `keys` with the small side replicated
    * `buckets`× and the big side salted by `saltOn`'s row hash — for a
    * skewed big side joining a dimension that is small but above the
    * broadcast threshold. Output columns = plain `big.join(small, keys)`. */
  def replicateSmallJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltOn: Column, buckets: Int): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(TextOps.h64(saltOn), lit(buckets)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}
