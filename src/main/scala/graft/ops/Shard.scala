package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Balanced output sharding for training-data builds.
  *
  * A filtered corpus is written as N shards that the trainer streams
  * round-robin; if shard token totals are uneven, data-parallel ranks
  * finish epochs at different times and the slowest shard paces the
  * job. The classic fix is LPT bin-packing (place items largest-first
  * onto the currently-lightest bin) — but LPT's "currently lightest"
  * is a sequential dependence on every prior placement, which no
  * engine can parallelize. The scalable stand-in is the serpentine
  * (boustrophedon) assignment: rank items by size descending and deal
  * them S-at-a-time, reversing direction every pass. Each pass of S
  * consecutive ranks gives every shard exactly one item, and the
  * direction flip pairs a pass's largest remainder with the previous
  * pass's smallest, so shard totals stay within one item-size of each
  * other — LPT-quality balance from a pure per-row map over the rank.
  *
  * The only non-trivial piece at scale is the global rank itself:
  * `row_number() OVER (ORDER BY size DESC)` moves the whole dataset
  * into ONE task (Spark warns exactly that), which is a non-starter at
  * 100 TB. [[histogramRank]] computes the identical rank as a
  * counting sort instead: histogram the coarse bucket key, prefix-sum
  * the (tiny) histogram, then rank locally within each bucket and add
  * the bucket's offset. No sampling, no driver collect, no
  * single-partition pass over data rows — determinism comes from the
  * bucket values themselves, not from a sampled range partitioner.
  */
object Shard {

  /** Exact 1-based global rank under the total order (bucket
    * `bucketAsc`, then `order` within equal buckets) — computed as a
    * counting sort, never as a whole-frame window.
    *
    * Plan shape: one map-side-combined groupBy builds the bucket
    * histogram (rows = distinct buckets); a prefix sum over that
    * histogram yields each bucket's starting offset; the data then
    * shuffles ONCE on the bucket key and ranks within buckets. The
    * prefix-sum window is unpartitioned but runs over the histogram,
    * not the data — metadata-sized, same contract as the coordinate
    * windows in WindowOps. The per-bucket ranking window is bounded by
    * the largest bucket, which the caller controls by bucket
    * granularity (for token-length ranking the bucket is the length
    * itself: ~10³ distinct values, each bucket a uniform slice of the
    * corpus).
    *
    * `order` must totally order rows within a bucket (include a unique
    * tiebreak) or ranks are nondeterministic. */
  def histogramRank(df: DataFrame, bucket: Column, bucketAsc: Boolean,
      order: Seq[Column], rankName: String = "rank"): DataFrame = {
    val tagged = df.withColumn("__b", bucket)
    val hist = tagged.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
    val histOrd = Window
      .orderBy(if (bucketAsc) col("__b").asc else col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.select(col("__b"),
      coalesce(sum(col("__n")).over(histOrd), lit(0L)).as("__off"))
    val inBucket = Window.partitionBy(col("__b")).orderBy(order: _*)
    tagged.join(broadcast(offsets), Seq("__b"))
      .withColumn(rankName, col("__off") + row_number().over(inBucket))
      .drop("__b", "__off")
  }

  /** Serpentine shard for a 1-based rank: pass p = (rank-1) div S deals
    * left-to-right when even, right-to-left when odd. Pure arithmetic
    * on the rank — no state, no shuffle. Exact for ranks < 2^53 (the
    * pass index travels through an IEEE division of an exact multiple
    * of S). */
  def serpentineShard(rank: Column, nShards: Int): Column = {
    val s = lit(nShards.toLong)
    val i = rank.cast("long") - lit(1L)
    val pos = pmod(i, s)
    val pass = ((i - pos) / s).cast("long")
    when(pmod(pass, lit(2L)) === 0, pos).otherwise(s - 1 - pos)
  }

  /** The oracle twin of [[serpentineShard]] (DuckDB syntax, `//` is
    * integer division). */
  def serpentineShardSql(rankExpr: String, nShards: Int): String =
    s"""CASE WHEN (($rankExpr - 1) // $nShards) % 2 = 0
       THEN ($rankExpr - 1) % $nShards
       ELSE $nShards - 1 - (($rankExpr - 1) % $nShards) END"""
}
