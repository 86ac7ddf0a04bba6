package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range joins — the equi-join formulation of interval
  * predicates Spark would otherwise plan as a nested loop.
  *
  * A raw `p.v BETWEEN i.lo AND i.hi` join has no equi key, so Catalyst
  * falls back to BroadcastNestedLoopJoin (or a cartesian) — O(n·m) at
  * any scale. Binning both sides onto a fixed grid of width `w` turns
  * containment into equality on the bucket id: an interval registers
  * in every bucket it overlaps (a map-side `sequence` generator, no
  * shuffle), a point lands in exactly one, and the bucket equi-join +
  * exact residual filter reproduces the predicate. Cost moves from
  * n·m to Σ|bucket-pairs|, tunable by `w`: small w = more interval
  * replicas, big w = more false pairs for the residual filter — set w
  * near the median interval length. Same recipe as the Databricks
  * range-join hint and Flink's interval join, expressed with stock
  * operators.
  *
  * Keys are Longs (epoch days/seconds, integer grid coordinates) so
  * bucket arithmetic is exact; floor division keeps negative keys
  * correct. Skew note: one interval spanning B buckets fans out B
  * times — cap pathological intervals upstream or raise w.
  */
object RangeJoin {

  private[graft] def bucketOf(c: Column, w: Long): Column = {
    // exact long floor division: `div` truncates toward zero, so shift
    // negative non-multiples down one bucket — no double detour, so the
    // bucket id is exact over the whole Long range (a double division
    // loses low bits beyond 2^53)
    val q = c.cast("long")
    val t = call_function("div", q, lit(w))
    when(q % w < 0, t - 1).otherwise(t)
  }

  /** Point-in-interval join: `points` (pid, v, payload...) ⋈
    * `intervals` (iid, lo, hi, payload...) on lo <= v <= hi
    * (inclusive ends). Both inputs keep their extra columns; the
    * bucket key is internal. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      w: Long): DataFrame = {
    require(w > 0, s"bucket width must be positive, got $w")
    val ivb = intervals.withColumn("__b",
      explode(sequence(bucketOf(col("lo"), w), bucketOf(col("hi"), w))))
    val ptb = points.withColumn("__b", bucketOf(col("v"), w))
    ptb.join(ivb, Seq("__b"))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .drop("__b")
  }

  /** Interval-overlap join: pairs (a, b) with a.lo <= b.hi AND
    * b.lo <= a.hi. Each side registers in its buckets; a pair meeting
    * in several buckets is emitted ONCE by the canonical-bucket rule —
    * the join keeps only the bucket containing max(a.lo, b.lo), so no
    * distinct pass is needed. `left` carries (lo, hi, ...), `right`
    * (lo2, hi2, ...). */
  def intervalOverlap(left: DataFrame, right: DataFrame, w: Long): DataFrame = {
    require(w > 0, s"bucket width must be positive, got $w")
    val lb = left.withColumn("__b",
      explode(sequence(bucketOf(col("lo"), w), bucketOf(col("hi"), w))))
    val rb = right.withColumn("__b",
      explode(sequence(bucketOf(col("lo2"), w), bucketOf(col("hi2"), w))))
    lb.join(rb, Seq("__b"))
      .filter(col("lo") <= col("hi2") && col("lo2") <= col("hi"))
      .filter(col("__b") === bucketOf(greatest(col("lo"), col("lo2")), w))
      .drop("__b")
  }
}
