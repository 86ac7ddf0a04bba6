package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Exponentially weighted moving average per key — the classic
  * smoother s_t = α·x_t + (1−α)·s_{t−1}, seeded with the first value.
  *
  * An EWMA is an inherently sequential left fold with no algebraic
  * shortcut a window aggregate can express (the weights decay
  * geometrically over an unbounded frame), so it runs as a SECONDARY
  * SORT: one shuffle hash-partitioned on the key, a partition-local
  * sort on (key, t, tie) through Spark's external (spilling) sorter,
  * then a single streaming `mapPartitions` fold that resets its state
  * at each key boundary. No group is ever materialized on the heap —
  * a key with a year of 1-second ticks (31M rows) streams through the
  * fold the same as a 10-row key, bounded by the sorter's spill, not
  * by executor memory. Parallelism scales with key cardinality.
  *
  * Cross-engine determinism: the recurrence is a fixed chain of IEEE
  * double ops (α·x + (1−α)·s, two multiplies one add per step) folded
  * in the (t, tiebreak) total order, so a DuckDB recursive CTE walking
  * rows in the same order reproduces it bit-for-bit — no decimal
  * detour needed because both engines execute the SAME order, unlike a
  * commutative sum. */
object Ewma {

  /** Input columns: `key`, `t` (epoch-comparable long), `tie` unique
    * in-key tie-break, `v` value. Output: (key, t, tie, v, ema). */
  def ema(df: DataFrame, key: Column, t: Column, tie: Column, v: Column,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0, 1], got $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("long").as("key"), t.cast("long").as("t"),
        tie.cast("long").as("tie"), v.cast("double").as("v"))
      .repartition(col("key"))
      .sortWithinPartitions("key", "t", "tie")
      .as[(Long, Long, Long, Double)]
      .mapPartitions { it =>
        // rows arrive clustered by key and ordered by (t, tie) within
        // it; the fold streams, resetting at each key boundary (several
        // keys share a partition — hash co-location, not isolation)
        var cur = 0L
        var open = false
        var s = 0.0
        it.map { case (k, tt, tb, vv) =>
          s = if (open && k == cur) alpha * vv + (1 - alpha) * s else vv
          cur = k
          open = true
          (k, tt, tb, vv, s)
        }
      }
      .toDF("key", "t", "tie", "v", "ema")
  }
}
