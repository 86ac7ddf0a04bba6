package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Exponentially weighted moving average per key — the classic
  * smoother s_t = α·x_t + (1−α)·s_{t−1}, seeded with the first value.
  *
  * An EWMA is an inherently sequential left fold with no algebraic
  * shortcut a window aggregate can express (the weights decay
  * geometrically over an unbounded frame), so it runs like the other
  * sequential folds ([[Sessionize]] is windowed, sequence packing is
  * a mapGroups pass): one `groupByKey.flatMapGroups`, the shuffle
  * carrying only (key, order, value). A group is one time series — a
  * user, a grid cell — small by contract; the partition count scales
  * with key cardinality.
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
    val typed = df
      .select(key.cast("long").as("key"), t.cast("long").as("t"),
        tie.cast("long").as("tie"), v.cast("double").as("v"))
      .as[(Long, Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        var s = 0.0
        var first = true
        it.toSeq.sortBy(r => (r._2, r._3)).map { case (_, tt, tb, vv) =>
          s = if (first) vv else alpha * vv + (1 - alpha) * s
          first = false
          (k, tt, tb, vv, s)
        }
      }
      .toDF("key", "t", "tie", "v", "ema")
  }
}
