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

/** Two-sided CUSUM changepoint detector (Page '54) — the alarm sibling
  * of [[Ewma]]: S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − k)) accumulates
  * upward drift, S⁻_t = max(0, S⁻_{t−1} + (μ − k − x_t)) downward; a
  * sustained mean shift grows one of them linearly while noise is
  * absorbed by the slack k, and crossing h raises the alarm — the
  * classic sequential drift alarm a windowed mean cannot express (the
  * max-with-zero reset makes it a genuine left fold).
  *
  * Same execution shape as [[Ewma.ema]]: secondary sort + streaming
  * per-partition fold, state reset at key boundaries, O(1) memory per
  * key. Same determinism argument: a fixed chain of IEEE ops
  * (add, sub, max) in the (t, tie) total order — the DuckDB recursive
  * CTE walking the same order reproduces it bit-for-bit. */
object Cusum {

  /** Input columns: `key` (string), `t`, `tie` (the in-key total
    * order), `v`, and the per-key reference `mu` and `sigma` (constant
    * within a key). The fold runs on the STANDARDIZED value
    * z = (v − μ)/σ — the textbook formulation (k in σ-units, usually
    * 0.5; h usually 4–5): on raw heavy-tailed values a fixed slack is
    * either swamped (reflected-walk steady state σ²/2k above any
    * threshold) or deaf. Output adds (s_hi, s_lo, alarm). */
  def cusum(df: DataFrame, k: Double, h: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("key").cast("string"), col("t").cast("long"),
        col("tie").cast("long"), col("v").cast("double"),
        col("mu").cast("double"), col("sigma").cast("double"))
      .repartition(col("key"))
      .sortWithinPartitions("key", "t", "tie")
      .as[(String, Long, Long, Double, Double, Double)]
      .mapPartitions { it =>
        var cur: String = null
        var shi = 0.0
        var slo = 0.0
        it.map { case (kk, t, tie, v, mu, sigma) =>
          if (cur == null || kk != cur) { shi = 0.0; slo = 0.0 }
          val z = (v - mu) / sigma
          shi = math.max(0.0, shi + (z - k))
          slo = math.max(0.0, slo + (-z - k))
          cur = kk
          (kk, t, tie, v, shi, slo, shi > h || slo > h)
        }
      }
      .toDF("key", "t", "tie", "v", "s_hi", "s_lo", "alarm")
  }
}
