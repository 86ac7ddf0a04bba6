package graft.queries

import graft.Tables
import graft.ops.{Exact, WindowOps}
import graft.ops.Exact._
import org.apache.spark.sql.functions._

/** Ordered/window operators (SURVEY.md §2.5) demonstrated on the `events`
  * time-series table: running integrals, overturning-style
  * cumsum-minus-total, last-valid-cell, midpoint bounds, per-month
  * normalization.
  */
object WindowQueries extends QueryGroup {

  /** Running time-integral per series (mop_utils.py axm_t_integral →
    * window cumulative sum). */
  private val q11 = Q(
    "q11_running_sum",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .withColumn("running",
          WindowOps.runningSum($"value", Seq($"user_id"), Seq($"event_id")))
        .select($"event_id", $"user_id", $"running")
        .orderBy($"user_id", $"event_id")
    },
    Some(s"""
      SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
          (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      FROM events
      ORDER BY user_id, event_id"""))

  /** Cumulative sum minus full-column total — the meridional-overturning
    * shape (app_functions.py:191-201). */
  private val q12 = Q(
    "q12_overturning_shape",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .withColumn("msf",
          WindowOps.runningSumMinusTotal($"value", Seq($"user_id"), Seq($"event_id")))
        .select($"event_id", $"user_id", $"msf")
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
               (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - SUM(CAST(value AS DECIMAL(18,6))) OVER
               (PARTITION BY user_id) AS DOUBLE) AS msf
      FROM events
      ORDER BY user_id, event_id"""))

  /** Last non-null value per series — "ocean_floor" / bottom-cell select
    * (calculations.py:683-698). Error events are treated as missing. */
  private val q13 = Q(
    "q13_last_non_null",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
        .withColumn("v", when($"event_type" === "error", lit(null)).otherwise($"value"))
      WindowOps.lastNonNull(ev, Seq($"user_id"), $"event_id", $"v")
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id,
        arg_max(v, event_id) AS last_value,
        MAX(event_id) AS last_pos,
        CAST(COUNT(v) AS BIGINT) AS n_valid
      FROM (SELECT user_id, event_id,
              CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
            FROM events) t
      WHERE v IS NOT NULL
      GROUP BY user_id
      ORDER BY user_id"""))

  /** Coordinate midpoint bounds with extrapolated, clamped ends
    * (mop_utils.py:679-755) over the distinct part retail prices. */
  private val q14 = Q(
    "q14_midpoint_bounds",
    (s, dir) => {
      import s.implicits._
      val coords = Tables(s, dir, "part")
        .select($"p_retailprice".as("coord")).distinct()
      WindowOps.midpointBounds(coords, "coord", clampLo = Some(0.0))
        .orderBy($"coord")
    },
    Some("""
      SELECT coord,
        GREATEST(CASE WHEN prev IS NULL THEN coord - (next - coord) / 2.0
                      ELSE (prev + coord) / 2.0 END, 0.0) AS bnd_lo,
        GREATEST(CASE WHEN next IS NULL THEN coord + (coord - prev) / 2.0
                      ELSE (coord + next) / 2.0 END, 0.0) AS bnd_hi
      FROM (SELECT coord,
              LAG(coord) OVER (ORDER BY coord) AS prev,
              LEAD(coord) OVER (ORDER BY coord) AS next
            FROM (SELECT DISTINCT p_retailprice AS coord FROM part) c) t
      ORDER BY coord"""))

  /** Per-month normalization (mop_utils.py calc_monsecs: divide by
    * days-in-month × 86400). */
  private val q15 = Q(
    "q15_month_normalize",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .select($"event_id",
          ($"value" / (dayofmonth(last_day($"ts")) * lit(86400.0))).as("per_sec"))
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id,
        value / (date_part('day', last_day(ts)) * 86400.0) AS per_sec
      FROM events ORDER BY event_id"""))

  def queries: Seq[Q] = Seq(q11, q12, q13, q14, q15)
}
