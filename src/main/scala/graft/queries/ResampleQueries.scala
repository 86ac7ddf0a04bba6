package graft.queries

import graft.Tables
import graft.ops.Exact._
import graft.ops.TimeResample
import graft.ops.TimeResample._
import org.apache.spark.sql.functions._

/** Time-series resampling (SURVEY.md §2.6): tumbling-window downsample
  * with the reference's closed-right + mid-interval-label semantics,
  * calendar-month resample, and monthly climatology.
  */
object ResampleQueries extends QueryGroup {

  /** 6-hourly downsample, closed='right', label = start + 3h
    * (calculations.py time_resample). */
  private val q16 = Q(
    "q16_resample_6h",
    (s, dir) => {
      import s.implicits._
      TimeResample.resample(
          Tables(s, dir, "events"), $"ts", Seq($"event_type"), $"value",
          Fixed(21600), ClosedRight, Seq("mean", "min", "max", "sum", "count"))
        .select($"event_type",
          date_format($"label", "yyyy-MM-dd HH:mm:ss").as("label"),
          $"mean", $"min", $"max", $"sum", $"count")
        .orderBy($"event_type", $"label")
    },
    Some(s"""
      WITH b AS (
        SELECT event_type, value,
          make_timestamp(epoch_us(ts - INTERVAL 1 MICROSECOND)
            - epoch_us(ts - INTERVAL 1 MICROSECOND) % 21600000000) AS bucket
        FROM events)
      SELECT event_type,
        strftime(bucket + INTERVAL 3 HOURS, '%Y-%m-%d %H:%M:%S') AS label,
        ${sqlAvg("value")} AS mean,
        MIN(value) AS min, MAX(value) AS max,
        ${sqlSum("value")} AS sum,
        CAST(COUNT(value) AS BIGINT) AS count
      FROM b
      GROUP BY event_type, bucket
      ORDER BY event_type, label"""))

  /** Calendar-month resample with the reference's '1M'→15-day label shift
    * (calculations.py:111-113). */
  private val q17 = Q(
    "q17_resample_month",
    (s, dir) => {
      import s.implicits._
      TimeResample.resample(
          Tables(s, dir, "events"), $"ts", Seq($"event_type"), $"value",
          Monthly, ClosedRight, Seq("mean", "sum", "count"))
        .select($"event_type",
          date_format($"label", "yyyy-MM-dd").as("label"),
          $"mean", $"sum", $"count")
        .orderBy($"event_type", $"label")
    },
    Some(s"""
      WITH b AS (
        SELECT event_type, value,
          date_trunc('month', ts - INTERVAL 1 MICROSECOND) AS bucket
        FROM events)
      SELECT event_type,
        strftime(bucket + INTERVAL 15 DAYS, '%Y-%m-%d') AS label,
        ${sqlAvg("value")} AS mean,
        ${sqlSum("value")} AS sum,
        CAST(COUNT(value) AS BIGINT) AS count
      FROM b
      GROUP BY event_type, bucket
      ORDER BY event_type, label"""))

  /** Monthly climatology — group by calendar month across years
    * (mop_utils.py axm_timeshot 'clim' semantics). */
  private val q18 = Q(
    "q18_climatology_month",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .groupBy(month($"o_orderdate").as("month"))
        .agg(davg($"o_totalprice").as("clim_mean"), count(lit(1)).as("n"))
        .orderBy($"month")
    },
    Some(s"""
      SELECT CAST(date_part('month', o_orderdate) AS INT) AS month,
        ${sqlAvg("o_totalprice")} AS clim_mean,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM orders
      GROUP BY 1 ORDER BY month"""))

  def queries: Seq[Q] = Seq(q16, q17, q18)
}
