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

  /** Model-calendar monthly resample (ops/ModelCalendar): a synthetic
    * model-day axis is bucketed by BOTH the 360-day and noleap month
    * keys, with the calc_monsecs normalization (constant 30-day months
    * under Day360). The calendar arithmetic is pure integer column
    * math, so the DuckDB oracle mirrors it with // and % — the
    * engine-owned calendars are oracle-checked, not just unit-spec'd. */
  private val q93 = Q(
    "q93_model_calendar_month",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ModelCalendar
      import graft.ops.ModelCalendar.{Day360, NoLeap}
      val t = (($"l_orderkey" * 7 + $"l_linenumber") % 3600).cast("int")
      Tables(s, dir, "lineitem")
        .select(t.as("t"), $"l_quantity")
        .select(
          ModelCalendar.monthKey(
            ModelCalendar.fromDaysSinceEpoch($"t", Day360)).as("mk360"),
          ModelCalendar.monthKey(
            ModelCalendar.fromDaysSinceEpoch($"t", NoLeap)).as("mk365"),
          $"l_quantity")
        .groupBy($"mk360", $"mk365")
        .agg(count(lit(1)).as("n"),
          (dsum($"l_quantity") / (30.0 * 86400.0)).as("monsec_mean"))
        .orderBy($"mk360", $"mk365")
    },
    Some(s"""
      WITH m AS (
        SELECT CAST((l_orderkey * 7 + l_linenumber) % 3600 AS INT) AS t,
               l_quantity
        FROM lineitem),
      keyed AS (
        SELECT
          (t // 360) * 100 + (t % 360) // 30 + 1 AS mk360,
          (t // 365) * 100 +
            (CASE WHEN t % 365 >= 334 THEN 12
                  WHEN t % 365 >= 304 THEN 11
                  WHEN t % 365 >= 273 THEN 10
                  WHEN t % 365 >= 243 THEN 9
                  WHEN t % 365 >= 212 THEN 8
                  WHEN t % 365 >= 181 THEN 7
                  WHEN t % 365 >= 151 THEN 6
                  WHEN t % 365 >= 120 THEN 5
                  WHEN t % 365 >= 90 THEN 4
                  WHEN t % 365 >= 59 THEN 3
                  WHEN t % 365 >= 31 THEN 2
                  ELSE 1 END) AS mk365,
          l_quantity
        FROM m)
      SELECT CAST(mk360 AS INT) AS mk360, CAST(mk365 AS INT) AS mk365,
        CAST(COUNT(*) AS BIGINT) AS n,
        ${sqlSum("l_quantity")} / (30.0e0 * 86400.0e0) AS monsec_mean
      FROM keyed GROUP BY mk360, mk365
      ORDER BY mk360, mk365"""))

  def queries: Seq[Q] = Seq(q16, q17, q18, q93)
}
