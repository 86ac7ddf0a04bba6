package graft.queries

import graft.Tables
import graft.ops.{Interp, TimeEnc}
import org.apache.spark.sql.functions._

/** Linear-interpolation operators (SURVEY.md §2.6): the plevinterp kernel
  * (per-group piecewise-linear interpolation onto a requested grid)
  * exercised as time-series upsampling on `events`.
  */
object InterpQueries extends QueryGroup {

  /** Per-user linear interpolation of `value` onto an hourly grid
    * (plevinterp / resample().interpolate('linear') kernel). Coordinates
    * are epoch seconds as doubles; identical arithmetic on both engines. */
  private val q19 = Q(
    "q19_interp_linear",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events").filter($"user_id" < 50)
      val samples = ev.select($"user_id",
        (TimeEnc.usOf($"ts") / lit(1000000.0)).as("coord"), $"value")
      val targets = ev.select($"user_id").distinct()
        .crossJoin(
          s.range(1).select(explode(sequence(
            lit("2024-01-05 00:00:00").cast("timestamp"),
            lit("2024-01-07 00:00:00").cast("timestamp"),
            expr("INTERVAL 1 HOUR"))).as("gts")).drop("id"))
        .select($"user_id", (TimeEnc.usOf($"gts") / lit(1000000.0)).as("coord"),
          date_format($"gts", "yyyy-MM-dd HH:mm:ss").as("grid_ts"))
      Interp.interpolateToGrid(samples, targets, Seq("user_id"), "coord", "value")
        .select($"user_id", $"grid_ts", $"interp")
        .orderBy($"user_id", $"grid_ts")
    },
    Some("""
      WITH ev AS (SELECT * FROM events WHERE user_id < 50),
      samples AS (
        SELECT user_id, epoch_us(ts)/1000000.0 AS coord, value AS v,
               1 AS is_sample, CAST(NULL AS VARCHAR) AS grid_ts
        FROM ev),
      targets AS (
        SELECT u.user_id, epoch_us(g.g)/1000000.0 AS coord,
               CAST(NULL AS DOUBLE) AS v, 0 AS is_sample,
               strftime(g.g, '%Y-%m-%d %H:%M:%S') AS grid_ts
        FROM (SELECT DISTINCT user_id FROM ev) u
        CROSS JOIN (SELECT unnest(generate_series(
          TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-07 00:00:00',
          INTERVAL 1 HOUR)) AS g) g),
      un AS (SELECT * FROM samples UNION ALL SELECT * FROM targets),
      w AS (
        SELECT user_id, coord, is_sample, grid_ts,
          last_value(v IGNORE NULLS) OVER win_prev AS pv,
          last_value(CASE WHEN is_sample = 1 THEN coord END IGNORE NULLS)
            OVER win_prev AS pc,
          first_value(v IGNORE NULLS) OVER win_next AS nv,
          first_value(CASE WHEN is_sample = 1 THEN coord END IGNORE NULLS)
            OVER win_next AS nc
        FROM un
        WINDOW
          win_prev AS (PARTITION BY user_id ORDER BY coord, is_sample DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          win_next AS (PARTITION BY user_id ORDER BY coord, is_sample DESC
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, grid_ts,
        CASE WHEN pc IS NULL THEN nv
             WHEN nc IS NULL THEN pv
             WHEN nc = pc THEN pv
             ELSE pv + (nv - pv) * (coord - pc) / (nc - pc) END AS interp
      FROM w WHERE is_sample = 0
      ORDER BY user_id, grid_ts"""))

  def queries: Seq[Q] = Seq(q19)
}
