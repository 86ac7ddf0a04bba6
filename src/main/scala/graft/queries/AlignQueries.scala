package graft.queries

import graft.Tables
import graft.ops.{Interp, TimeEnc}
import graft.ops.Exact._
import org.apache.spark.sql.functions._

/** Coordinate re-alignment and parsing batch (SURVEY.md §2.3/§2.6/§2.7):
  * nearest-neighbor re-indexing (the as-of-join family), level→height
  * re-keying, filename-timestamp parsing, and scalar-broadcast offset.
  */
object AlignQueries extends QueryGroup {

  /** Nearest re-alignment (`reindex_like(method='nearest')`,
    * calculations.py:893-901) — each hourly grid point takes the value of
    * the nearest event in time; equidistant ties take the earlier one. */
  private val q54 = Q(
    "q54_asof_nearest",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events").filter($"user_id" < 30)
      val samples = ev.select($"user_id",
        (TimeEnc.usOf($"ts") / lit(1000000.0)).as("coord"), $"value")
      val targets = ev.select($"user_id").distinct()
        .crossJoin(
          s.range(1).select(explode(sequence(
            lit("2024-01-05 00:00:00").cast("timestamp"),
            lit("2024-01-06 00:00:00").cast("timestamp"),
            expr("INTERVAL 1 HOUR"))).as("gts")).drop("id"))
        .select($"user_id", (TimeEnc.usOf($"gts") / lit(1000000.0)).as("coord"),
          date_format($"gts", "yyyy-MM-dd HH:mm:ss").as("grid_ts"))
      Interp.nearestToGrid(samples, targets, Seq("user_id"), "coord", "value")
        .select($"user_id", $"grid_ts", $"nearest")
        .orderBy($"user_id", $"grid_ts")
    },
    Some("""
      WITH ev AS (SELECT * FROM events WHERE user_id < 30),
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
          TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-06 00:00:00',
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
             WHEN coord - pc <= nc - coord THEN pv
             ELSE nv END AS nearest
      FROM w WHERE is_sample = 0
      ORDER BY user_id, grid_ts"""))

  /** Level-number → height-coordinate re-key (level_to_height,
    * calculations.py:1160-1184: swap_dims + slice): broadcast the
    * level→height lookup, re-key, aggregate on the new axis, keep
    * heights <= 55. */
  private val q55 = Q(
    "q55_level_to_height",
    (s, dir) => {
      import s.implicits._
      val heights = s.range(1, 8).select($"id".cast("int").as("lev"),
        ($"id" * 10.0 + 5.5).as("height"))
      Tables(s, dir, "lineitem")
        .select($"l_linenumber".cast("int").as("lev"), $"l_quantity".as("v"))
        .join(broadcast(heights), Seq("lev"))
        .filter($"height" <= 55.0)
        .groupBy($"height")
        .agg(dsum($"v").as("vsum"), count(lit(1)).as("n"))
        .orderBy($"height")
    },
    Some(s"""
      WITH h AS (SELECT CAST(r AS INT) AS lev, r * 10.0e0 + 5.5e0 AS height
                 FROM (SELECT unnest(generate_series(1, 7)) AS r)),
      g AS (SELECT CAST(l_linenumber AS INT) AS lev, l_quantity AS v
            FROM lineitem)
      SELECT height, ${sqlSum("v")} AS vsum, CAST(COUNT(*) AS BIGINT) AS n
      FROM g JOIN h USING (lev)
      WHERE height <= 55.0e0
      GROUP BY height ORDER BY height"""))

  /** Filename-timestamp parsing (mop_utils.py check_timestamp 239-295):
    * synthesize realm-style filenames, regexp-extract the date stamp,
    * parse, and prune to a range — the scan-pruning planner primitive. */
  private val q56 = Q(
    "q56_filename_timestamp",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderkey",
          concat(lit("ocean_daily_"),
            date_format($"o_orderdate", "yyyyMMdd"), lit(".nc")).as("fname"))
        .withColumn("stamp", regexp_extract($"fname", "_(\\d{8})\\.nc$", 1))
        .withColumn("fdate", to_date($"stamp", "yyyyMMdd"))
        .filter($"fdate" >= lit("1997-01-01").cast("date") &&
                $"fdate" < lit("1999-01-01").cast("date"))
        .groupBy(date_format($"fdate", "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_files"))
        .orderBy($"month")
    },
    Some("""
      WITH f AS (
        SELECT o_orderkey,
          'ocean_daily_' || strftime(o_orderdate, '%Y%m%d') || '.nc' AS fname
        FROM orders),
      p AS (
        SELECT o_orderkey,
          strptime(regexp_extract(fname, '_(\d{8})\.nc$', 1), '%Y%m%d')::DATE
            AS fdate
        FROM f)
      SELECT strftime(fdate, '%Y-%m') AS month, CAST(COUNT(*) AS BIGINT) AS n_files
      FROM p
      WHERE fdate >= DATE '1997-01-01' AND fdate < DATE '1999-01-01'
      GROUP BY 1 ORDER BY month"""))

  /** Barotropic scalar offset (msftbarot, calculations.py:518-541): a
    * per-year scalar aggregate (the Drake-box transport) broadcast back
    * onto the year's 2-D field — scalar-agg cross join + add. */
  private val q57 = Q(
    "q57_barotropic_offset",
    (s, dir) => {
      import s.implicits._
      val g = Tables(s, dir, "lineitem").select(
        year($"l_shipdate").as("yr"),
        ($"l_suppkey" % 20).cast("int").as("y"),
        ($"l_partkey" % 20).cast("int").as("x"),
        $"l_quantity".as("v"))
      val drake = g.filter($"x" <= 2)
        .groupBy($"yr").agg(dsum($"v" * 0.001e0).as("drake"))
      g.groupBy($"yr", $"y").agg(dsum($"v").as("field"))
        .join(broadcast(drake), Seq("yr"))
        .select($"yr", $"y", ($"field" + $"drake").as("offset_field"))
        .orderBy($"yr", $"y")
    },
    Some(s"""
      WITH g AS (
        SELECT CAST(date_part('year', l_shipdate) AS INT) AS yr,
               CAST(l_suppkey % 20 AS INT) AS y,
               CAST(l_partkey % 20 AS INT) AS x, l_quantity AS v
        FROM lineitem),
      drake AS (SELECT yr, ${sqlSum("v * 0.001e0")} AS drake
                FROM g WHERE x <= 2 GROUP BY yr),
      field AS (SELECT yr, y, ${sqlSum("v")} AS field FROM g GROUP BY yr, y)
      SELECT f.yr, f.y, f.field + d.drake AS offset_field
      FROM field f JOIN drake d ON f.yr = d.yr
      ORDER BY f.yr, f.y"""))

  /** plevinterp itself (calculations.py:855-923): per (yr,y,x) column,
    * interpolate the variable against model pressure onto fixed target
    * pressure levels — the reference's flagship custom operator, as the
    * union+running-window kernel with a composite group key. Model
    * pressure is lev-derived so sample coordinates are unique per
    * profile (np.interp precondition). */
  private val q68 = Q(
    "q68_plevinterp",
    (s, dir) => {
      import s.implicits._
      val profiles = Tables(s, dir, "lineitem")
        .select(year($"l_shipdate").as("yr"),
          ($"l_suppkey" % 20).cast("int").as("y"),
          ($"l_partkey" % 20).cast("int").as("x"),
          $"l_linenumber".cast("int").as("lev"), $"l_quantity".as("v"))
        .groupBy($"yr", $"y", $"x", $"lev")
        .agg(dsum($"v").as("value"))
        .withColumn("coord", $"lev" * lit(150.0))
        .drop("lev")
      val targets = profiles.select($"yr", $"y", $"x").distinct()
        .withColumn("coord", explode(array(lit(200.0), lit(500.0), lit(900.0))))
      Interp.interpolateToGrid(profiles, targets,
          Seq("yr", "y", "x"), "coord", "value")
        .select($"yr", $"y", $"x", $"coord".as("plev"), $"interp")
        .orderBy($"yr", $"y", $"x", $"plev")
    },
    Some(s"""
      WITH prof AS (
        SELECT CAST(date_part('year', l_shipdate) AS INT) AS yr,
               CAST(l_suppkey % 20 AS INT) AS y,
               CAST(l_partkey % 20 AS INT) AS x,
               CAST(l_linenumber AS INT) * 150.0e0 AS coord,
               ${sqlSum("l_quantity")} AS v
        FROM lineitem GROUP BY 1, 2, 3, l_linenumber),
      samples AS (
        SELECT yr, y, x, coord, v, 1 AS is_sample FROM prof),
      targets AS (
        SELECT DISTINCT yr, y, x, t.plev AS coord, CAST(NULL AS DOUBLE) AS v,
               0 AS is_sample
        FROM prof, (VALUES (200.0e0), (500.0e0), (900.0e0)) t(plev)),
      un AS (SELECT * FROM samples UNION ALL SELECT * FROM targets),
      w AS (
        SELECT yr, y, x, coord, is_sample,
          last_value(v IGNORE NULLS) OVER win_prev AS pv,
          last_value(CASE WHEN is_sample = 1 THEN coord END IGNORE NULLS)
            OVER win_prev AS pc,
          first_value(v IGNORE NULLS) OVER win_next AS nv,
          first_value(CASE WHEN is_sample = 1 THEN coord END IGNORE NULLS)
            OVER win_next AS nc
        FROM un
        WINDOW
          win_prev AS (PARTITION BY yr, y, x ORDER BY coord, is_sample DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          win_next AS (PARTITION BY yr, y, x ORDER BY coord, is_sample DESC
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT yr, y, x, coord AS plev,
        CASE WHEN pc IS NULL THEN nv
             WHEN nc IS NULL THEN pv
             WHEN nc = pc THEN pv
             ELSE pv + (nv - pv) * (coord - pc) / (nc - pc) END AS interp
      FROM w WHERE is_sample = 0
      ORDER BY yr, y, x, plev"""))

  /** Backward as-of join via the custom plan operator
    * (graft.plans.AsOfJoinExec): every event picks up the most recent
    * earlier-or-equal click aggregate of its user — one co-partitioned
    * sort-merge sweep (two exchanges total, AsOfJoinSpec audits the
    * plan), verified against DuckDB's native ASOF LEFT JOIN. */
  private val q75 = Q(
    "q75_asof_backward",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .groupBy($"user_id".as("r_uid"), $"ts".as("r_ts"))
        .agg(dsum($"value").as("click_value"))
      graft.plans.AsOf.backwardJoin(
          ev.select($"event_id", $"user_id", $"ts"), clicks,
          Seq("user_id"), Seq("r_uid"), "ts", "r_ts")
        .select($"event_id", $"user_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          $"click_value")
        .orderBy($"event_id")
    },
    Some(s"""
      WITH r AS (
        SELECT user_id AS r_uid, ts AS r_ts, ${sqlSum("value")} AS click_value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT e.event_id, e.user_id,
        strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s, r.click_value
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.r_uid AND e.ts >= r.r_ts
      ORDER BY e.event_id"""))

  def queries: Seq[Q] = Seq(q54, q55, q56, q57, q68, q75)
}
