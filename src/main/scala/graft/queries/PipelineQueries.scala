package graft.queries

import graft.Tables
import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Planner / catalog pipeline queries (SURVEY.md §3): DRS-style output
  * naming, the size-ladder file-splitting physical planner, and
  * frequency inference from time-axis deltas.
  */
object PipelineQueries extends QueryGroup {

  /** DRS path + filename templating (setup_utils.py build_filename
    * 486-542; templates CMIP6_conf.yaml:31-32): per (variable, year),
    * deterministic directory + file name with a frequency-precision date
    * range stamp. */
  private val q39 = Q(
    "q39_drs_filename",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"event_type", year($"ts").as("yr"))
        .agg(min($"ts").as("t0"), max($"ts").as("t1"), count(lit(1)).as("nsteps"))
        .select($"event_type", $"yr", $"nsteps",
          concat_ws("/",
            lit("CMIP6"), lit("CMIP"), lit("ACME"), lit("SPARK1"), lit("histor"),
            lit("r1i1p1f1"), lit("Amon"), $"event_type", lit("gn"), lit("v20260801"))
            .as("drs_path"),
          concat($"event_type", lit("_Amon_SPARK1_histor_r1i1p1f1_gn_"),
            date_format($"t0", "yyyyMM"), lit("-"),
            date_format($"t1", "yyyyMM"), lit(".nc")).as("filename"))
        .orderBy($"event_type", $"yr")
    },
    Some("""
      SELECT event_type, CAST(date_part('year', ts) AS INT) AS yr,
        CAST(COUNT(*) AS BIGINT) AS nsteps,
        'CMIP6/CMIP/ACME/SPARK1/histor/r1i1p1f1/Amon/' || event_type ||
          '/gn/v20260801' AS drs_path,
        event_type || '_Amon_SPARK1_histor_r1i1p1f1_gn_' ||
          strftime(MIN(ts), '%Y%m') || '-' || strftime(MAX(ts), '%Y%m') ||
          '.nc' AS filename
      FROM events GROUP BY event_type, yr ORDER BY event_type, yr"""))

  /** Size-ladder file splitting (setup_utils.py compute_fsize 430-482 +
    * define_files 592-644): estimate per-variable output size, pick the
    * interval rung that keeps each file under max_size, and emit one row
    * per output file with its [tstart, tend) micro-second slice. The
    * whole physical plan is itself a DataFrame — at scale the planner
    * runs distributed, not on the driver. */
  private val q40 = Q(
    "q40_interval_ladder",
    (s, dir) => {
      import s.implicits._
      val maxMb = 100.0
      val stats = Tables(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("nsteps"),
          unix_micros(min($"ts")).as("t0us"), unix_micros(max($"ts")).as("t1us"))
        .withColumn("total_mb", $"nsteps" * lit(0.5))
        .withColumn("nfiles",
          ceil($"total_mb" / lit(maxMb)).cast("int"))
        .withColumn("interval",
          when($"nfiles" <= 1, "all").when($"nfiles" <= 10, "1y")
            .when($"nfiles" <= 100, "1mo").otherwise("1d"))
      stats
        .select($"event_type", $"total_mb", $"interval", $"nfiles",
          explode(sequence(lit(0), $"nfiles" - 1)).as("file_i"),
          $"t0us", $"t1us")
        // integer `div`, not `/`: epoch-micros exceed the double mantissa
        .withColumn("span", expr("(t1us - t0us + 1) div nfiles"))
        .select($"event_type", $"total_mb", $"interval", $"file_i",
          timestamp_micros($"t0us" + $"file_i" * $"span").as("tstart"),
          timestamp_micros($"t0us" + ($"file_i" + 1) * $"span").as("tend"))
        .orderBy($"event_type", $"file_i")
    },
    Some("""
      WITH stats AS (
        SELECT event_type, COUNT(*) AS nsteps,
          epoch_us(MIN(ts)) AS t0us, epoch_us(MAX(ts)) AS t1us,
          COUNT(*) * 0.5e0 AS total_mb,
          CAST(CEIL(COUNT(*) * 0.5e0 / 100.0e0) AS INT) AS nfiles
        FROM events GROUP BY event_type),
      ladder AS (
        SELECT *, CASE WHEN nfiles <= 1 THEN 'all' WHEN nfiles <= 10 THEN '1y'
                       WHEN nfiles <= 100 THEN '1mo' ELSE '1d' END AS interval
        FROM stats),
      files AS (
        SELECT event_type, total_mb, interval, t0us, t1us, nfiles,
               unnest(generate_series(0, nfiles - 1)) AS file_i
        FROM ladder)
      SELECT event_type, total_mb, interval, file_i,
        make_timestamp(t0us + file_i * ((t1us - t0us + 1) // nfiles)) AS tstart,
        make_timestamp(t0us + (file_i + 1) * ((t1us - t0us + 1) // nfiles)) AS tend
      FROM files ORDER BY event_type, file_i"""))

  /** Frequency inference from time-axis deltas (mopdb_utils.py build_umfrq
    * 401-428 + get_frequency 431-467): per series, the dominant
    * inter-sample delta (deterministic tie-break: larger count first,
    * then smaller delta) mapped onto a frequency label. */
  private val q41 = Q(
    "q41_frequency_inference",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
        .withColumn("prev_us",
          lag(unix_micros($"ts"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"user_id").orderBy($"ts", $"event_id")))
        .filter($"prev_us".isNotNull)
        .withColumn("delta_s", expr("(unix_micros(ts) - prev_us) div 1000000"))
      val counts = ev.groupBy($"user_id", $"delta_s").agg(count(lit(1)).as("n"))
      Relational.topOnePerGroup(counts, Seq($"user_id"),
          Seq($"n".desc, $"delta_s".asc))
        .withColumn("freq",
          when($"delta_s" <= 90, "1min").when($"delta_s" <= 5400, "1hr")
            .when($"delta_s" <= 129600, "day").otherwise("mon"))
        .select($"user_id", $"delta_s", $"n", $"freq")
        .orderBy($"user_id")
    },
    Some("""
      WITH d AS (
        SELECT user_id,
          (epoch_us(ts) - LAG(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS delta_s
        FROM events),
      counts AS (
        SELECT user_id, delta_s, CAST(COUNT(*) AS BIGINT) AS n
        FROM d WHERE delta_s IS NOT NULL GROUP BY user_id, delta_s),
      best AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY n DESC, delta_s) AS rn
        FROM counts)
      SELECT user_id, delta_s, n,
        CASE WHEN delta_s <= 90 THEN '1min' WHEN delta_s <= 5400 THEN '1hr'
             WHEN delta_s <= 129600 THEN 'day' ELSE 'mon' END AS freq
      FROM best WHERE rn = 1 ORDER BY user_id"""))

  def queries: Seq[Q] = Seq(q39, q40, q41)
}
