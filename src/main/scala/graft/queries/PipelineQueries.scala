package graft.queries

import graft.Tables
import graft.ops.{Relational, TimeEnc}
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
          TimeEnc.usOf(min($"ts")).as("t0us"), TimeEnc.usOf(max($"ts")).as("t1us"))
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
          lag(TimeEnc.usOf($"ts"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"user_id").orderBy($"ts", $"event_id")))
        .filter($"prev_us".isNotNull)
        .withColumn("delta_s",
          expr("(unix_micros(cast(ts as timestamp)) - prev_us) div 1000000"))
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

  /** Cell-methods inference (mopdb_utils.py get_cell_methods 470-488):
    * the varlist default/normalize rule — `area: ` prefixing,
    * `time: point` defaulting with the `Pt` frequency modifier, and
    * time-dim token normalization. The fixture rows cover every branch
    * plus the two reference quirks mirrored verbatim (the separator-less
    * append and the case-sensitive substring checks). */
  private val q102 = Q(
    "q102_cell_methods",
    (s, dir) => {
      import s.implicits._
      val vars = Seq(
        (1, None: Option[String], Seq("time", "lat", "lon")),
        (2, Some("time: mean"), Seq("time", "lat", "lon")),
        (3, Some("area: mean time: mean"), Seq("time_0", "lat", "lon")),
        (4, Some("time_0: maximum"), Seq("time_0", "lat", "lon")),
        (5, Some("area: sum"), Seq("time", "lat")),
        (6, Some("lat: mean"), Seq("lat", "lon")),
        (7, Some("time: point"), Seq("time", "time_0")),
        (8, Some(""), Seq("time")),
        (9, Some("longitude: mean time: maximum"), Seq("time")),
        (10, Some("area: time: mean"), Seq("Time", "lat")))
        .toDF("case_id", "cm", "dims")
      val (cm, frqmod) = graft.catalog.Axes.cellMethods($"cm", $"dims")
      vars.select($"case_id", cm.as("cell_methods"), frqmod.as("frqmod"))
        .orderBy($"case_id")
    },
    Some("""
      WITH v(case_id, cm, dims) AS (VALUES
        (1, CAST(NULL AS VARCHAR), ['time', 'lat', 'lon']),
        (2, 'time: mean', ['time', 'lat', 'lon']),
        (3, 'area: mean time: mean', ['time_0', 'lat', 'lon']),
        (4, 'time_0: maximum', ['time_0', 'lat', 'lon']),
        (5, 'area: sum', ['time', 'lat']),
        (6, 'lat: mean', ['lat', 'lon']),
        (7, 'time: point', ['time', 'time_0']),
        (8, '', ['time']),
        (9, 'longitude: mean time: maximum', ['time']),
        (10, 'area: time: mean', ['Time', 'lat'])),
      b AS (
        SELECT case_id,
          CASE WHEN contains(COALESCE(cm, ''), 'area') THEN COALESCE(cm, '')
               ELSE 'area: ' || COALESCE(cm, '') END AS val,
          list_filter(dims, d -> contains(d, 'time')) AS tax
        FROM v)
      SELECT case_id,
        CASE WHEN len(tax) = 1 AND NOT contains(val, 'time')
               THEN val || 'time: point'
             WHEN len(tax) = 1 THEN replace(val, tax[1], 'time')
             ELSE val END AS cell_methods,
        CASE WHEN len(tax) = 1 AND NOT contains(val, 'time')
               THEN 'Pt' ELSE '' END AS frqmod
      FROM b ORDER BY case_id"""))

  /** Filename-token frequency inference (mopdb_utils.py get_frequency
    * 431-467) composed with q41's delta ladder under the reference's
    * precedence: the filename substring rules answer first; only files
    * whose name is mute (the 'NA' sentinel) consult the dominant
    * time-axis delta; grid/static files with neither stay 'NA'. */
  private val q103 = Q(
    "q103_filename_frequency",
    (s, dir) => {
      import s.implicits._
      val files = Seq(
        (1, "atmos", "umnsa_pa_2024_dai.nc", None: Option[Long]),
        (2, "atmos", "umnsa_pa_2024_3h.nc", None: Option[Long]),
        (3, "atmos", "umnsa_pa_2024_6h.nc", None: Option[Long]),
        (4, "atmos", "umnsa_pa_2024_1hPt.nc", None: Option[Long]),
        (5, "atmos", "umnsa_pa_2024_mon.nc", None: Option[Long]),
        (6, "ocean", "ocean_scalar.nc-20240101", None: Option[Long]),
        (7, "ocean", "ocean_month.nc", None: Option[Long]),
        (8, "ocean", "ocean_daily.nc", None: Option[Long]),
        (9, "ocean", "ocean_snapshot.nc", Some(3600L)),
        (10, "ice", "iceh_m.2024-01.nc", None: Option[Long]),
        (11, "ice", "iceh_d.2024-01-01.nc", None: Option[Long]),
        (12, "ice", "iceh.2024.nc", Some(86400L)),
        (13, "land", "land_veg_2024.nc", Some(2592000L)),
        (14, "ocean", "ocean_grid.nc", None: Option[Long]))
        .toDF("file_id", "realm", "fname", "delta_s")
      files.select($"file_id", $"realm", $"fname",
          graft.catalog.Catalog.filenameFrequency($"realm", $"fname")
            .as("fname_freq"),
          graft.catalog.Catalog.frequencyWithFallback($"realm", $"fname",
            $"delta_s").as("freq"))
        .orderBy($"file_id")
    },
    Some("""
      WITH f(file_id, realm, fname, delta_s) AS (VALUES
        (1, 'atmos', 'umnsa_pa_2024_dai.nc', CAST(NULL AS BIGINT)),
        (2, 'atmos', 'umnsa_pa_2024_3h.nc', NULL),
        (3, 'atmos', 'umnsa_pa_2024_6h.nc', NULL),
        (4, 'atmos', 'umnsa_pa_2024_1hPt.nc', NULL),
        (5, 'atmos', 'umnsa_pa_2024_mon.nc', NULL),
        (6, 'ocean', 'ocean_scalar.nc-20240101', NULL),
        (7, 'ocean', 'ocean_month.nc', NULL),
        (8, 'ocean', 'ocean_daily.nc', NULL),
        (9, 'ocean', 'ocean_snapshot.nc', 3600),
        (10, 'ice', 'iceh_m.2024-01.nc', NULL),
        (11, 'ice', 'iceh_d.2024-01-01.nc', NULL),
        (12, 'ice', 'iceh.2024.nc', 86400),
        (13, 'land', 'land_veg_2024.nc', 2592000),
        (14, 'ocean', 'ocean_grid.nc', NULL)),
      n AS (
        SELECT *, replace(string_split(fname, '_')[-1], '.nc', '') AS tok
        FROM f),
      fn AS (
        SELECT file_id, realm, fname, delta_s,
          CASE WHEN realm = 'atmos' THEN
                 CASE tok WHEN 'dai' THEN 'day' WHEN '3h' THEN '3hr'
                      WHEN '6h' THEN '6hr'
                      ELSE replace(tok, 'hPt', 'hrPt') END
               WHEN realm = 'ocean' THEN
                 CASE WHEN contains(fname, 'scalar')
                        OR contains(fname, 'month') THEN 'mon'
                      WHEN contains(fname, 'daily') THEN 'day'
                      ELSE 'NA' END
               WHEN realm = 'ice' THEN
                 CASE WHEN contains(fname, '_m.') THEN 'mon'
                      WHEN contains(fname, '_d.') THEN 'day'
                      ELSE 'NA' END
               ELSE 'NA' END AS fname_freq
        FROM n)
      SELECT file_id, realm, fname, fname_freq,
        COALESCE(NULLIF(fname_freq, 'NA'),
          CASE WHEN delta_s IS NULL THEN NULL
               WHEN delta_s <= 90 THEN '1min'
               WHEN delta_s <= 5400 THEN '1hr'
               WHEN delta_s <= 129600 THEN 'day' ELSE 'mon' END,
          'NA') AS freq
      FROM fn ORDER BY file_id"""))

  /** Template-section classification (mopdb_utils.py parse_vars
    * 629-674 + add_var): the relaxation ladder that routes every
    * scanned variable into write_map_template's blocks — matched /
    * no_ver ("different model version") / no_frq ("different
    * frequency") / no_match — with add_var's enrichment (cmor_var
    * assignment, positive copy, units fill). The fixture covers every
    * rung: an exact hit, a no_ver hit with a model-name tie-break, a
    * no_frq hit, a name-only miss (freq AND version wrong → no_match,
    * per the reference's tuple slices), a calculation-row exclusion,
    * and a fully unknown variable. */
  private val q108 = Q(
    "q108_template_sections",
    (s, dir) => {
      import s.implicits._
      val scanned = Seq(
        ("fld_s03i236", "", "K", "mon"),
        ("fld_s03i236", "", "K", "day"),
        ("fld_s00i024", "myts", "", "day"),
        ("fld_s05i216", "", "", "yr"),
        ("calc_var", "", "", "mon"),
        ("fld_s99i999", "", "", "mon"),
        ("unknown_var", "", "kg", "day"))
        .toDF("varName", "cmorVar", "units", "frequency")
      val mappings = Seq(
        ("tas", "fld_s03i236", "", "K", "mon", "CM2", ""),
        ("tas", "fld_s03i236", "", "K", "mon", "ESM1.5", ""),
        ("tas2", "fld_s03i236", "", "K", "day", "AUS2200", ""),
        ("tas3", "fld_s03i236", "", "K", "day", "ESM1.5", ""),
        ("ts", "fld_s00i024", "", "K", "day", "CM2", "down"),
        ("pr", "fld_s05i216", "", "kg m-2 s-1", "mon", "CM2", ""),
        ("prc", "calc_var", "plev(var)", "kg m-2 s-1", "mon", "CM2", ""),
        ("huss", "fld_s99i999", "", "1", "3hr", "OTHER", ""))
        .toDF("cmorVar", "inputVars", "calculation", "units",
          "frequency", "model", "positive")
      graft.catalog.Catalog.templateSections(scanned, mappings, "CM2")
        .orderBy($"varName", $"frequency")
    },
    Some("""
      WITH sc(var_name, cmor_in, units_in, frequency) AS (VALUES
        ('fld_s03i236', '', 'K', 'mon'),
        ('fld_s03i236', '', 'K', 'day'),
        ('fld_s00i024', 'myts', '', 'day'),
        ('fld_s05i216', '', '', 'yr'),
        ('calc_var', '', '', 'mon'),
        ('fld_s99i999', '', '', 'mon'),
        ('unknown_var', '', 'kg', 'day')),
      mp(m_cmor, input_vars, calculation, m_units, m_freq, m_model, m_pos)
      AS (VALUES
        ('tas', 'fld_s03i236', '', 'K', 'mon', 'CM2', ''),
        ('tas', 'fld_s03i236', '', 'K', 'mon', 'ESM1.5', ''),
        ('tas2', 'fld_s03i236', '', 'K', 'day', 'AUS2200', ''),
        ('tas3', 'fld_s03i236', '', 'K', 'day', 'ESM1.5', ''),
        ('ts', 'fld_s00i024', '', 'K', 'day', 'CM2', 'down'),
        ('pr', 'fld_s05i216', '', 'kg m-2 s-1', 'mon', 'CM2', ''),
        ('prc', 'calc_var', 'plev(var)', 'kg m-2 s-1', 'mon', 'CM2', ''),
        ('huss', 'fld_s99i999', '', '1', '3hr', 'OTHER', '')),
      cand AS (
        SELECT s.*, m.input_vars, m.m_freq, m.m_model, m.m_cmor,
          m.m_pos, m.m_units,
          CASE WHEN m.input_vars IS NULL THEN 3
               WHEN s.frequency = m.m_freq AND m.m_model = 'CM2' THEN 0
               WHEN s.frequency = m.m_freq THEN 1
               WHEN m.m_model = 'CM2' THEN 2
               ELSE 3 END AS lvl
        FROM sc s
        LEFT JOIN (SELECT * FROM mp WHERE calculation = '') m
          ON s.var_name = m.input_vars),
      best AS (
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY var_name, frequency
            ORDER BY lvl, m_model ASC NULLS LAST, m_freq ASC NULLS LAST,
                     m_cmor ASC NULLS LAST) AS rn
          FROM cand) WHERE rn = 1)
      SELECT var_name AS varName, frequency,
        CASE lvl WHEN 0 THEN 'matched' WHEN 1 THEN 'no_ver'
                 WHEN 2 THEN 'no_frq' ELSE 'no_match' END AS section,
        COALESCE(NULLIF(cmor_in, ''),
          CASE WHEN lvl < 3 THEN m_cmor END, var_name) AS cmor_var,
        CASE WHEN lvl < 3 THEN m_pos END AS positive,
        COALESCE(NULLIF(units_in, ''),
          CASE WHEN lvl < 3 THEN m_units END) AS units
      FROM best ORDER BY varName, frequency"""))

  /** CMOR-name lookup (mopdb_utils.py get_cmorname 262-304): the
    * varlist-scan rule that names each scanned variable's CMOR
    * variable/table from the mapping catalog — singleton wins
    * outright, else version+frequency → frequency → version → first
    * (deterministically ordered here). The fixture covers every rung
    * plus the singleton-regardless-of-keys and unmatched cases. */
  private val q111 = Q(
    "q111_cmor_name",
    (s, dir) => {
      import s.implicits._
      val scanned = Seq(
        ("solo", "mon"),    // singleton candidate, keys don't match → still wins
        ("multi", "mon"),   // exact version+frequency rung
        ("multi", "day"),   // frequency-only rung
        ("multi", "yr"),    // version-only rung (ties break on cmor_var)
        ("multi2", "mon"),  // several candidates, none matches → first by (cmor_var, table)
        ("ghost", "mon"))   // no candidate → empty strings
        .toDF("varName", "frequency")
      val mappings = Seq(
        ("zos", "solo", null, "SImon", "6hr", "OTHER"),
        ("tas", "multi", "", "Amon", "mon", "CM2"),
        ("tasd", "multi", "", "Aday", "day", "ESM1.5"),
        ("tasy", "multi", "", "Ayr", "10yr", "CM2"),
        ("calc", "multi", "x+y", "Acalc", "3hr", "CM2"),
        ("bbb", "multi2", "", "B1", "6hr", "OTHER"),
        ("aab", "multi2", "", "B2", "10min", "XYZ"))
        .toDF("cmorVar", "inputVars", "calculation", "cmorTable",
          "frequency", "model")
      graft.catalog.Catalog.cmorName(scanned, mappings, "CM2")
        .orderBy($"varName", $"frequency")
    },
    Some("""
      WITH sc(var_name, frequency) AS (VALUES
        ('solo', 'mon'), ('multi', 'mon'), ('multi', 'day'),
        ('multi', 'yr'), ('multi2', 'mon'), ('ghost', 'mon')),
      mp(m_cmor, input_vars, calculation, m_table, m_freq, m_model) AS (VALUES
        ('zos', 'solo', CAST(NULL AS VARCHAR), 'SImon', '6hr', 'OTHER'),
        ('tas', 'multi', '', 'Amon', 'mon', 'CM2'),
        ('tasd', 'multi', '', 'Aday', 'day', 'ESM1.5'),
        ('tasy', 'multi', '', 'Ayr', '10yr', 'CM2'),
        ('calc', 'multi', 'x+y', 'Acalc', '3hr', 'CM2'),
        ('bbb', 'multi2', '', 'B1', '6hr', 'OTHER'),
        ('aab', 'multi2', '', 'B2', '10min', 'XYZ')),
      cand AS (
        SELECT s.var_name, s.frequency, m.m_cmor, m.m_table,
          CASE WHEN m.input_vars IS NULL THEN 4
               WHEN s.frequency = m.m_freq AND m.m_model = 'CM2' THEN 0
               WHEN s.frequency = m.m_freq THEN 1
               WHEN m.m_model = 'CM2' THEN 2
               ELSE 3 END AS lvl
        FROM sc s
        LEFT JOIN (SELECT * FROM mp
                   WHERE calculation IS NULL OR calculation = '') m
          ON s.var_name = m.input_vars)
      SELECT var_name AS varName, frequency,
        COALESCE(m_cmor, '') AS cmor_var,
        COALESCE(m_table, '') AS cmor_table
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY var_name, frequency
          ORDER BY lvl, m_cmor ASC NULLS LAST, m_table ASC NULLS LAST) AS rn
        FROM cand) WHERE rn = 1
      ORDER BY varName, frequency"""))

  /** Timeshot definition + nsteps re-scaling (setup_utils.py
    * define_timeshot 53-79 and adjust_nsteps 81-101): the two
    * setup-phase rules that fix a task's time statistic and its size
    * estimate when the plan inserts a resample. The fixture covers
    * the cell_methods token, the Pt and monC frequency fixes, the
    * resample overrides (mean/point/''→mean, maximum→max), and the
    * fractional steps-per-day rungs. */
  private val q113 = Q(
    "q113_timeshot_nsteps",
    (s, dir) => {
      import s.implicits._
      val tasks = Seq(
        (1, "mon", "area: time: mean", "", 100L, "day"),
        (2, "1hrPt", "area: time: point", "", 48L, "day"),
        (3, "monC", "time: mean within years", "", 12L, "mon"),
        (4, "day", "time: maximum", "mon", 365L, "mon"),
        (5, "day", "", "mon", 30L, "mon"),
        (6, "6hr", "time: minimum", "day", 400L, "day"),
        (7, "3hr", "time: sum", "", 8L, "3hr"))
        .toDF("case_id", "frequency", "cell_methods", "resample",
          "nsteps", "new_frq")
      val (ts, freq) = graft.catalog.Axes.defineTimeshot(
        $"frequency", $"cell_methods", $"resample")
      tasks.select($"case_id", ts.as("timeshot"), freq.as("freq"),
          graft.catalog.Catalog.adjustNsteps($"nsteps", $"frequency",
            $"new_frq").as("new_nsteps"))
        .orderBy($"case_id")
    },
    Some("""
      WITH t(case_id, frequency, cell_methods, resample, nsteps, new_frq)
      AS (VALUES
        (1, 'mon', 'area: time: mean', '', 100, 'day'),
        (2, '1hrPt', 'area: time: point', '', 48, 'day'),
        (3, 'monC', 'time: mean within years', '', 12, 'mon'),
        (4, 'day', 'time: maximum', 'mon', 365, 'mon'),
        (5, 'day', '', 'mon', 30, 'mon'),
        (6, '6hr', 'time: minimum', 'day', 400, 'day'),
        (7, '3hr', 'time: sum', '', 8, '3hr')),
      b AS (
        SELECT *,
          CASE WHEN contains(frequency, 'Pt') THEN 'point'
               WHEN frequency = 'monC' THEN 'clim'
               ELSE COALESCE(regexp_extract(cell_methods,
                      'time: (\S+)', 1), '') END AS base
        FROM t),
      sd(f, spd) AS (VALUES
        ('10min', 144.0e0), ('30min', 48.0e0), ('1hr', 24.0e0),
        ('3hr', 8.0e0), ('6hr', 4.0e0), ('day', 1.0e0), ('10day', 0.1e0),
        ('mon', 1.0e0 / 30), ('yr', 1.0e0 / 365), ('dec', 1.0e0 / 3652))
      SELECT case_id,
        CASE WHEN resample <> '' THEN
               CASE WHEN base IN ('mean', 'point', '') THEN 'mean'
                    WHEN base IN ('maximum', 'minimum')
                      THEN substr(base, 1, 3)
                    ELSE base END
             ELSE base END AS timeshot,
        CASE WHEN contains(frequency, 'Pt')
               THEN substr(frequency, 1, length(frequency) - 2)
             WHEN frequency = 'monC' THEN 'mon'
             ELSE frequency END AS freq,
        CAST(nsteps AS DOUBLE) / so.spd * sn.spd AS new_nsteps
      FROM b
      LEFT JOIN sd so ON so.f = replace(b.frequency, 'Pt', '')
      LEFT JOIN sd sn ON sn.f = b.new_frq
      ORDER BY case_id"""))

  /** The math.isclose(rel_tol=0.05) interval ladder of build_umfrq as
    * a first-match-wins SQL CASE, for the q120 oracle. */
  private def umLadderSql(c: String): String =
    Seq("dec" -> "3652.0e0", "yr" -> "365.0e0", "mon" -> "30.0e0",
      "day" -> "1.0e0", "6hr" -> "0.25e0", "3hr" -> "0.125e0",
      "1hr" -> "0.041667e0", "10min" -> "0.006944e0")
      .map { case (k, v) =>
        s"WHEN abs($c - $v) <= 0.05e0 * greatest(abs($c), $v) THEN '$k'"
      }.mkString("CASE ", " ", " ELSE NULL END")

  /** Per-variable frequency on multi-time-axis UM files (build_umfrq,
    * mopdb_utils.py:401-428 ⋈ write_varlist:509-561): an atmosphere
    * file carrying time axes of different lengths gives each variable
    * the frequency of its OWN leading time axis — first-step delta on
    * the isclose ladder, single-step axes falling back to the file
    * span, non-time-led variables to 'NA' — while single-frequency
    * files keep q103's filename answer for every variable. Covers all
    * the rungs: per-axis inheritance, span fallback, the 'file'
    * sentinel, the NA cases, and the non-atmos passthrough. */
  private val q120 = Q(
    "q120_um_var_frequency",
    (s, dir) => {
      import s.implicits._
      val files = Seq(
        (1, "atmos", "umnsa_pa_2024_3h.nc"),
        (2, "atmos", "umnsa_pa_2024_6h.nc"),
        (3, "ocean", "ocean_daily.nc"),
        (4, "atmos", "umnsa_pa_2024_1hPt.nc"))
        .toDF("file_id", "realm", "fname")
      val axes = Seq(
        (1, "time", 240, Some(0.125), Some(29.875)),
        (1, "time_0", 720, Some(0.041667), Some(29.958)),
        (1, "time_1", 1, None: Option[Double], None: Option[Double]),
        (2, "time", 8, Some(0.25), Some(1.75)),
        (2, "time_0", 8, Some(0.25), Some(1.75)),
        (3, "time", 30, Some(1.0), Some(29.0)),
        (4, "time", 10, Some(100.0), Some(900.0)),
        (4, "time_3", 1, None: Option[Double], None: Option[Double]))
        .toDF("file_id", "axis", "n_steps", "delta_days", "span_days")
      val vars = Seq(
        (1, "xa", "time"), (1, "xb", "time_0"), (1, "xc", "time_1"),
        (1, "xd", "lat"),
        (2, "ya", "time"), (2, "yb", "time_0"),
        (3, "za", "time"),
        (4, "wa", "time"), (4, "wb", "time_3"))
        .toDF("file_id", "var_name", "dim0")
      graft.catalog.Catalog.umVarFrequencies(files, axes, vars)
        .orderBy($"file_id", $"var_name")
    },
    Some(s"""
      WITH fl(file_id, realm, fname) AS (VALUES
        (1, 'atmos', 'umnsa_pa_2024_3h.nc'),
        (2, 'atmos', 'umnsa_pa_2024_6h.nc'),
        (3, 'ocean', 'ocean_daily.nc'),
        (4, 'atmos', 'umnsa_pa_2024_1hPt.nc')),
      ax(file_id, axis, n_steps, delta_days, span_days) AS (VALUES
        (1, 'time', 240, 0.125e0, 29.875e0),
        (1, 'time_0', 720, 0.041667e0, 29.958e0),
        (1, 'time_1', 1, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)),
        (2, 'time', 8, 0.25e0, 1.75e0),
        (2, 'time_0', 8, 0.25e0, 1.75e0),
        (3, 'time', 30, 1.0e0, 29.0e0),
        (4, 'time', 10, 100.0e0, 900.0e0),
        (4, 'time_3', 1, NULL, NULL)),
      vr(file_id, var_name, dim0) AS (VALUES
        (1, 'xa', 'time'), (1, 'xb', 'time_0'), (1, 'xc', 'time_1'),
        (1, 'xd', 'lat'),
        (2, 'ya', 'time'), (2, 'yb', 'time_0'),
        (3, 'za', 'time'),
        (4, 'wa', 'time'), (4, 'wb', 'time_3')),
      tax AS (SELECT * FROM ax WHERE contains(axis, 'time')),
      pf AS (
        SELECT file_id, COUNT(DISTINCT n_steps) > 1 AS multi,
          MAX(CASE WHEN n_steps > 1 THEN span_days END) AS fspan
        FROM tax GROUP BY file_id),
      af AS (
        SELECT t.file_id, t.axis AS dim0,
          CASE WHEN t.n_steps > 1 THEN ${umLadderSql("t.delta_days")}
               ELSE COALESCE(${umLadderSql("pf.fspan")}, 'file')
          END AS axis_freq
        FROM tax t JOIN pf USING (file_id)),
      fn AS (
        SELECT file_id, realm,
          CASE WHEN realm = 'atmos' THEN
                 CASE tok WHEN 'dai' THEN 'day' WHEN '3h' THEN '3hr'
                      WHEN '6h' THEN '6hr'
                      ELSE replace(tok, 'hPt', 'hrPt') END
               WHEN realm = 'ocean' THEN
                 CASE WHEN contains(fname, 'scalar')
                        OR contains(fname, 'month') THEN 'mon'
                      WHEN contains(fname, 'daily') THEN 'day'
                      ELSE 'NA' END
               ELSE 'NA' END AS fname_freq
        FROM (SELECT *,
                replace(string_split(fname, '_')[-1], '.nc', '') AS tok
              FROM fl))
      SELECT v.file_id, v.var_name,
        CASE WHEN fn.realm <> 'atmos' OR NOT COALESCE(pf.multi, false)
               THEN fn.fname_freq
             WHEN contains(v.dim0, 'time') AND af.axis_freq IS NOT NULL
               THEN af.axis_freq
             ELSE 'NA' END AS freq
      FROM vr v
      JOIN fn USING (file_id)
      LEFT JOIN pf USING (file_id)
      LEFT JOIN af ON af.file_id = v.file_id AND af.dim0 = v.dim0
      ORDER BY v.file_id, v.var_name"""))

  def queries: Seq[Q] =
    Seq(q39, q40, q41, q102, q103, q108, q111, q113, q120)
}
