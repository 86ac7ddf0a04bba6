package graft.catalog

import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The mapping catalog: how raw model variables become standardized
  * output variables.
  *
  * Mirrors the reference's SQLite `mapping` / `cmorvar` tables
  * (mopdb/mopdb_utils.py:90-136) and the resolution logic of
  * `find_matches` / `find_nearest` (mopper/mop_setup.py:37-153) and
  * `parse_vars` / `potential_vars` (mopdb_utils.py:629-741) — re-expressed
  * as DataFrame joins so catalog resolution itself distributes (a 100 TB
  * deployment's catalog of runs × variables is itself a big table).
  */
object Catalog {

  final case class Mapping(
      cmorVar: String, inputVars: String, calculation: String, units: String,
      dimensions: String, frequency: String, realm: String,
      cellMethods: String, positive: String, cmorTable: String, model: String)

  final case class CmorVar(
      name: String, frequency: String, realm: String, units: String,
      cellMethods: String, longName: String, dimensions: String)

  /** Frequency ladder, highest to lowest resolution — the full
    * relaxation order of find_nearest (mop_setup.py:136-139,
    * `resample_order` reversed), including the 12hr/7day/10day rungs
    * the real catalogs can carry. Inserting rungs preserves every
    * relative-distance comparison (rank is strictly monotone along the
    * ladder), so resolve's winners over the original nine rungs are
    * unchanged. */
  val freqLadder: Seq[String] =
    Seq("10min", "30min", "1hr", "3hr", "6hr", "12hr", "day", "7day",
      "10day", "mon", "yr", "10yr")

  /** Ladder position as a literal-map lookup, not a UDF: stays inside
    * whole-stage codegen and keeps the resolve join's predicates
    * optimizer-visible. The `Pt` (instantaneous) and `C` (climatology)
    * modifiers rank at their base frequency — find_nearest strips them
    * from both the request (mop_setup.py:129-134) and the candidate
    * (:141) before walking the ladder; exactness is still judged on
    * the FULL string by [[resolve]], so a `1hrPt` source serving a
    * `1hr` request is a resample, never an exact hit. Unknown
    * frequencies rank last. */
  private def freqRank(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(element_at(typedLit(freqLadder.zipWithIndex.toMap),
        replace(replace(c, lit("Pt"), lit("")), lit("C"), lit(""))),
      lit(Int.MaxValue))

  def mappings(spark: SparkSession, rows: Seq[Mapping]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** Load a mapping table from the reference's CSV layout
    * (mopdb_utils.py:598-626: header row, `;`-free comma CSV). */
  def loadMappingsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Load an APP4-era master mapping CSV (read_map_app4,
    * mopdb_utils.py:573-595 — the layout of the reference's shipped
    * `master_map.csv`, 381 data rows) into the [[Mapping]] column
    * layout: positional columns (cmip_variable, definable,
    * access_variable(s), calculation, units, axes_modifier, positive,
    * ACCESS_ver, realm, notes), of which the mapping table takes
    * cmor_var = col 0, input_vars = col 2, calculation = col 3,
    * units = col 4, realm = col 8, positive = col 6 and
    * model = col 7 with the reference's ESM→ESM1.5 rename;
    * dimensions/frequency/cell_methods/cmor_table have no APP4 column
    * and load as ''. An ACCESS_ver of 'both' expands to one CM2 row
    * and one ESM1.5 row — the reference's documented intent; its loop
    * appends the SAME Python list object twice around the mutation
    * (`newrow[9] = 'ESM1.5'` between two `append(newrow)` calls), so
    * both of its 'both' rows read ESM1.5 by the time anything queries
    * them — an aliasing bug this engine does not reproduce. Comment
    * lines ('#', including the commented header) are skipped, quoted
    * calculation fields may contain commas, and columns past the
    * 10-field layout (unquoted commas inside notes) are ignored,
    * exactly as the reference's `row[:11]` slice does. Distributed
    * scan like any CSV source; the catalog is broadcast-small by
    * contract downstream. */
  def loadApp4MasterMap(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "false").option("comment", "#").csv(path)
    def c(i: Int) = coalesce(col(s"_c$i"), lit(""))
    raw
      .select(c(0).as("cmorVar"), c(2).as("inputVars"),
        c(3).as("calculation"), c(4).as("units"),
        lit("").as("dimensions"), lit("").as("frequency"),
        c(8).as("realm"), lit("").as("cellMethods"), c(6).as("positive"),
        lit("").as("cmorTable"),
        // exact-VALUE rename, not substring: the reference's Python
        // `row[7].replace('ESM','ESM1.5')` would turn an already-
        // migrated 'ESM1.5' into 'ESM1.51.5' (and silently fail every
        // version rung downstream); the ACCESS_ver column is a CV
        // {CM2, ESM, both}, so the value map is the defined behavior
        when(c(7) === "ESM", lit("ESM1.5")).otherwise(c(7)).as("__ver"))
      .withColumn("model",
        explode(when(col("__ver") === "both",
            array(lit("CM2"), lit("ESM1.5")))
          .otherwise(array(col("__ver")))))
      .drop("__ver")
  }

  /** Load a MODERN-layout mapping CSV (read_map, mopdb_utils.py:598-626
    * — the 17-field `;`-delimited layout of the reference's shipped
    * `map_aus2200_v1.csv` / the varlist template writer): header
    * `cmor_var;input_vars;calculation;units;dimensions;frequency;
    * realm;cell_methods;positive;cmor_table;version;vtype;size;nsteps;
    * filename;long_name;standard_name`, `#` comments skipped. The
    * mapping table takes the first 11 fields verbatim (version →
    * `model`, matching the reference's row[:11] slice into the mapping
    * schema) — REAL frequency (`1hrPt`-style) and cmor_table values,
    * the half of the corpus that exercises [[resolve]]'s relaxation
    * ladder on real data. `notes` is standard_name when nonempty else
    * long_name (the reference's row[16]-else-row[15] rule by HEADER
    * position); `origin` is the caller's alias when nonempty else the
    * row's own filename field — the reference's `if alias == ''` sits
    * INSIDE its row loop and reassigns the parameter, so with an empty
    * alias every row after the first inherits the FIRST row's
    * filename; per-row intent implemented here, divergence noted.
    * A handful of shipped rows carry an 18th field (a stray `;` after
    * `version` or a trailing one); the explicit 18-column schema
    * absorbs it without shifting the 11 fields that matter, exactly
    * as the reference's slice does. Distributed CSV scan; catalogs
    * are broadcast-small by contract downstream. */
  def loadMap(spark: SparkSession, path: String,
      alias: String = ""): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType((0 to 17).map(i => StructField(s"_c$i", StringType)))
    val raw = spark.read
      .option("header", "false").option("delimiter", ";")
      .option("comment", "#").schema(schema).csv(path)
      .filter(col("_c0") =!= "cmor_var") // header row
    def c(i: Int) = coalesce(col(s"_c$i"), lit(""))
    raw.select(
      c(0).as("cmorVar"), c(1).as("inputVars"), c(2).as("calculation"),
      c(3).as("units"), c(4).as("dimensions"), c(5).as("frequency"),
      c(6).as("realm"), c(7).as("cellMethods"), c(8).as("positive"),
      c(9).as("cmorTable"), c(10).as("model"),
      coalesce(nullif(c(16), lit("")), c(15)).as("notes"),
      (if (alias.isEmpty) c(14) else lit(alias)).as("origin"))
  }

  /** Resolve requested (cmorVar, frequency) pairs against the mapping
    * catalog with frequency relaxation (mop_setup.py find_matches +
    * find_nearest): prefer an exact-frequency mapping; otherwise take the
    * nearest FINER-resolution source and record the resample step the
    * executor must insert. Relaxation only moves toward finer frequencies
    * (mop_setup.py:136-153) because resample can only downsample — a
    * request whose only sources are coarser is unmatched. Deterministic:
    * rank by ladder distance among finer-or-equal candidates, then
    * (model, frequency, cmorTable) — the trailing keys matter on real
    * catalogs where ONE model carries the same variable at several
    * rungs (e.g. aus2200's `tas` at both `1hr` and `10minPt`): a `1hr`
    * request then sees two distance-0 candidates (`1hr` exact and
    * `1hrPt`) and the frequency key picks the exact string first. */
  def resolve(requests: DataFrame, mappings: DataFrame): DataFrame = {
    val req = requests.select(
      col("cmorVar").as("req_var"), col("frequency").as("req_freq"))
    val cand = req.join(mappings,
      col("req_var") === col("cmorVar") &&
        freqRank(col("frequency")) <= freqRank(col("req_freq")), "left")
    val dist = freqRank(col("req_freq")) - freqRank(col("frequency"))
    val ranked = Relational.topOnePerGroup(
      cand.withColumn("__dist", dist),
      Seq(col("req_var"), col("req_freq")),
      Seq(col("__dist").asc, col("model").asc, col("frequency").asc,
        col("cmorTable").asc))
    ranked
      .withColumn("resample",
        when(col("frequency").isNull, lit(null))
          .when(col("frequency") === col("req_freq"), lit(""))
          .otherwise(col("req_freq")))
      .withColumn("status",
        when(col("cmorVar").isNull, "unmatched")
          .when(col("resample") === "", "exact")
          .otherwise("resampled"))
      .drop("__dist")
  }

  /** Filename-token frequency inference (mopdb_utils.py:431-467,
    * `get_frequency`): the realm-specific substring ladder the varlist
    * scan tries BEFORE falling back to time-axis deltas (q41's half).
    * atmos reads the last `_`-token with `.nc` stripped and normalizes
    * the UM spellings (`dai`→day, `3h`/`6h`→`3hr`/`6hr`,
    * `hPt`→`hrPt`); ocean and ice sniff fixed substrings. Anything
    * undecided is the reference's literal 'NA' sentinel — callers
    * compose the delta fallback behind it ([[frequencyWithFallback]]).
    * Pure per-row CASE logic; map-only at any scale. */
  def filenameFrequency(realm: org.apache.spark.sql.Column,
      fname: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val tok = replace(element_at(split(fname, "_"), -1), lit(".nc"), lit(""))
    val atmos = when(tok === "dai", "day")
      .when(tok === "3h", "3hr")
      .when(tok === "6h", "6hr")
      .otherwise(replace(tok, lit("hPt"), lit("hrPt")))
    when(realm === "atmos", atmos)
      .when(realm === "ocean",
        when(fname.contains("scalar") || fname.contains("month"), "mon")
          .when(fname.contains("daily"), "day")
          .otherwise("NA"))
      .when(realm === "ice",
        when(fname.contains("_m."), "mon")
          .when(fname.contains("_d."), "day")
          .otherwise("NA"))
      .otherwise("NA")
  }

  /** The reference's frequency precedence (write_varlist,
    * mopdb_utils.py:509-561): filename inference first, the time-delta
    * ladder (q41, build_umfrq) only where the filename is mute.
    * `deltaS` is the dominant inter-sample delta in seconds (nullable —
    * grid/static files have no time axis), mapped on the same ladder as
    * q41. */
  def frequencyWithFallback(realm: org.apache.spark.sql.Column,
      fname: org.apache.spark.sql.Column,
      deltaS: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val fromName = filenameFrequency(realm, fname)
    val fromDelta = when(deltaS.isNull, lit(null))
      .when(deltaS <= 90, "1min").when(deltaS <= 5400, "1hr")
      .when(deltaS <= 129600, "day").otherwise("mon")
    coalesce(nullif(fromName, lit("NA")), fromDelta, lit("NA"))
  }

  /** build_umfrq's interval table (mopdb_utils.py:401-408) as an
    * ordered CASE ladder over a day-unit interval, first match wins —
    * the reference iterates the dict in insertion order and breaks.
    * Matching is math.isclose with rel_tol 0.05:
    * |d − v| ≤ 0.05·max(|d|, |v|). NULL where nothing matches. */
  private def umfrqLadder(d: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val table = Seq("dec" -> 3652.0, "yr" -> 365.0, "mon" -> 30.0,
      "day" -> 1.0, "6hr" -> 0.25, "3hr" -> 0.125, "1hr" -> 0.041667,
      "10min" -> 0.006944)
    table.foldRight(lit(null).cast("string")) { case ((k, v), rest) =>
      when(abs(d - v) <= lit(0.05) * greatest(abs(d), lit(v)), k)
        .otherwise(rest)
    }
  }

  /** Per-VARIABLE frequency for multi-time-axis UM files (build_umfrq,
    * mopdb_utils.py:401-428, composed into write_varlist:509-561): one
    * atmosphere file can carry several time axes of different lengths,
    * and each variable then inherits the frequency of ITS OWN leading
    * time axis rather than the file-level answer.
    *
    * Inputs (NetCDF header facts — the documented ingestion contract):
    *  - `files`: (file_id, realm, fname)
    *  - `axes`:  (file_id, axis, n_steps, delta_days, span_days) — one
    *    row per axis; delta = first-step interval, span = last−first,
    *    both in days (nullable for single-step axes)
    *  - `vars`:  (file_id, var_name, dim0) — each variable's leading
    *    dimension
    *
    * Rules, faithful to the reference:
    *  - only 'atmos' files with ≠1 distinct time-axis lengths are
    *    multi-frequency (get_frequency:449-454); everything else takes
    *    [[filenameFrequency]]'s answer for every variable;
    *  - a multi-step axis matches its first-step delta on the
    *    [[umfrqLadder]];
    *  - a single-step axis falls back to the file span; the reference
    *    reads a loop-leaked `interval_file` (whichever multi-step axis
    *    iterated last), which is non-deterministic under dict order —
    *    pinned here to the MAX span across the file's multi-step time
    *    axes; when that too matches nothing, the reference's literal
    *    'file' sentinel survives into the variable row;
    *  - a variable whose leading dim is not a time axis is 'NA'
    *    (write_varlist:553-556), as is one on a multi-step axis the
    *    ladder can't match (the reference would KeyError there).
    *
    * Scale shape: one small groupBy over the axis table (file
    * cardinality), broadcast joins back onto the variable list — the
    * variable table (the 100 TB-side input during a catalog scan)
    * never shuffles. Output: (file_id, var_name, freq). */
  def umVarFrequencies(files: DataFrame, axes: DataFrame,
      vars: DataFrame): DataFrame = {
    val tax = axes.filter(col("axis").contains("time"))
    val perFile = tax.groupBy("file_id").agg(
      (countDistinct(col("n_steps")) > 1).as("__multi"),
      max(when(col("n_steps") > 1, col("span_days"))).as("__fspan"))
    val axFreq = tax.join(perFile, Seq("file_id"))
      .select(col("file_id"), col("axis").as("dim0"),
        when(col("n_steps") > 1, umfrqLadder(col("delta_days")))
          .otherwise(coalesce(umfrqLadder(col("__fspan")), lit("file")))
          .as("__axis_freq"))
    val fn = files.select(col("file_id"), col("realm"),
      filenameFrequency(col("realm"), col("fname")).as("__fname_freq"))
    vars
      .join(broadcast(fn), Seq("file_id"))
      .join(broadcast(perFile.select(col("file_id"), col("__multi"))),
        Seq("file_id"), "left")
      .join(broadcast(axFreq), Seq("file_id", "dim0"), "left")
      .select(col("file_id"), col("var_name"),
        when(col("realm") =!= "atmos" ||
             !coalesce(col("__multi"), lit(false)), col("__fname_freq"))
          .when(col("dim0").contains("time") && col("__axis_freq").isNotNull,
            col("__axis_freq"))
          .otherwise(lit("NA")).as("freq"))
  }

  /** Varlist dedup (mopdb_utils.py remove_duplicate 695-712): drop
    * repeated variable definitions, keeping the FIRST occurrence under
    * `order`. Strict mode keys on (name, cmor_var, units, realm,
    * cell_methods) — the reference's tuple of row positions 0,1,2,5,6;
    * loose mode on (name, cmor_var, units) only. The reference keeps
    * list order; Spark has no implicit row order, so the caller names
    * the ordering column (file position, scan timestamp) and the
    * keep-first choice stays deterministic and distributed (one keyed
    * top-1, no driver pass). */
  def removeDuplicateVars(df: DataFrame, strict: Boolean,
      order: org.apache.spark.sql.Column): DataFrame = {
    val key =
      if (strict)
        Seq(col("varName"), col("cmorVar"), col("units"),
          col("realm"), col("cellMethods"))
      else Seq(col("varName"), col("cmorVar"), col("units"))
    Relational.topOnePerGroup(df, key, Seq(order.asc))
  }

  /** Timesteps per day by frequency (setup_utils.py adjust_nsteps
    * 89-92, verbatim incl. the fractional rungs). */
  private val nstepDayMap: Map[String, Double] = Map(
    "10min" -> 144.0, "30min" -> 48.0, "1hr" -> 24.0, "3hr" -> 8.0,
    "6hr" -> 4.0, "day" -> 1.0, "10day" -> 0.1, "mon" -> 1.0 / 30,
    "yr" -> 1.0 / 365, "dec" -> 1.0 / 3652)

  /** nsteps re-scaling under resample (setup_utils.py adjust_nsteps
    * 81-101): a variable's timestep count at a new frequency is
    * total-days × steps-per-day(new), with total-days = nsteps /
    * steps-per-day(orig) and a `Pt` modifier stripped from the origin
    * frequency first. The FP chain is pinned ((n / a) · b, doubles)
    * so both engines agree bit-for-bit. A frequency outside the rung
    * table yields NULL (the reference raises a KeyError there —
    * totalizing to NULL is this engine's defined behavior). */
  def adjustNsteps(nsteps: org.apache.spark.sql.Column,
      origFreq: org.apache.spark.sql.Column,
      newFreq: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def stepsPerDay(f: org.apache.spark.sql.Column) =
      element_at(typedLit(nstepDayMap), f)
    nsteps.cast("double") /
      stepsPerDay(replace(origFreq, lit("Pt"), lit(""))) *
      stepsPerDay(newFreq)
  }

  /** Catalog consistency check (`mopdb check`, mopdb.py:76-112): mapping
    * rows whose output variable has no CMOR definition — an anti-join of
    * mapping − cmorvar on (variable, table). */
  def check(mappings: DataFrame, cmorVars: DataFrame): DataFrame =
    mappings
      .join(cmorVars, mappings("cmorVar") === cmorVars("name"), "left_anti")
      .select(col("cmorVar"), col("cmorTable"), col("frequency"))
      .distinct()

  /** Template-section classification (mopdb_utils.py:629-674,
    * `parse_vars` + `add_var`): each scanned model variable is matched
    * against the mapping catalog's direct rows (calculation = '') on a
    * relaxation ladder — exact (name, frequency, version) → same name
    * and frequency, any version (`no_ver`: "different model version —
    * use with caution") → same name and version, any frequency
    * (`no_frq`) → no match (a name-only hit with BOTH frequency and
    * version wrong classifies as unmatched, per the reference's tuple
    * slices). The winning match enriches the row as `add_var` does: an
    * empty cmor_var takes the match's, positive is copied, and missing
    * units fill from the match. The sections drive
    * `write_map_template`'s warning blocks (mopdb_utils.py:744-798);
    * the fifth block (derivable variables) is [[derivable]].
    *
    * The reference walks an unordered dict and keeps the first hit; we
    * make the choice deterministic — within a relaxation level ties
    * break on (model, frequency, cmorVar). The mapping catalog is
    * broadcast-small by contract; the scanned varlist is the big side
    * (every run × variable of a 100 TB archive), so classification is
    * a broadcast join + one keyed top-1 window. */
  def templateSections(scanned: DataFrame, mappings: DataFrame,
      version: String): DataFrame = {
    val m = broadcast(mappings
      .filter(col("calculation") === "")
      .select(col("inputVars").as("m_var"), col("frequency").as("m_freq"),
        col("model").as("m_model"), col("cmorVar").as("m_cmor"),
        col("positive").as("m_pos"), col("units").as("m_units")))
    val cand = scanned.join(m, col("varName") === col("m_var"), "left")
    val level = when(col("m_var").isNull, 3)
      .when(col("frequency") === col("m_freq") && col("m_model") === version, 0)
      .when(col("frequency") === col("m_freq"), 1)
      .when(col("m_model") === version, 2)
      .otherwise(3)
    val best = Relational.topOnePerGroup(
      cand.withColumn("__lvl", level),
      Seq(col("varName"), col("frequency")),
      Seq(col("__lvl").asc, col("m_model").asc_nulls_last,
        col("m_freq").asc_nulls_last, col("m_cmor").asc_nulls_last))
    best
      .withColumn("section",
        when(col("__lvl") === 0, "matched")
          .when(col("__lvl") === 1, "no_ver")
          .when(col("__lvl") === 2, "no_frq")
          .otherwise("no_match"))
      .withColumn("cmor_var",
        coalesce(nullif(col("cmorVar"), lit("")),
          when(col("__lvl") < 3, col("m_cmor")), col("varName")))
      .withColumn("positive", when(col("__lvl") < 3, col("m_pos")))
      .withColumn("units_out",
        coalesce(nullif(col("units"), lit("")),
          when(col("__lvl") < 3, col("m_units"))))
      .select(col("varName"), col("frequency"), col("section"),
        col("cmor_var"), col("positive"), col("units_out").as("units"))
  }

  /** CMOR-name lookup (mopdb_utils.py:262-304, `get_cmorname`): given a
    * scanned (varName, frequency), pick the mapping row that names its
    * CMOR variable/table among the direct rows (calculation empty or
    * NULL) for that input variable. The reference's ladder: a singleton
    * candidate wins outright; among several, (version AND frequency) →
    * frequency only → version only → "the first row" (its multi-match
    * fallback — SQL result order there, (cmorVar, cmorTable) order
    * here so the choice is deterministic). Unmatched variables yield
    * empty strings, as the reference does. Differs from
    * [[templateSections]] (parse_vars): that ladder classifies into
    * warning sections and treats a name-only hit as unmatched; this one
    * always resolves to SOME definition when any exists. */
  def cmorName(scanned: DataFrame, mappings: DataFrame,
      version: String): DataFrame = {
    val m = broadcast(mappings
      .filter(col("calculation").isNull || col("calculation") === "")
      .select(col("inputVars").as("m_var"), col("frequency").as("m_freq"),
        col("model").as("m_model"), col("cmorVar").as("m_cmor"),
        col("cmorTable").as("m_table")))
    val cand = scanned.join(m, col("varName") === col("m_var"), "left")
    val level = when(col("m_var").isNull, 4)
      .when(col("frequency") === col("m_freq") && col("m_model") === version, 0)
      .when(col("frequency") === col("m_freq"), 1)
      .when(col("m_model") === version, 2)
      .otherwise(3)
    Relational.topOnePerGroup(
        cand.withColumn("__lvl", level),
        Seq(col("varName"), col("frequency")),
        Seq(col("__lvl").asc, col("m_cmor").asc_nulls_last,
          col("m_table").asc_nulls_last))
      .select(col("varName"), col("frequency"),
        coalesce(col("m_cmor"), lit("")).as("cmor_var"),
        coalesce(col("m_table"), lit("")).as("cmor_table"))
  }

  /** Derivable variables: mapping rows whose every input token is
    * available (mopdb_utils.py potential_vars 715-741) — relational
    * division via explode + count. */
  def derivable(mappings: DataFrame, available: DataFrame): DataFrame = {
    val needed = mappings
      .select(col("cmorVar"), col("inputVars"),
        explode(split(col("inputVars"), "\\s+")).as("tok"))
      .distinct() // same (var, inputs) may appear at several frequencies
    val have = available.select(col("varName").as("tok")).distinct()
    val counts = needed
      .join(have, Seq("tok"), "left_semi")
      .groupBy(col("cmorVar"), col("inputVars"))
      .agg(count(lit(1)).as("n_have"))
    counts
      .withColumn("n_need", size(split(col("inputVars"), "\\s+")))
      .filter(col("n_have") === col("n_need"))
      .select(col("cmorVar"), col("inputVars"))
  }
}
