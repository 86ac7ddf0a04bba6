package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Axis classification and CMOR axis naming — the per-file dimension
  * lifecycle of the reference (every output variable's dims pass through
  * this before writing).
  *
  * Semantics from the reference:
  *  - `get_axis_dim` (mopper/mop_utils.py:583-627): classify each dim of
  *    a variable into T/Z/Y/X/pseudo/extra from its `axis` /
  *    `cartesian_axis` attributes and name substrings. The substring
  *    rules are deliberately mirrored verbatim — including the
  *    single-letter 'y'/'x' matches and the 'heigth' spelling — because
  *    they define which model dims land in which CMOR slot.
  *  - `get_cmorname` (mopper/mop_utils.py:405-463): map a classified
  *    axis to its CMOR coordinate name; the Z branch is a precedence
  *    chain over vertical flavors (plev from plevinterp, depth100m,
  *    depth_coord, rho, hybrid heights, plev{n}, sdepth/sdepth1).
  *
  * Everything is pure `CASE` logic on columns — it runs inside
  * whole-stage codegen, so classifying the dim table of a 100 TB
  * catalog is a map-only pass with no shuffle.
  */
object Axes {

  private def containsAny(c: Column, subs: Seq[String]): Column =
    subs.map(c.contains(_)).reduce(_ || _)

  /** Axis class of one dim: 't','z','y','x','p' (pseudo), 'e' (extra),
    * else NULL (unknown). `cartAxis` (MOM's `cartesian_axis`) overrides
    * `axisAttr` when present — mop_utils.py:605-607. */
  def axisClass(dim: Column, axisAttr: Column, cartAxis: Column): Column = {
    val a = coalesce(cartAxis, axisAttr)
    when(a === "T" || dim.contains("time"), "t")
      .when(a === "Y" || containsAny(dim, Seq("lat", "y", "nj")), "y")
      .when(a === "X" || containsAny(dim, Seq("lon", "x", "ni")), "x")
      .when(a === "Z" || containsAny(dim, Seq("lev", "heigth", "depth")), "z")
      .when(a.contains("pseudo"), "p")
      .when(dim.isin("basin", "oline", "siline"), "e")
      .otherwise(lit(null))
  }

  /** CMOR name of the time axis from the mapping's timeshot
    * (mop_utils.py:409-419): statistic → `time`, instantaneous →
    * `time1`, climatology → `time2`, unknown defaults to `time`. */
  def timeCmorName(timeshot: Column): Column =
    when(containsAny(timeshot, Seq("mean", "min", "max", "sum")), "time")
      .when(timeshot.contains("point"), "time1")
      .when(timeshot.contains("clim"), "time2")
      .otherwise("time")

  /** Timeshot + fixed frequency (setup_utils.py define_timeshot
    * 53-79): the token after `time:` in cell_methods is the base
    * timeshot; a `Pt` frequency forces `point` and strips the
    * modifier, `monC` forces `clim` and fixes the frequency to `mon`;
    * when the variable will be resampled, mean/point/empty collapse
    * to `mean` and maximum/minimum become their 3-letter resample
    * methods. Returns (timeshot, fixed frequency). */
  def defineTimeshot(frequency: Column, cellMethods: Column,
      resample: Column): (Column, Column) = {
    val tok = regexp_extract(cellMethods, "time: (\\S+)", 1)
    val base = when(frequency.contains("Pt"), lit("point"))
      .when(frequency === "monC", lit("clim"))
      .otherwise(tok)
    val ts = when(resample =!= "",
        when(base.isin("mean", "point", ""), lit("mean"))
          .when(base.isin("maximum", "minimum"), substring(base, 1, 3))
          .otherwise(base))
      .otherwise(base)
    val freq = when(frequency.contains("Pt"),
        substr(frequency, lit(1), length(frequency) - 2))
      .when(frequency === "monC", lit("mon"))
      .otherwise(frequency)
    (ts, freq)
  }

  /** Last run of digits in a variable id — the plev flavor of a
    * plevinterp-derived variable (mop_utils.py:438-440, e.g. `ua19` or
    * `hus850`). No lookahead (kept RE2-compatible): anchor on the
    * string tail instead. */
  def lastNumber(variableId: Column): Column =
    regexp_extract(variableId, "([0-9]+)[^0-9]*$", 1)

  /** CMOR name of the vertical axis — the precedence chain of
    * mop_utils.py:436-461. `axesModifier` is the mapping's
    * space-separated modifier list; `zLen` the level count for the
    * generic pressure branch. NULL when no flavor matches (the
    * reference leaves cmor_name unbound there). */
  def zCmorName(dim: Column, calculation: Column, variableId: Column,
      axesModifier: Column, zLen: Column): Column =
    when(calculation.contains("plevinterp"),
        concat(lit("plev"), lastNumber(variableId)))
      .when(axesModifier.contains("depth100"), "depth100m")
      .when(dim.isin("st_ocean", "sw_ocean"), "depth_coord")
      .when(dim === "potrho", "rho")
      .when(containsAny(dim, Seq("theta_level_height", "rho_level_height")),
        "hybrid_height2")
      .when(dim === "level_number", "hybrid_height")
      .when(dim.contains("rho_level_number"), "hybrid_height_half")
      .when(dim === "lev" || containsAny(dim, Seq("_p_level", "pressure")),
        concat(lit("plev"), zLen.cast("string")))
      .when(dim.contains("soil") || dim === "depth",
        when(axesModifier.contains("topsoil"), "sdepth1").otherwise("sdepth"))
      .otherwise(lit(null))

  /** CMOR name for any classified axis (mop_utils.py:405-463): the
    * horizontal branches honor the gridlat/gridlon modifiers; pseudo
    * and extra axes keep their own dim name. */
  def cmorName(cls: Column, dim: Column, timeshot: Column,
      calculation: Column, variableId: Column, axesModifier: Column,
      zLen: Column): Column =
    when(cls === "t", timeCmorName(timeshot))
      .when(cls === "y",
        when(axesModifier.contains("gridlat"), "gridlatitude")
          .otherwise("latitude"))
      .when(cls === "x",
        when(axesModifier.contains("gridlon"), "gridlongitude")
          .otherwise("longitude"))
      .when(cls === "z",
        zCmorName(dim, calculation, variableId, axesModifier, zLen))
      .when(cls === "p" || cls === "e", dim)
      .otherwise(lit(null))

  /** Cell-methods inference (mopdb/mopdb_utils.py:470-488,
    * `get_cell_methods`): the varlist-scan rule every mapping row passes
    * through. A missing/empty cell_methods attribute is treated as
    * instantaneous; `area: ` is prefixed whenever no area statistic is
    * present; and when the variable has exactly one time dimension, the
    * attribute either gains a `time: point` default (with the `Pt`
    * frequency modifier) or has its time-dim token normalized to `time`
    * (e.g. `time_0: mean` → `time: mean`).
    *
    * Mirrored verbatim, including two reference quirks: the appended
    * default has no separator (`val += "time: point"`), and all the
    * substring checks are case-sensitive (a dim named `Time` is not a
    * time axis here, exactly as in the reference). Pure per-row CASE
    * logic — map-only at any scale. `dims` is the variable's dimension
    * array. Returns (cell_methods, frqmod). */
  def cellMethods(attr: Column, dims: Column): (Column, Column) = {
    val base = coalesce(attr, lit(""))
    val v = when(base.contains("area"), base)
      .otherwise(concat(lit("area: "), base))
    val timeAxs = filter(dims, d => d.contains("time"))
    val oneTime = size(timeAxs) === 1
    val cm = when(oneTime && !v.contains("time"), concat(v, lit("time: point")))
      .when(oneTime, replace(v, element_at(timeAxs, 1), lit("time")))
      .otherwise(v)
    val frqmod = when(oneTime && !v.contains("time"), "Pt").otherwise("")
    (cm, frqmod)
  }

  /** Vertical-direction inference (mop_utils.py:776-786): an explicit
    * configured `up`/`down` wins; otherwise keyword-sniff the CF
    * standard name. NULL when neither applies (CMOR ignores positive
    * unless the table requires it). */
  def positiveDir(configured: Column, standardName: Column): Column = {
    val s = lower(coalesce(standardName, lit("None")))
    when(configured.isin("up", "down"), configured)
      .when(containsAny(s, Seq("up", "outgoing", "out_of")), "up")
      .when(containsAny(s, Seq("down", "incoming", "into")), "down")
      .otherwise(lit(null))
  }

  /** Coordinates that must carry bounds (mop_utils.py:646-657): filter
    * of the CMOR axis-entry table on `must_have_bounds = 'yes'`. */
  def requireBounds(axisEntries: DataFrame): DataFrame =
    axisEntries
      .filter(col("must_have_bounds") === "yes")
      .select(col("name"))

  /** Validation pass over (coordinate, hasBounds) rows: coordinates the
    * CMOR table requires bounds for but that carry none — empty means
    * the dataset is publishable. */
  def missingBounds(coords: DataFrame, axisEntries: DataFrame): DataFrame =
    coords
      .join(requireBounds(axisEntries), Seq("name"), "left_semi")
      .filter(!col("has_bounds"))
      .select(col("name"))
}
