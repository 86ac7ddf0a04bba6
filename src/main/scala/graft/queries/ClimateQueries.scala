package graft.queries

import graft.Tables
import graft.ops.{ClimateOps, Eos, WindowOps}
import graft.ops.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Climate-grid operator batch (SURVEY.md §2.4/§2.6/§2.7).
  *
  * The reference's compute path works on dense (time, z, y, x) arrays; here
  * a deterministic long-format grid is derived from `lineitem` identically
  * in Spark and in the DuckDB oracle:
  *   yr  = year(l_shipdate)          — the time axis
  *   lev = l_linenumber (1..7)       — the vertical axis
  *   y   = l_suppkey % 20 (0..19)    — j index; lat = -85.5 + 9·y
  *   x   = l_partkey % 20 (0..19)    — i index
  *   v   = l_quantity                — the variable
  * Cell "area" weight w = 1/(1+(lat/45)²) is pure arithmetic (no trig) so
  * both engines agree bit-exactly.
  */
object ClimateQueries extends QueryGroup {

  // ---- shared grid derivation -------------------------------------------

  private def grid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem").select(
      year($"l_shipdate").as("yr"),
      $"l_linenumber".cast("int").as("lev"),
      ($"l_suppkey" % 20).cast("int").as("y"),
      ($"l_partkey" % 20).cast("int").as("x"),
      $"l_quantity".as("v"))
  }

  private val gridSql = """
    grid AS (
      SELECT CAST(date_part('year', l_shipdate) AS INT) AS yr,
             CAST(l_linenumber AS INT) AS lev,
             CAST(l_suppkey % 20 AS INT) AS y,
             CAST(l_partkey % 20 AS INT) AS x,
             l_quantity AS v
      FROM lineitem)"""

  // SQL literals use e0 notation so ANSI engines type them DOUBLE (a bare
  // `9.0` is DECIMAL in DuckDB, which changes rounding vs Spark doubles).
  private def latCol = lit(-85.5) + col("y") * lit(9.0)
  private val latSql = "(-85.5e0 + y * 9.0e0)"
  private def wCol = {
    val t = latCol / lit(45.0)
    lit(1.0) / (lit(1.0) + t * t)
  }
  private val wSql = s"(1.0e0 / (1.0e0 + ($latSql / 45.0e0) * ($latSql / 45.0e0)))"

  // ---- queries ----------------------------------------------------------

  /** Area-weighted global mean per year (calc_global_ave_ocean,
    * calculations.py:801-825). */
  private val q20 = Q(
    "q20_weighted_global_mean",
    (s, dir) => {
      import s.implicits._
      grid(s, dir)
        .groupBy($"yr")
        // |v·w| ≤ 50·1 — the bounded decimal path keeps buffers long-backed
        .agg(ClimateOps.weightedMeanBounded($"v", wCol).as("wmean"))
        .orderBy($"yr")
    },
    Some(s"""
      WITH $gridSql
      SELECT yr, ${sqlSum(s"v * $wSql")} /
        SUM(CAST(CASE WHEN v IS NOT NULL THEN $wSql END AS DECIMAL(18,6)))
          ::DOUBLE AS wmean
      FROM grid GROUP BY yr ORDER BY yr"""))

  /** Hemispheric weighted sum + extent (HemiSeaIce / extent,
    * calculations.py:568-646): extent counts cell area where the variable
    * is inside the threshold band. */
  private val q21 = Q(
    "q21_hemi_extent",
    (s, dir) => {
      import s.implicits._
      grid(s, dir)
        .groupBy($"yr", ClimateOps.hemisphere(latCol).as("hemi"))
        .agg(
          dsumBounded($"v" * wCol).as("wsum"),
          ClimateOps.extentBounded(wCol, $"v".between(15.0, 40.0)).as("extent"))
        .orderBy($"yr", $"hemi")
    },
    Some(s"""
      WITH $gridSql
      SELECT yr, CASE WHEN $latSql >= 0 THEN 'nh' ELSE 'sh' END AS hemi,
        ${sqlSum(s"v * $wSql")} AS wsum,
        ${sqlSum(s"CASE WHEN v BETWEEN 15.0 AND 40.0 THEN $wSql ELSE 0.0 END")} AS extent
      FROM grid GROUP BY 1, 2 ORDER BY yr, hemi"""))

  /** Depth integral Σ_z v·dz per (yr,y,x) column (ocndepthint,
    * app_functions.py:496-512); dz = 10·lev. */
  private val q22 = Q(
    "q22_depth_integral",
    (s, dir) => {
      import s.implicits._
      ClimateOps.depthIntegral(grid(s, dir), Seq($"yr", $"y", $"x"),
          $"v", $"lev" * lit(10.0), boundDigits = Some(4))
        .orderBy($"yr", $"y", $"x")
    },
    Some(s"""
      WITH $gridSql
      SELECT yr, y, x, ${sqlSum("v * (lev * 10.0)")} AS zint
      FROM grid GROUP BY yr, y, x ORDER BY yr, y, x"""))

  /** Column max over the vertical axis (column_max,
    * app_functions.py:742-744). */
  private val q23 = Q(
    "q23_column_max",
    (s, dir) => {
      import s.implicits._
      grid(s, dir)
        .groupBy($"yr", $"y", $"x")
        .agg(max($"v").as("vmax"), count($"v").as("n"))
        .orderBy($"yr", $"y", $"x")
    },
    Some(s"""
      WITH $gridSql
      SELECT yr, y, x, MAX(v) AS vmax, CAST(COUNT(v) AS BIGINT) AS n
      FROM grid GROUP BY yr, y, x ORDER BY yr, y, x"""))

  /** Tile-weighted average (tileAve, calculations.py:1117-1152): the
    * vertical axis doubles as a pseudo-level (tile) axis; tile fractions
    * are a small ancillary broadcast-joined on (tile,y,x). */
  private val q24 = Q(
    "q24_tile_weighted",
    (s, dir) => {
      import s.implicits._
      val g = grid(s, dir)
      // Ancillary tile-fraction table: frac(tile,y,x) = ((tile*7+y+x)%10)/10
      val tiles = s.range(1, 8).select($"id".cast("int").as("lev"))
        .crossJoin(s.range(0, 20).select($"id".cast("int").as("y")))
        .crossJoin(s.range(0, 20).select($"id".cast("int").as("x")))
        .withColumn("frac", (($"lev" * 7 + $"y" + $"x") % 10).cast("double") / 10.0)
      g.join(broadcast(tiles), Seq("lev", "y", "x"))
        .groupBy($"yr", $"y", $"x")
        .agg(dsumBounded($"v" * $"frac").as("tile_ave"))
        .orderBy($"yr", $"y", $"x")
    },
    Some(s"""
      WITH $gridSql
      SELECT yr, y, x,
        ${sqlSum("v * (CAST((lev * 7 + y + x) % 10 AS DOUBLE) / 10.0)")} AS tile_ave
      FROM grid GROUP BY yr, y, x ORDER BY yr, y, x"""))

  /** Land-use regroup (fracLut, calculations.py:1073-1102): re-bucket the
    * 7 tiles into 3 classes via a broadcast tile→class map, sum within
    * class. */
  private val q25 = Q(
    "q25_landuse_regroup",
    (s, dir) => {
      import s.implicits._
      val classMap = s.createDataFrame(Seq(
        (1, "crop"), (2, "crop"), (3, "forest"), (4, "forest"),
        (5, "forest"), (6, "urban"), (7, "urban")))
        .toDF("lev", "luclass")
      grid(s, dir)
        .join(broadcast(classMap), Seq("lev"))
        .groupBy($"yr", $"luclass")
        .agg(dsumBounded($"v").as("lusum"))
        .orderBy($"yr", $"luclass")
    },
    Some(s"""
      WITH $gridSql
      SELECT yr,
        CASE WHEN lev IN (1,2) THEN 'crop'
             WHEN lev IN (3,4,5) THEN 'forest' ELSE 'urban' END AS luclass,
        ${sqlSum("v")} AS lusum
      FROM grid GROUP BY 1, 2 ORDER BY yr, luclass"""))

  /** Basin-partitioned zonal sum with global replication (hfbasin,
    * app_functions.py:383-413): every cell contributes to its basin AND
    * to 'global' — explode(array(basin,'global')), then zonal (over-x)
    * sum per (yr, y, basin). */
  private val q26 = Q(
    "q26_basin_zonal",
    (s, dir) => {
      import s.implicits._
      val basin = when($"x" < 7, lit("atlantic"))
        .when($"x" < 14, lit("indopacific")).otherwise(lit("southern"))
      ClimateOps.basinReplicate(grid(s, dir), basin)
        .groupBy($"yr", $"y", $"basin_out")
        .agg(dsumBounded($"v").as("zonal_sum"))
        .orderBy($"yr", $"y", $"basin_out")
    },
    Some(s"""
      WITH $gridSql,
      rep AS (
        SELECT yr, y, v,
          unnest([CASE WHEN x < 7 THEN 'atlantic'
                       WHEN x < 14 THEN 'indopacific'
                       ELSE 'southern' END, 'global']) AS basin_out
        FROM grid)
      SELECT yr, y, basin_out, ${sqlSum("v")} AS zonal_sum
      FROM rep GROUP BY yr, y, basin_out ORDER BY yr, y, basin_out"""))

  /** Meridional overturning (app_functions.py:101-205): zonal-sum per
    * (yr, basin, lev), then cumulative sum over lev minus the column
    * total. */
  private val q27 = Q(
    "q27_overturning",
    (s, dir) => {
      import s.implicits._
      val basin = when($"x" < 10, lit("atlantic")).otherwise(lit("indopacific"))
      val zonal = grid(s, dir)
        .groupBy($"yr", basin.as("basin"), $"lev")
        .agg(dsum($"v").as("zsum"))
      ClimateOps.overturning(zonal, Seq($"yr", $"basin"), $"lev", $"zsum")
        .select($"yr", $"basin", $"lev", $"msf")
        .orderBy($"yr", $"basin", $"lev")
    },
    Some(s"""
      WITH $gridSql,
      zonal AS (
        SELECT yr, CASE WHEN x < 10 THEN 'atlantic' ELSE 'indopacific' END AS basin,
               lev, ${sqlSum("v")} AS zsum
        FROM grid GROUP BY 1, 2, 3)
      SELECT yr, basin, lev,
        CAST(SUM(CAST(zsum AS DECIMAL(18,6))) OVER
               (PARTITION BY yr, basin ORDER BY lev
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - SUM(CAST(zsum AS DECIMAL(18,6))) OVER
               (PARTITION BY yr, basin) AS DOUBLE) AS msf
      FROM zonal ORDER BY yr, basin, lev"""))

  /** Seawater in-situ density (rho_from_theta, app_functions.py:683-714;
    * MJWF03 25-term EOS) as a pure codegen'd column expression.
    * θ from v, s from discount, p from lev — deterministic arithmetic. */
  private val q28 = Q(
    "q28_eos_density",
    (s, dir) => {
      import s.implicits._
      val li = Tables(s, dir, "lineitem")
      li.select(
          $"l_orderkey", $"l_linenumber",
          Eos.rho(
            $"l_quantity" / 2.0,
            lit(30.0) + $"l_discount" * 100.0,
            $"l_linenumber" * lit(500.0)).as("rho"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some(s"""
      SELECT l_orderkey, l_linenumber,
        ${Eos.rhoSql("(l_quantity / 2.0)", "(30.0 + l_discount * 100.0)",
                     "(CAST(l_linenumber AS DOUBLE) * 500.0)")} AS rho
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** Metadata-driven unit conversion (tos_degC, calculations.py:968-983:
    * subtract 273.15 only when units say Kelvin). The units flag is data
    * here (returnflag R ≙ Kelvin). */
  private val q29 = Q(
    "q29_unit_convert",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          when($"l_returnflag" === "R", $"l_quantity" - 273.15)
            .otherwise($"l_quantity").as("converted"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        CASE WHEN l_returnflag = 'R' THEN l_quantity - 273.15
             ELSE l_quantity END AS converted
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** Two-pass packing-division fix (fix_packing_division,
    * app_functions.py:735-738): exact zeros become half the global
    * min-positive. Ratio = tax/discount-style division with zeros. */
  private val q30 = Q(
    "q30_fix_packing",
    (s, dir) => {
      import s.implicits._
      val df = Tables(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", ($"l_tax" * $"l_quantity").as("ratio"))
      ClimateOps.fixPackingDivision(df, "ratio")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      WITH d AS (SELECT l_orderkey, l_linenumber, l_tax * l_quantity AS ratio
                 FROM lineitem),
      eps AS (SELECT MIN(CASE WHEN ratio > 0 THEN ratio END) AS minpos FROM d)
      SELECT l_orderkey, l_linenumber,
        CASE WHEN ratio = 0.0 THEN minpos / 2.0 ELSE ratio END AS ratio
      FROM d, eps ORDER BY l_orderkey, l_linenumber"""))

  /** Surface-flux insertion (calcrsdoabsorb, app_functions.py:457-466):
    * flux (a 2-D field per (yr,y,x), derived from the lev=7 slice) added
    * into the lev=1 surface cells only; aggregate per (yr,lev). */
  private val q31 = Q(
    "q31_surface_flux",
    (s, dir) => {
      import s.implicits._
      val g = grid(s, dir)
      val flux = g.filter($"lev" === 7)
        .groupBy($"yr", $"y", $"x").agg(dsum($"v" * 0.1).as("flux"))
      ClimateOps.surfaceFluxInsert(g, flux, Seq("yr", "y", "x"),
          $"lev", 1, $"v", $"flux")
        .groupBy($"yr", $"lev")
        .agg(dsum($"v_out").as("total"))
        .orderBy($"yr", $"lev")
    },
    Some(s"""
      WITH $gridSql,
      flux AS (SELECT yr, y, x, ${sqlSum("v * 0.1e0")} AS flux
               FROM grid WHERE lev = 7 GROUP BY yr, y, x),
      ins AS (SELECT g.yr, g.lev,
                CASE WHEN g.lev = 1 THEN g.v + f.flux ELSE g.v END AS v_out
              FROM grid g JOIN flux f ON g.yr = f.yr AND g.y = f.y AND g.x = f.x)
      SELECT yr, lev, ${sqlSum("v_out")} AS total
      FROM ins GROUP BY yr, lev ORDER BY yr, lev"""))

  /** Top-soil weighted sums (topsoil/topsoil_tsl, calculations.py:649-680):
    * first 3 levels × 0.012987, first 2 levels / 2. */
  private val q32 = Q(
    "q32_topsoil",
    (s, dir) => {
      import s.implicits._
      grid(s, dir)
        .groupBy($"yr")
        .agg(
          dsum(when($"lev" <= 3, $"v" * 0.012987).otherwise(lit(0.0))).as("mrsos"),
          dsum(when($"lev" <= 2, $"v" / 2.0).otherwise(lit(0.0))).as("tsl"))
        .orderBy($"yr")
    },
    Some(s"""
      WITH $gridSql
      SELECT yr,
        ${sqlSum("CASE WHEN lev <= 3 THEN v * 0.012987e0 ELSE 0.0 END")} AS mrsos,
        ${sqlSum("CASE WHEN lev <= 2 THEN v / 2.0 ELSE 0.0 END")} AS tsl
      FROM grid GROUP BY yr ORDER BY yr"""))

  /** Strait/line transports (lineTransports, calculations.py:240-321):
    * named boxes from a broadcast config table, decimal-exact sum per
    * (yr, strait). */
  private val q33 = Q(
    "q33_line_transports",
    (s, dir) => {
      import s.implicits._
      val straits = s.createDataFrame(Seq(
        ("drake", 0, 3, 0, 19), ("bering", 4, 6, 10, 19),
        ("itf", 7, 12, 0, 9), ("agulhas", 13, 19, 5, 15)))
        .toDF("strait", "x0", "x1", "y0", "y1")
      ClimateOps.lineTransports(grid(s, dir), straits, $"yr", $"x", $"y", $"v")
        .orderBy($"yr", $"strait")
    },
    Some(s"""
      WITH $gridSql
      SELECT yr, strait, ${sqlSum("v")} AS transport
      FROM grid
      JOIN (VALUES ('drake', 0, 3, 0, 19), ('bering', 4, 6, 10, 19),
                   ('itf', 7, 12, 0, 9), ('agulhas', 13, 19, 5, 15))
           s(strait, x0, x1, y0, y1)
        ON x >= x0 AND x <= x1 AND y >= y0 AND y <= y1
      GROUP BY yr, strait ORDER BY yr, strait"""))

  /** Global steric-column shape (calc_zostoga, app_functions.py:632-680):
    * per (yr,y,x) column, Σ_z (1 − ρ(θ,s,p)/ρ(4,35,p))·dz, then the
    * area-weighted global mean per yr — a two-stage aggregation over the
    * EOS expression. */
  private val q34 = Q(
    "q34_steric",
    (s, dir) => {
      import s.implicits._
      val p = $"lev" * lit(500.0)
      val dz = $"lev" * lit(10.0)
      val cell = grid(s, dir).withColumn("steric",
        (lit(1.0) - Eos.rho($"v" / 2.0, lit(35.0), p) /
          Eos.rho(lit(4.0), lit(35.0), p)) * dz)
      val cols = cell.groupBy($"yr", $"y", $"x").agg(dsum($"steric").as("zint"))
      cols.groupBy($"yr")
        .agg(ClimateOps.weightedMean($"zint", wCol).as("zostoga"))
        .orderBy($"yr")
    },
    Some(s"""
      WITH $gridSql,
      cell AS (
        SELECT yr, y, x,
          (1.0 - ${Eos.rhoSql("(v / 2.0)", "35.0", "(CAST(lev AS DOUBLE) * 500.0)")} /
                 ${Eos.rhoSql("4.0", "35.0", "(CAST(lev AS DOUBLE) * 500.0)")})
            * (lev * 10.0) AS steric
        FROM grid),
      cols AS (SELECT yr, y, x, ${sqlSum("steric")} AS zint
               FROM cell GROUP BY yr, y, x)
      SELECT yr, ${sqlSum(s"zint * $wSql")} /
        SUM(CAST(CASE WHEN zint IS NOT NULL THEN $wSql END AS DECIMAL(18,6)))
          ::DOUBLE AS zostoga
      FROM cols GROUP BY yr ORDER BY yr"""))

  /** 2-D curvilinear grid bounds (define_grid, mop_utils.py:541-579 +
    * vertex midpoints app_functions.py:564-598): a tilted (curvilinear)
    * lat field keyed by (j, i) index space; cell bounds along each axis
    * are neighbor midpoints with extrapolated, clamped edges — the
    * midpointBounds kernel applied per-axis with the other index as the
    * window partition. The geo coordinates stay a separate table from
    * the values, exactly the (j,i)-key design ARCHITECTURE.md calls out
    * for tripolar ocean grids. */
  private val q35b = Q(
    "q64_curvilinear_bounds",
    (s, dir) => {
      import s.implicits._
      val cells = s.range(0, 20).select($"id".cast("int").as("j"))
        .crossJoin(s.range(0, 20).select($"id".cast("int").as("i")))
        .withColumn("lat2d", lit(-85.5) + $"j" * lit(9.0) + $"i" * lit(0.1))
        .withColumn("lon2d", $"i" * lit(18.0) + $"j" * lit(0.2))
      val wJ = org.apache.spark.sql.expressions.Window.partitionBy($"i").orderBy($"j")
      val wI = org.apache.spark.sql.expressions.Window.partitionBy($"j").orderBy($"i")
      def bounds(c: org.apache.spark.sql.Column,
          w: org.apache.spark.sql.expressions.WindowSpec) = {
        val prev = lag(c, 1).over(w); val next = lead(c, 1).over(w)
        (when(prev.isNull, c - (next - c) / 2.0).otherwise((prev + c) / 2.0),
         when(next.isNull, c + (c - prev) / 2.0).otherwise((c + next) / 2.0))
      }
      val (latS0, latN0) = bounds($"lat2d", wJ)
      val (lonW, lonE) = bounds($"lon2d", wI)
      cells.select($"j", $"i",
          greatest(least(latS0, lit(90.0)), lit(-90.0)).as("lat_s"),
          greatest(least(latN0, lit(90.0)), lit(-90.0)).as("lat_n"),
          lonW.as("lon_w"), lonE.as("lon_e"))
        .orderBy($"j", $"i")
    },
    Some("""
      WITH cells AS (
        SELECT j, i,
          -85.5e0 + j * 9.0e0 + i * 0.1e0 AS lat2d,
          i * 18.0e0 + j * 0.2e0 AS lon2d
        FROM (SELECT CAST(unnest(generate_series(0, 19)) AS INT) AS j),
             (SELECT CAST(unnest(generate_series(0, 19)) AS INT) AS i)),
      b AS (
        SELECT j, i, lat2d, lon2d,
          LAG(lat2d) OVER (PARTITION BY i ORDER BY j) AS lat_p,
          LEAD(lat2d) OVER (PARTITION BY i ORDER BY j) AS lat_x,
          LAG(lon2d) OVER (PARTITION BY j ORDER BY i) AS lon_p,
          LEAD(lon2d) OVER (PARTITION BY j ORDER BY i) AS lon_x
        FROM cells)
      SELECT j, i,
        GREATEST(LEAST(CASE WHEN lat_p IS NULL THEN lat2d - (lat_x - lat2d) / 2.0e0
                            ELSE (lat_p + lat2d) / 2.0e0 END, 90.0e0), -90.0e0) AS lat_s,
        GREATEST(LEAST(CASE WHEN lat_x IS NULL THEN lat2d + (lat2d - lat_p) / 2.0e0
                            ELSE (lat2d + lat_x) / 2.0e0 END, 90.0e0), -90.0e0) AS lat_n,
        CASE WHEN lon_p IS NULL THEN lon2d - (lon_x - lon2d) / 2.0e0
             ELSE (lon_p + lon2d) / 2.0e0 END AS lon_w,
        CASE WHEN lon_x IS NULL THEN lon2d + (lon2d - lon_p) / 2.0e0
             ELSE (lon2d + lon_x) / 2.0e0 END AS lon_e
      FROM b ORDER BY j, i"""))

  /** Monthly anomaly against the monthly climatology per cell: the
    * per-(yr,mon,y,x) mean minus the all-years (mon,y,x) climatological
    * mean (axm_timeshot 'clim' semantics applied per cell, then the
    * standard anomaly subtraction). ONE scan of the fact table: the
    * monthly partials keep their decimal sum + count, and the
    * climatology re-aggregates those partials (decimal addition is
    * associative, so cmean is bit-identical to a direct pass over the
    * raw rows). The climatology side is tiny (12·|y|·|x| rows) and
    * broadcast back. */
  private val q82 = Q(
    "q82_anomaly",
    (s, dir) => {
      import s.implicits._
      val g = Tables(s, dir, "lineitem").select(
        year($"l_shipdate").as("yr"), month($"l_shipdate").as("mon"),
        ($"l_suppkey" % 20).cast("int").as("y"),
        ($"l_partkey" % 20).cast("int").as("x"),
        $"l_quantity".as("v"))
      // v ≤ 50 → DECIMAL(8,6) elements keep the 600k-row partial agg
      // long-backed; the tiny climatology re-agg can stay wide
      val monthly = g.groupBy($"yr", $"mon", $"y", $"x")
        .agg(sum($"v".cast("decimal(8,6)")).cast("decimal(18,6)").as("__s"),
          count($"v").as("__c"))
      val clim = monthly.groupBy($"mon", $"y", $"x")
        .agg((sum($"__s").cast("double") / sum($"__c")).as("cmean"))
      monthly
        .select($"yr", $"mon", $"y", $"x",
          ($"__s".cast("double") / $"__c").as("mmean"))
        .join(broadcast(clim), Seq("mon", "y", "x"))
        .select($"yr", $"mon", $"y", $"x", $"mmean", $"cmean",
          ($"mmean" - $"cmean").as("anomaly"))
        .orderBy($"yr", $"mon", $"y", $"x")
    },
    Some(s"""
      WITH g AS (
        SELECT CAST(date_part('year', l_shipdate) AS INT) AS yr,
               CAST(date_part('month', l_shipdate) AS INT) AS mon,
               CAST(l_suppkey % 20 AS INT) AS y,
               CAST(l_partkey % 20 AS INT) AS x,
               l_quantity AS v
        FROM lineitem),
      m AS (SELECT yr, mon, y, x,
              SUM(CAST(v AS DECIMAL(18,6))) AS s, COUNT(v) AS c
            FROM g GROUP BY yr, mon, y, x),
      c AS (SELECT mon, y, x,
              CAST(SUM(s) AS DOUBLE) / SUM(c) AS cmean
            FROM m GROUP BY mon, y, x)
      SELECT yr, mon, y, x, CAST(s AS DOUBLE) / c AS mmean, cmean,
        CAST(s AS DOUBLE) / c - cmean AS anomaly
      FROM m JOIN c USING (mon, y, x)
      ORDER BY yr, mon, y, x"""))

  /** Per-cell OLS trend of the yearly mean — the trend map
    * (ClimateOps.olsTrend; closed-form sums, one shuffle per agg). */
  private val q83 = Q(
    "q83_trend_map",
    (s, dir) => {
      import s.implicits._
      val yearly = grid(s, dir)
        .groupBy($"y", $"x", $"yr").agg(davgBounded($"v").as("ymean"))
      ClimateOps.olsTrend(yearly, Seq($"y", $"x"), $"yr", $"ymean")
        .orderBy($"y", $"x")
    },
    Some(s"""
      WITH $gridSql,
      yearly AS (
        SELECT y, x, yr, ${sqlAvg("v")} AS ymean
        FROM grid GROUP BY y, x, yr),
      sums AS (
        SELECT y, x,
          CAST(COUNT(ymean) AS DOUBLE) AS n,
          CAST(SUM(CAST(yr AS BIGINT)) AS DOUBLE) AS st,
          CAST(SUM(CAST(yr AS BIGINT) * CAST(yr AS BIGINT)) AS DOUBLE) AS stt,
          ${sqlSum("ymean")} AS sv,
          ${sqlSum("CAST(yr AS DOUBLE) * ymean")} AS stv,
          COUNT(DISTINCT yr) AS nt
        FROM yearly WHERE ymean IS NOT NULL AND yr IS NOT NULL GROUP BY y, x)
      SELECT y, x,
        (n * stv - st * sv) / (n * stt - st * st) AS slope,
        (sv - ((n * stv - st * sv) / (n * stt - st * st)) * st) / n AS icept
      FROM sums WHERE nt >= 2
      ORDER BY y, x"""))

  /** Conservative 2x coarsening regrid: area-weighted mean of each 2x2
    * source block into the target cell — the horizontal-remap analog of
    * the reference's ancillary regridding, kept exact by the decimal
    * weighted mean. Pure map-side re-key + one agg shuffle.
    *
    * Bounded-decimal sums (Exact.dsumBounded): v = l_quantity ≤ 50 and
    * w ≤ 1, so |v·w| < 100 and the agg buffers stay long-backed — the
    * scale tier showed the wide DECIMAL(28,6) buffer's BigDecimal
    * arithmetic dominating this query (4.4 s → 1.5 s at 3×), and the
    * per-group sum bound (10^12) has ~5 orders of headroom at 100 TB
    * group sizes. */
  private val q84 = Q(
    "q84_regrid_coarsen",
    (s, dir) => {
      import s.implicits._
      grid(s, dir)
        .groupBy($"yr", expr("CAST(y / 2 AS INT)").as("yy"),
          expr("CAST(x / 2 AS INT)").as("xx"))
        .agg(ClimateOps.weightedMeanBounded($"v", wCol).as("vmean"),
          dsumBounded(wCol).as("warea"))
        .orderBy($"yr", $"yy", $"xx")
    },
    Some(s"""
      WITH $gridSql
      SELECT yr, CAST(y // 2 AS INT) AS yy, CAST(x // 2 AS INT) AS xx,
        ${sqlSum(s"v * $wSql")} /
          SUM(CAST(CASE WHEN v IS NOT NULL THEN $wSql END AS DECIMAL(18,6)))
            ::DOUBLE AS vmean,
        ${sqlSum(wSql)} AS warea
      FROM grid GROUP BY 1, 2, 3 ORDER BY yr, yy, xx"""))

  /** Cell areas from latitude bounds — `areacella`, one of the
    * functions the reference's catalog CALLS but never defines
    * (master_map.csv rows like `areacella(144)`; SURVEY §0): bounds are
    * the reference's clamped midpoints (WindowOps.midpointBounds), the
    * spherical-zone fraction is Δλ/360 · (sin φ_hi − sin φ_lo)/2, and
    * the absolute area scales by 4πR². sin is libm-dependent in the
    * last ulp, so the fraction is rounded to 10 decimals (the values
    * are O(1e-3); the documented transcendental contract) before the
    * exact scale-up. */
  private val q92 = Q(
    "q92_areacella",
    (s, dir) => {
      import s.implicits._
      val lats = s.range(0, 20)
        .select((lit(-85.5) + $"id".cast("int") * lit(9.0)).as("lat"))
      val b = WindowOps.midpointBounds(lats, "lat",
        clampLo = Some(-90.0), clampHi = Some(90.0))
      b.select($"lat", $"bnd_lo", $"bnd_hi",
          round((sin($"bnd_hi" * lit(math.Pi) / 180.0) -
                 sin($"bnd_lo" * lit(math.Pi) / 180.0)) *
            lit(18.0 / 360.0) / 2.0, 10).as("area_frac"))
        .withColumn("area_m2",
          round($"area_frac" * lit(4.0 * math.Pi * 6371000.0 * 6371000.0), 0))
        .orderBy($"lat")
    },
    Some("""
      WITH lats AS (
        SELECT -85.5e0 + CAST(unnest(generate_series(0, 19)) AS INT) * 9.0e0 AS lat),
      w AS (SELECT lat, LAG(lat) OVER (ORDER BY lat) AS p,
                   LEAD(lat) OVER (ORDER BY lat) AS n FROM lats),
      b AS (SELECT lat,
        LEAST(GREATEST(CASE WHEN p IS NULL THEN lat - (n - lat) / 2.0e0
                            ELSE (p + lat) / 2.0e0 END, -90.0e0), 90.0e0) AS bnd_lo,
        LEAST(GREATEST(CASE WHEN n IS NULL THEN lat + (lat - p) / 2.0e0
                            ELSE (lat + n) / 2.0e0 END, -90.0e0), 90.0e0) AS bnd_hi
        FROM w),
      f AS (SELECT lat, bnd_lo, bnd_hi,
        ROUND((SIN(bnd_hi * PI() / 180.0e0) - SIN(bnd_lo * PI() / 180.0e0)) *
          (18.0e0 / 360.0e0) / 2.0e0, 10) AS area_frac
        FROM b)
      SELECT lat, bnd_lo, bnd_hi, area_frac,
        ROUND(area_frac * (4.0e0 * PI() * 6371000.0e0 * 6371000.0e0), 0) AS area_m2
      FROM f ORDER BY lat"""))

  def queries: Seq[Q] = Seq(q20, q21, q22, q23, q24, q25, q26, q27,
    q28, q29, q30, q31, q32, q33, q34, q35b, q82, q83, q84, q92)
}
