package graft.queries

import graft.catalog.Axes
import graft.ops.Vertices
import org.apache.spark.sql.functions._

/** CMOR per-file lifecycle operators (SURVEY.md §3.2d): axis
  * classification + CMOR axis naming, vertical-direction inference, and
  * the curvilinear 4-corner vertex derivation. All three are the pure
  * column logic every output file passes through before writing — no
  * shuffle except the vertex window passes.
  */
object CmorQueries extends QueryGroup {

  /** Axis classification + CMOR naming (mop_utils.py get_axis_dim
    * 583-627 + get_cmorname 405-463): a dims catalog in, (axis_class,
    * cmor_name) out. The fixture rows cover every branch: attribute
    * override vs name substrings (including the single-letter 'y'/'x'
    * and 'heigth' quirks mirrored from the reference), the timeshot
    * time flavors, and the whole vertical precedence chain. */
  private val q94 = Q(
    "q94_axis_classify",
    (s, dir) => {
      import s.implicits._
      val dims = Seq(
        (1, "time", null, null, "area: time: mean", "", "tas", "", 0),
        (2, "time_0", "T", null, "area: time: point", "", "tas", "", 0),
        (3, "time", null, null, "time: clim", "", "tas", "", 0),
        (4, "time", null, null, "time: unknown", "", "tas", "", 0),
        (5, "Time", "T", null, "time: maximum", "", "tasmax", "", 0),
        (6, "lat", null, null, "time: mean", "", "tas", "", 0),
        (7, "nj", "Y", null, "time: mean", "", "tos", "gridlat", 0),
        (8, "lon", null, null, "time: mean", "", "tas", "", 0),
        (9, "ni", null, "X", "time: mean", "", "tos", "gridlon", 0),
        (10, "yaxis_1", null, null, "time: mean", "", "uo", "", 0),
        (11, "xaxis_1", null, null, "time: mean", "", "uo", "", 0),
        (12, "hybrid", null, null, "time: mean", "", "ta", "", 0),
        (13, "st_ocean", null, "Z", "time: mean", "", "thetao", "", 0),
        (14, "sw_ocean", "Z", null, "time: mean", "", "wo", "", 0),
        (15, "st_ocean", null, "Z", "time: mean", "", "thetao100", "depth100", 0),
        (16, "potrho", "Z", null, "time: mean", "", "msftyrho", "", 0),
        (17, "theta_level_height", null, null, "time: mean", "", "ta", "", 0),
        (18, "level_number", null, null, "time: mean", "", "ta", "", 0),
        (19, "rho_level_number", null, null, "time: mean", "", "ua", "", 0),
        (20, "lev", null, null, "time: mean", "", "ta", "", 19),
        (21, "model_p_level", null, null, "time: mean", "", "ua", "", 3),
        (22, "pressure", "Z", null, "time: mean", "", "ta", "", 39),
        (23, "lev", null, null, "time: mean", "plevinterp(var[0], plev, 24)", "ua24", "", 19),
        (24, "depth", null, null, "time: mean", "", "tsl", "", 0),
        (25, "soil", "Z", null, "time: mean", "", "mrsos", "topsoil", 0),
        (26, "tile", "pseudo_axis", null, "time: mean", "", "landCoverFrac", "", 0),
        (27, "basin", null, null, "time: mean", "", "htovgyre", "", 0),
        (28, "oline", null, null, "time: mean", "", "mfo", "", 0),
        (29, "siline", null, null, "time: mean", "", "siflux", "", 0),
        (30, "bogus_dim", null, null, "time: mean", "", "x2", "", 0))
        .toDF("case_id", "dim", "axis_attr", "cart_axis", "timeshot",
          "calculation", "variable_id", "axes_modifier", "z_len")
      // get_cmorname receives the CALCULATION string for the plevinterp
      // probe (mop_utils.py:437) — pass it where the fixture set one,
      // else the timeshot drives only the time branch
      val cls = Axes.axisClass($"dim", $"axis_attr", $"cart_axis")
      dims.select($"case_id", $"dim",
          cls.as("axis_class"),
          Axes.cmorName(cls, $"dim", $"timeshot", $"calculation",
            $"variable_id", $"axes_modifier", $"z_len").as("cmor_name"))
        .orderBy($"case_id")
    },
    Some("""
      WITH dims(case_id, dim, axis_attr, cart_axis, timeshot, calculation,
                variable_id, axes_modifier, z_len) AS (VALUES
        (1, 'time', NULL, NULL, 'area: time: mean', '', 'tas', '', 0),
        (2, 'time_0', 'T', NULL, 'area: time: point', '', 'tas', '', 0),
        (3, 'time', NULL, NULL, 'time: clim', '', 'tas', '', 0),
        (4, 'time', NULL, NULL, 'time: unknown', '', 'tas', '', 0),
        (5, 'Time', 'T', NULL, 'time: maximum', '', 'tasmax', '', 0),
        (6, 'lat', NULL, NULL, 'time: mean', '', 'tas', '', 0),
        (7, 'nj', 'Y', NULL, 'time: mean', '', 'tos', 'gridlat', 0),
        (8, 'lon', NULL, NULL, 'time: mean', '', 'tas', '', 0),
        (9, 'ni', NULL, 'X', 'time: mean', '', 'tos', 'gridlon', 0),
        (10, 'yaxis_1', NULL, NULL, 'time: mean', '', 'uo', '', 0),
        (11, 'xaxis_1', NULL, NULL, 'time: mean', '', 'uo', '', 0),
        (12, 'hybrid', NULL, NULL, 'time: mean', '', 'ta', '', 0),
        (13, 'st_ocean', NULL, 'Z', 'time: mean', '', 'thetao', '', 0),
        (14, 'sw_ocean', 'Z', NULL, 'time: mean', '', 'wo', '', 0),
        (15, 'st_ocean', NULL, 'Z', 'time: mean', '', 'thetao100', 'depth100', 0),
        (16, 'potrho', 'Z', NULL, 'time: mean', '', 'msftyrho', '', 0),
        (17, 'theta_level_height', NULL, NULL, 'time: mean', '', 'ta', '', 0),
        (18, 'level_number', NULL, NULL, 'time: mean', '', 'ta', '', 0),
        (19, 'rho_level_number', NULL, NULL, 'time: mean', '', 'ua', '', 0),
        (20, 'lev', NULL, NULL, 'time: mean', '', 'ta', '', 19),
        (21, 'model_p_level', NULL, NULL, 'time: mean', '', 'ua', '', 3),
        (22, 'pressure', 'Z', NULL, 'time: mean', '', 'ta', '', 39),
        (23, 'lev', NULL, NULL, 'time: mean', 'plevinterp(var[0], plev, 24)', 'ua24', '', 19),
        (24, 'depth', NULL, NULL, 'time: mean', '', 'tsl', '', 0),
        (25, 'soil', 'Z', NULL, 'time: mean', '', 'mrsos', 'topsoil', 0),
        (26, 'tile', 'pseudo_axis', NULL, 'time: mean', '', 'landCoverFrac', '', 0),
        (27, 'basin', NULL, NULL, 'time: mean', '', 'htovgyre', '', 0),
        (28, 'oline', NULL, NULL, 'time: mean', '', 'mfo', '', 0),
        (29, 'siline', NULL, NULL, 'time: mean', '', 'siflux', '', 0),
        (30, 'bogus_dim', NULL, NULL, 'time: mean', '', 'x2', '', 0)),
      c AS (
        SELECT *, COALESCE(cart_axis, axis_attr) AS a,
          CASE
            WHEN COALESCE(cart_axis, axis_attr) = 'T' OR contains(dim, 'time')
              THEN 't'
            WHEN COALESCE(cart_axis, axis_attr) = 'Y' OR contains(dim, 'lat')
              OR contains(dim, 'y') OR contains(dim, 'nj') THEN 'y'
            WHEN COALESCE(cart_axis, axis_attr) = 'X' OR contains(dim, 'lon')
              OR contains(dim, 'x') OR contains(dim, 'ni') THEN 'x'
            WHEN COALESCE(cart_axis, axis_attr) = 'Z' OR contains(dim, 'lev')
              OR contains(dim, 'heigth') OR contains(dim, 'depth') THEN 'z'
            WHEN contains(COALESCE(cart_axis, axis_attr), 'pseudo') THEN 'p'
            WHEN dim IN ('basin', 'oline', 'siline') THEN 'e'
          END AS axis_class
        FROM dims)
      SELECT case_id, dim, axis_class,
        CASE axis_class
          WHEN 't' THEN
            CASE WHEN contains(timeshot, 'mean') OR contains(timeshot, 'min')
                   OR contains(timeshot, 'max') OR contains(timeshot, 'sum')
                 THEN 'time'
                 WHEN contains(timeshot, 'point') THEN 'time1'
                 WHEN contains(timeshot, 'clim') THEN 'time2'
                 ELSE 'time' END
          WHEN 'y' THEN
            CASE WHEN contains(axes_modifier, 'gridlat') THEN 'gridlatitude'
                 ELSE 'latitude' END
          WHEN 'x' THEN
            CASE WHEN contains(axes_modifier, 'gridlon') THEN 'gridlongitude'
                 ELSE 'longitude' END
          WHEN 'z' THEN
            CASE
              WHEN contains(calculation, 'plevinterp')
                THEN 'plev' || regexp_extract(variable_id, '([0-9]+)[^0-9]*$', 1)
              WHEN contains(axes_modifier, 'depth100') THEN 'depth100m'
              WHEN dim IN ('st_ocean', 'sw_ocean') THEN 'depth_coord'
              WHEN dim = 'potrho' THEN 'rho'
              WHEN contains(dim, 'theta_level_height')
                OR contains(dim, 'rho_level_height') THEN 'hybrid_height2'
              WHEN dim = 'level_number' THEN 'hybrid_height'
              WHEN contains(dim, 'rho_level_number') THEN 'hybrid_height_half'
              WHEN dim = 'lev' OR contains(dim, '_p_level')
                OR contains(dim, 'pressure')
                THEN 'plev' || CAST(z_len AS VARCHAR)
              WHEN contains(dim, 'soil') OR dim = 'depth' THEN
                CASE WHEN contains(axes_modifier, 'topsoil') THEN 'sdepth1'
                     ELSE 'sdepth' END
            END
          WHEN 'p' THEN dim
          WHEN 'e' THEN dim
        END AS cmor_name
      FROM c ORDER BY case_id"""))

  /** Vertical-direction inference (mop_utils.py:776-786): explicit
    * configured value wins, else CF standard-name keyword sniffing;
    * NULL when neither decides. */
  private val q95 = Q(
    "q95_positive_direction",
    (s, dir) => {
      import s.implicits._
      val vars = Seq(
        (1, "up", "surface_downward_heat_flux"),
        (2, "down", null),
        (3, "", "surface_upwelling_shortwave_flux_in_air"),
        (4, "", "toa_outgoing_longwave_flux"),
        (5, "", "water_flux_out_of_sea_ice"),
        (6, "", "surface_downward_eastward_stress"),
        (7, "", "water_flux_into_sea_water"),
        (8, "", "incoming_water_volume_transport"),
        (9, "", "air_temperature"),
        (10, null, "sea_water_salinity"),
        (11, "both", "tendency_of_heat_content_down"),
        (12, "", null))
        .toDF("case_id", "configured", "standard_name")
      vars.select($"case_id",
          Axes.positiveDir($"configured", $"standard_name").as("positive"))
        .orderBy($"case_id")
    },
    Some("""
      WITH vars(case_id, configured, standard_name) AS (VALUES
        (1, 'up', 'surface_downward_heat_flux'),
        (2, 'down', NULL),
        (3, '', 'surface_upwelling_shortwave_flux_in_air'),
        (4, '', 'toa_outgoing_longwave_flux'),
        (5, '', 'water_flux_out_of_sea_ice'),
        (6, '', 'surface_downward_eastward_stress'),
        (7, '', 'water_flux_into_sea_water'),
        (8, '', 'incoming_water_volume_transport'),
        (9, '', 'air_temperature'),
        (10, NULL, 'sea_water_salinity'),
        (11, 'both', 'tendency_of_heat_content_down'),
        (12, '', NULL))
      SELECT case_id,
        CASE
          WHEN configured IN ('up', 'down') THEN configured
          WHEN contains(lower(COALESCE(standard_name, 'None')), 'up')
            OR contains(lower(COALESCE(standard_name, 'None')), 'outgoing')
            OR contains(lower(COALESCE(standard_name, 'None')), 'out_of')
            THEN 'up'
          WHEN contains(lower(COALESCE(standard_name, 'None')), 'down')
            OR contains(lower(COALESCE(standard_name, 'None')), 'incoming')
            OR contains(lower(COALESCE(standard_name, 'None')), 'into')
            THEN 'down'
        END AS positive
      FROM vars ORDER BY case_id"""))

  /** Curvilinear 4-corner vertices (app_functions.py:564-598 reads them
    * precomputed; here they are DERIVED from the 2-D centers by the
    * two-pass midpoint scheme — the sibling of q64's per-axis bounds)
    * on the same tilted bilinear grid as q64, latitude clamped to ±90. */
  private val q96 = Q(
    "q96_curvilinear_vertices",
    (s, dir) => {
      import s.implicits._
      val cells = s.range(0, 20).select($"id".cast("int").as("j"))
        .crossJoin(s.range(0, 20).select($"id".cast("int").as("i")))
        .withColumn("lat2d", lit(-85.5) + $"j" * lit(9.0) + $"i" * lit(0.1))
        .withColumn("lon2d", $"i" * lit(18.0) + $"j" * lit(0.2))
      Vertices.vertices(cells, "j", "i", Seq("lat2d", "lon2d"),
          clampLat = Some("lat2d"))
        .orderBy($"j", $"i")
    },
    Some("""
      WITH cells AS (
        SELECT j, i,
          -85.5e0 + j * 9.0e0 + i * 0.1e0 AS lat2d,
          i * 18.0e0 + j * 0.2e0 AS lon2d
        FROM (SELECT CAST(unnest(generate_series(0, 19)) AS INT) AS j),
             (SELECT CAST(unnest(generate_series(0, 19)) AS INT) AS i)),
      n1 AS (
        SELECT j, i, lat2d, lon2d,
          LAG(lat2d) OVER wI AS lat_p, LEAD(lat2d) OVER wI AS lat_x,
          LAG(lon2d) OVER wI AS lon_p, LEAD(lon2d) OVER wI AS lon_x
        FROM cells WINDOW wI AS (PARTITION BY j ORDER BY i)),
      half AS (
        SELECT j, i AS i_n,
          CASE WHEN lat_p IS NULL THEN lat2d - (lat_x - lat2d) / 2.0e0
               ELSE (lat_p + lat2d) / 2.0e0 END AS lat,
          CASE WHEN lon_p IS NULL THEN lon2d - (lon_x - lon2d) / 2.0e0
               ELSE (lon_p + lon2d) / 2.0e0 END AS lon
        FROM n1
        UNION ALL
        SELECT j, i + 1 AS i_n,
          lat2d + (lat2d - lat_p) / 2.0e0 AS lat,
          lon2d + (lon2d - lon_p) / 2.0e0 AS lon
        FROM n1 WHERE lat_x IS NULL),
      n2 AS (
        SELECT i_n, j, lat, lon,
          LAG(lat) OVER wJ AS lat_p, LEAD(lat) OVER wJ AS lat_x,
          LAG(lon) OVER wJ AS lon_p, LEAD(lon) OVER wJ AS lon_x
        FROM half WINDOW wJ AS (PARTITION BY i_n ORDER BY j)),
      nodes AS (
        SELECT j AS j_n, i_n,
          CASE WHEN lat_p IS NULL THEN lat - (lat_x - lat) / 2.0e0
               ELSE (lat_p + lat) / 2.0e0 END AS lat,
          CASE WHEN lon_p IS NULL THEN lon - (lon_x - lon) / 2.0e0
               ELSE (lon_p + lon) / 2.0e0 END AS lon
        FROM n2
        UNION ALL
        SELECT j + 1 AS j_n, i_n,
          lat + (lat - lat_p) / 2.0e0 AS lat,
          lon + (lon - lon_p) / 2.0e0 AS lon
        FROM n2 WHERE lat_x IS NULL)
      SELECT c.j, c.i,
        GREATEST(LEAST(sw.lat, 90.0e0), -90.0e0) AS lat2d_sw,
        GREATEST(LEAST(se.lat, 90.0e0), -90.0e0) AS lat2d_se,
        GREATEST(LEAST(ne.lat, 90.0e0), -90.0e0) AS lat2d_ne,
        GREATEST(LEAST(nw.lat, 90.0e0), -90.0e0) AS lat2d_nw,
        sw.lon AS lon2d_sw, se.lon AS lon2d_se,
        ne.lon AS lon2d_ne, nw.lon AS lon2d_nw
      FROM cells c
      JOIN nodes sw ON sw.j_n = c.j AND sw.i_n = c.i
      JOIN nodes se ON se.j_n = c.j AND se.i_n = c.i + 1
      JOIN nodes ne ON ne.j_n = c.j + 1 AND ne.i_n = c.i + 1
      JOIN nodes nw ON nw.j_n = c.j + 1 AND nw.i_n = c.i
      ORDER BY c.j, c.i"""))

  /** End-to-end CMOR per-file lifecycle — the §3.2 chain composed the
    * way the reference's `mop_process` runs it (mopper/mopper.py:175-351):
    * catalog resolve with frequency relaxation (q10/q40's rule) → axis
    * classification + CMOR naming (q94) → coordinate bounds, every axis
    * of every variable in ONE keyed window pass (q14's kernel,
    * latitude clamped ±90) → positive-direction inference (q95) → DRS
    * filename with frequency-precision date stamps (q39). One row per
    * requested variable, proving the pieces compose. */
  private val q105 = Q(
    "q105_cmor_lifecycle",
    (s, dir) => {
      import s.implicits._
      import graft.catalog.Catalog
      import graft.ops.WindowOps
      import org.apache.spark.sql.Column
      val requests = Seq(("tas", "mon"), ("thetao", "mon"), ("hfds", "day"))
        .toDF("cmorVar", "frequency")
      val maps = Catalog.mappings(s, Seq(
        Catalog.Mapping("tas", "fld_s03i236", "", "K",
          "longitude latitude time", "mon", "atmos", "area: time: mean",
          "", "Amon", "SPARK1"),
        Catalog.Mapping("thetao", "temp", "", "K",
          "longitude latitude olevel time", "mon", "ocean",
          "area: time: mean", "", "Omon", "SPARK1"),
        Catalog.Mapping("hfds", "sfc_hflux", "", "W m-2",
          "longitude latitude time", "1hr", "ocean", "area: time: mean",
          "", "Oday", "SPARK1")))
      val resolved = Catalog.resolve(requests, maps)
        .select($"req_var", $"req_freq", $"status", $"resample",
          $"cmorTable", $"cellMethods", $"calculation", $"positive")
      val attrs = Seq(
        ("tas", "air_temperature", "2020-01-16", "2020-12-16"),
        ("thetao", "sea_water_potential_temperature",
          "2020-01-16", "2020-12-16"),
        ("hfds", "surface_downward_heat_flux_in_sea_water",
          "2020-01-01", "2020-12-31"))
        .toDF("req_var", "standard_name", "t0", "t1")
      // '' marks an absent axis attribute (nullif'd before classify);
      // an empty coords array marks a sizeless axis (time)
      val dims = Seq(
        ("tas", 0, "time", "T", "", Seq.empty[Double]),
        ("tas", 1, "lat", "", "", Seq(-75.0, 0.0, 75.0)),
        ("tas", 2, "lon", "", "", Seq(0.0, 120.0, 240.0)),
        ("thetao", 0, "time", "T", "", Seq.empty[Double]),
        ("thetao", 1, "st_ocean", "", "Z", Seq(5.0, 15.0, 40.0)),
        ("thetao", 2, "yt_ocean", "", "", Seq(-60.0, 0.0, 60.0)),
        ("thetao", 3, "xt_ocean", "", "", Seq(40.0, 160.0, 280.0)),
        ("hfds", 0, "time", "T", "", Seq.empty[Double]),
        ("hfds", 1, "yt_ocean", "", "", Seq(-60.0, 0.0, 60.0)),
        ("hfds", 2, "xt_ocean", "", "", Seq(40.0, 160.0, 280.0)))
        .toDF("req_var", "dim_idx", "dim", "axis_attr", "cart_axis", "coords")
      val cls = Axes.axisClass($"dim",
        nullif($"axis_attr", lit("")), nullif($"cart_axis", lit("")))
      val classified = dims.join(broadcast(resolved), Seq("req_var"))
        .select($"req_var", $"dim_idx", $"dim", $"coords",
          cls.as("axis_class"),
          Axes.cmorName(cls, $"dim", $"cellMethods", $"calculation",
            $"req_var", lit(""), size($"coords")).as("cmor_name"))
      val axesStr = classified.groupBy($"req_var")
        .agg(concat_ws(" ", expr(
          """transform(array_sort(collect_list(struct(dim_idx, cmor_name))),
             x -> x.cmor_name)""")).as("axes"))
      val coordRows = classified.filter(size($"coords") > 0)
        .select($"req_var", $"dim", $"axis_class",
          explode($"coords").as("coord"))
      val bounds = WindowOps.midpointBoundsBy(coordRows,
        Seq($"req_var", $"dim", $"axis_class"), "coord")
      val clamp = (c: Column) => greatest(least(c, lit(90.0)), lit(-90.0))
      val ybnd = bounds.filter($"axis_class" === "y")
        .groupBy($"req_var")
        .agg(min(clamp($"bnd_lo")).as("y_lo"), max(clamp($"bnd_hi")).as("y_hi"))
      val stamp = (c: Column) => when($"req_freq" === "mon",
        date_format(c.cast("date"), "yyyyMM"))
        .otherwise(date_format(c.cast("date"), "yyyyMMdd"))
      resolved.join(broadcast(attrs), Seq("req_var"))
        .join(broadcast(axesStr), Seq("req_var"))
        .join(broadcast(ybnd), Seq("req_var"))
        .select($"req_var".as("cmor_var"), $"status", $"resample", $"axes",
          $"y_lo", $"y_hi",
          Axes.positiveDir($"positive", $"standard_name").as("positive_dir"),
          concat($"req_var", lit("_"), $"cmorTable",
            lit("_SPARK1_histor_r1i1p1f1_gn_"),
            stamp($"t0"), lit("-"), stamp($"t1"), lit(".nc")).as("filename"))
        .orderBy($"cmor_var")
    },
    Some("""
      WITH reqs(cmor_var, req_freq) AS (VALUES
        ('tas', 'mon'), ('thetao', 'mon'), ('hfds', 'day')),
      maps(cmor_var, frequency, cell_methods, calculation, positive,
           cmor_table, model) AS (VALUES
        ('tas', 'mon', 'area: time: mean', '', '', 'Amon', 'SPARK1'),
        ('thetao', 'mon', 'area: time: mean', '', '', 'Omon', 'SPARK1'),
        ('hfds', '1hr', 'area: time: mean', '', '', 'Oday', 'SPARK1')),
      attrs(cmor_var, standard_name, t0, t1) AS (VALUES
        ('tas', 'air_temperature', '2020-01-16', '2020-12-16'),
        ('thetao', 'sea_water_potential_temperature',
          '2020-01-16', '2020-12-16'),
        ('hfds', 'surface_downward_heat_flux_in_sea_water',
          '2020-01-01', '2020-12-31')),
      dims(cmor_var, dim_idx, dim, axis_attr, cart_axis, coords) AS (VALUES
        ('tas', 0, 'time', 'T', '', CAST([] AS DOUBLE[])),
        ('tas', 1, 'lat', '', '', [-75.0e0, 0.0e0, 75.0e0]),
        ('tas', 2, 'lon', '', '', [0.0e0, 120.0e0, 240.0e0]),
        ('thetao', 0, 'time', 'T', '', CAST([] AS DOUBLE[])),
        ('thetao', 1, 'st_ocean', '', 'Z', [5.0e0, 15.0e0, 40.0e0]),
        ('thetao', 2, 'yt_ocean', '', '', [-60.0e0, 0.0e0, 60.0e0]),
        ('thetao', 3, 'xt_ocean', '', '', [40.0e0, 160.0e0, 280.0e0]),
        ('hfds', 0, 'time', 'T', '', CAST([] AS DOUBLE[])),
        ('hfds', 1, 'yt_ocean', '', '', [-60.0e0, 0.0e0, 60.0e0]),
        ('hfds', 2, 'xt_ocean', '', '', [40.0e0, 160.0e0, 280.0e0])),
      ladder(freq, rk) AS (VALUES
        ('10min', 0), ('30min', 1), ('1hr', 2), ('3hr', 3), ('6hr', 4),
        ('day', 5), ('mon', 6), ('yr', 7), ('10yr', 8)),
      cand AS (
        SELECT r.cmor_var, r.req_freq, m.frequency, m.cell_methods,
          m.calculation, m.positive, m.cmor_table, m.model,
          lr.rk - lm.rk AS dist
        FROM reqs r
        JOIN ladder lr ON lr.freq = r.req_freq
        JOIN maps m ON m.cmor_var = r.cmor_var
        JOIN ladder lm ON lm.freq = m.frequency AND lm.rk <= lr.rk),
      res AS (
        SELECT cmor_var, req_freq, frequency, cell_methods, calculation,
          positive, cmor_table,
          CASE WHEN frequency = req_freq THEN '' ELSE req_freq END AS resample,
          CASE WHEN frequency = req_freq THEN 'exact'
               ELSE 'resampled' END AS status
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cmor_var, req_freq
                ORDER BY dist, model) AS rn FROM cand)
        WHERE rn = 1),
      cl AS (
        SELECT d.cmor_var, d.dim_idx, d.dim, d.coords, r.cell_methods,
          r.calculation,
          CASE
            WHEN COALESCE(NULLIF(d.cart_axis, ''), NULLIF(d.axis_attr, ''))
              = 'T' OR contains(d.dim, 'time') THEN 't'
            WHEN COALESCE(NULLIF(d.cart_axis, ''), NULLIF(d.axis_attr, ''))
              = 'Y' OR contains(d.dim, 'lat') OR contains(d.dim, 'y')
              OR contains(d.dim, 'nj') THEN 'y'
            WHEN COALESCE(NULLIF(d.cart_axis, ''), NULLIF(d.axis_attr, ''))
              = 'X' OR contains(d.dim, 'lon') OR contains(d.dim, 'x')
              OR contains(d.dim, 'ni') THEN 'x'
            WHEN COALESCE(NULLIF(d.cart_axis, ''), NULLIF(d.axis_attr, ''))
              = 'Z' OR contains(d.dim, 'lev') OR contains(d.dim, 'heigth')
              OR contains(d.dim, 'depth') THEN 'z'
          END AS axis_class
        FROM dims d JOIN res r ON d.cmor_var = r.cmor_var),
      named AS (
        SELECT cmor_var, dim_idx, dim, coords, axis_class,
          CASE axis_class
            WHEN 't' THEN
              CASE WHEN contains(cell_methods, 'mean')
                     OR contains(cell_methods, 'min')
                     OR contains(cell_methods, 'max')
                     OR contains(cell_methods, 'sum') THEN 'time'
                   WHEN contains(cell_methods, 'point') THEN 'time1'
                   WHEN contains(cell_methods, 'clim') THEN 'time2'
                   ELSE 'time' END
            WHEN 'y' THEN 'latitude'
            WHEN 'x' THEN 'longitude'
            WHEN 'z' THEN
              CASE WHEN dim IN ('st_ocean', 'sw_ocean') THEN 'depth_coord'
              END
          END AS cmor_name
        FROM cl),
      axes AS (
        SELECT cmor_var, string_agg(cmor_name, ' ' ORDER BY dim_idx) AS axes
        FROM named GROUP BY cmor_var),
      coords AS (
        SELECT cmor_var, dim, axis_class, unnest(coords) AS coord
        FROM named WHERE len(coords) > 0),
      n1 AS (
        SELECT cmor_var, dim, axis_class, coord,
          LAG(coord) OVER w AS prev, LEAD(coord) OVER w AS nxt
        FROM coords
        WINDOW w AS (PARTITION BY cmor_var, dim, axis_class ORDER BY coord)),
      b AS (
        SELECT cmor_var, dim, axis_class,
          CASE WHEN prev IS NULL THEN coord - (nxt - coord) / 2.0e0
               ELSE (prev + coord) / 2.0e0 END AS bnd_lo,
          CASE WHEN nxt IS NULL THEN coord + (coord - prev) / 2.0e0
               ELSE (coord + nxt) / 2.0e0 END AS bnd_hi
        FROM n1),
      ybnd AS (
        SELECT cmor_var,
          MIN(GREATEST(LEAST(bnd_lo, 90.0e0), -90.0e0)) AS y_lo,
          MAX(GREATEST(LEAST(bnd_hi, 90.0e0), -90.0e0)) AS y_hi
        FROM b WHERE axis_class = 'y' GROUP BY cmor_var)
      SELECT r.cmor_var, r.status, r.resample, x.axes, y.y_lo, y.y_hi,
        CASE
          WHEN r.positive IN ('up', 'down') THEN r.positive
          WHEN contains(lower(COALESCE(a.standard_name, 'None')), 'up')
            OR contains(lower(COALESCE(a.standard_name, 'None')), 'outgoing')
            OR contains(lower(COALESCE(a.standard_name, 'None')), 'out_of')
            THEN 'up'
          WHEN contains(lower(COALESCE(a.standard_name, 'None')), 'down')
            OR contains(lower(COALESCE(a.standard_name, 'None')), 'incoming')
            OR contains(lower(COALESCE(a.standard_name, 'None')), 'into')
            THEN 'down'
        END AS positive_dir,
        r.cmor_var || '_' || r.cmor_table || '_SPARK1_histor_r1i1p1f1_gn_' ||
          CASE WHEN r.req_freq = 'mon'
               THEN strftime(CAST(a.t0 AS DATE), '%Y%m')
               ELSE strftime(CAST(a.t0 AS DATE), '%Y%m%d') END || '-' ||
          CASE WHEN r.req_freq = 'mon'
               THEN strftime(CAST(a.t1 AS DATE), '%Y%m')
               ELSE strftime(CAST(a.t1 AS DATE), '%Y%m%d') END || '.nc'
          AS filename
      FROM res r
      JOIN attrs a ON r.cmor_var = a.cmor_var
      JOIN axes x ON r.cmor_var = x.cmor_var
      JOIN ybnd y ON r.cmor_var = y.cmor_var
      ORDER BY r.cmor_var"""))

  def queries: Seq[Q] = Seq(q94, q95, q96, q105)
}
