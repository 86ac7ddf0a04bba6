package graft.queries

import graft.Tables
import graft.sources.Discovery
import graft.ops.Exact._
import org.apache.spark.sql.functions._

/** Discovery + remaining scalar families (SURVEY.md §2.1/§2.7):
  * schema-discovery scan, the transcendental unit conversions (rounded
  * identically on both engines), and composite scalar fields.
  */
object DiscoveryQueries extends QueryGroup {

  /** Schema-discovery scan over `documents` (mopdb varlist,
    * mopdb_utils.py:490-571): one row per variable with type and
    * occupancy. */
  private val q58 = Q(
    "q58_varlist_discovery",
    (s, dir) => {
      import s.implicits._
      Discovery.varlist(Tables(s, dir, "documents")).orderBy($"var_name")
    },
    Some("""
      WITH cols AS (
        SELECT column_name AS var_name,
          CASE WHEN column_type LIKE 'TIMESTAMP%' THEN 'TIMESTAMP'
               ELSE column_type END AS dtype
        FROM (DESCRIBE SELECT * FROM documents)),
      stats AS (
        SELECT 'doc_id' AS var_name, COUNT(*) AS n_rows, COUNT(doc_id) AS n_valid FROM documents
        UNION ALL SELECT 'text', COUNT(*), COUNT(text) FROM documents
        UNION ALL SELECT 'lang', COUNT(*), COUNT(lang) FROM documents
        UNION ALL SELECT 'source', COUNT(*), COUNT(source) FROM documents
        UNION ALL SELECT 'n_chars', COUNT(*), COUNT(n_chars) FROM documents)
      SELECT var_name, dtype, n_rows, n_valid
      FROM cols JOIN stats USING (var_name)
      ORDER BY var_name"""))

  /** Transcendental scalar family (sisnconc calculations.py:740-753,
    * sw_press app_functions.py:716-733): exp/sin differ in the last ulp
    * between libm implementations, so results are rounded to 6 decimals
    * on both engines — the documented contract for this family. */
  private val q59 = Q(
    "q59_scalar_transcendental",
    (s, dir) => {
      import s.implicits._
      val lat = (lit(-85.5) + ($"l_suppkey" % 20).cast("int") * lit(9.0)) * lit(math.Pi / 180.0)
      Tables(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          round(lit(1.0) - exp($"l_quantity" / 50.0 * lit(-0.2) * lit(330.0) * lit(0.01)), 6)
            .as("sisnconc"),
          round(($"l_linenumber" * lit(100.0)) *
            (lit(1.0) - lit(0.00263) * sin(lat) * sin(lat)), 6).as("press"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        ROUND(1.0e0 - EXP(l_quantity / 50.0e0 * -0.2e0 * 330.0e0 * 0.01e0), 6)
          AS sisnconc,
        ROUND((CAST(l_linenumber AS DOUBLE) * 100.0e0) *
          (1.0e0 - 0.00263e0 *
            SIN((-85.5e0 + CAST(l_suppkey % 20 AS INT) * 9.0e0) * (PI() / 180.0e0)) *
            SIN((-85.5e0 + CAST(l_suppkey % 20 AS INT) * 9.0e0) * (PI() / 180.0e0))), 6)
          AS press
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** Composite scalar fields (tslsi app_functions.py:354-378; optical
    * depth calculations.py:760-781; data-dependent K² branch
    * app_functions.py:441-446): land/sea-ice blended temperature, a
    * pseudo-level band sum, and a units branch decided by a global probe
    * aggregate. */
  private val q60 = Q(
    "q60_scalar_composites",
    (s, dir) => {
      import s.implicits._
      val li = Tables(s, dir, "lineitem")
      // probe: if the global mean of v2 >= 10000 the column is K^2-packed
      val probe = li.agg(davg($"l_extendedprice").as("__gmean"))
      val g = li.select(
        year($"l_shipdate").as("yr"),
        $"l_linenumber".cast("int").as("band"),
        ($"l_quantity" / 50.0).as("sic"),
        ($"l_discount" * 10.0).as("landfrac"),
        $"l_quantity".as("ts"), $"l_extendedprice".as("v2"))
      g.crossJoin(broadcast(probe))
        .withColumn("a_lsi", $"landfrac" + (lit(1.0) - $"landfrac") * $"sic")
        .withColumn("tslsi", ($"ts" - $"ts" * (lit(1.0) - $"a_lsi")) / $"a_lsi")
        .withColumn("v2c",
          when($"__gmean" >= 10000.0, sqrt($"v2") - 273.15).otherwise($"v2"))
        .groupBy($"yr")
        .agg(
          dsum(when($"band".between(2, 4), $"tslsi").otherwise(lit(0.0)))
            .as("band_sum"),
          dsum($"v2c").as("converted_sum"))
        .orderBy($"yr")
    },
    Some(s"""
      WITH probe AS (SELECT ${sqlAvg("l_extendedprice")} AS gmean FROM lineitem),
      g AS (
        SELECT CAST(date_part('year', l_shipdate) AS INT) AS yr,
               CAST(l_linenumber AS INT) AS band,
               l_quantity / 50.0e0 AS sic, l_discount * 10.0e0 AS landfrac,
               l_quantity AS ts, l_extendedprice AS v2
        FROM lineitem),
      c AS (
        SELECT yr, band,
          landfrac + (1.0e0 - landfrac) * sic AS a_lsi,
          ts, v2, gmean
        FROM g, probe),
      x AS (
        SELECT yr, band,
          (ts - ts * (1.0e0 - a_lsi)) / a_lsi AS tslsi,
          CASE WHEN gmean >= 10000.0e0 THEN sqrt(v2) - 273.15e0 ELSE v2 END AS v2c
        FROM c)
      SELECT yr,
        ${sqlSum("CASE WHEN band BETWEEN 2 AND 4 THEN tslsi ELSE 0.0 END")} AS band_sum,
        ${sqlSum("v2c")} AS converted_sum
      FROM x GROUP BY yr ORDER BY yr"""))

  def queries: Seq[Q] = Seq(q58, q59, q60)
}
