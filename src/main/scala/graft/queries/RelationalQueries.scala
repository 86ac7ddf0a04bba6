package graft.queries

import graft.Tables
import graft.ops.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: scan/filter/projection pushdown, joins (broadcast,
  * semi, anti), grouped aggregation, rollup/grouping-set replication,
  * relational division, top-1-per-group, tuple dedup — the Spark mappings
  * of SURVEY.md §2.1-2.4 catalog/compute patterns.
  */
object RelationalQueries extends QueryGroup {

  /** Pricing summary — scan + filter pushdown + groupBy agg.
    * Mirrors the reference's per-file "scan → prune → aggregate" pipeline
    * (mop_utils.py load_data/extract_var). */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlSum("l_quantity")} AS sum_qty,
        ${sqlSum("l_extendedprice")} AS sum_base_price,
        ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        ${sqlAvg("l_quantity")} AS avg_qty,
        ${sqlAvg("l_extendedprice")} AS avg_price,
        ${sqlAvg("l_discount")} AS avg_disc,
        CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Projection + predicate pushdown to the parquet scan (SURVEY §2.2). */
  private val q02 = Q(
    "q02_filter_project",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter(
          $"l_shipdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          $"l_shipdate" <  lit("1997-01-01 00:00:00").cast("timestamp") &&
          $"l_discount" >= 0.05 && $"l_quantity" < 25)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_extendedprice", $"l_discount")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount >= 0.05 AND l_quantity < 25
      ORDER BY l_orderkey, l_linenumber"""))

  /** Multi-way join with broadcast dimensions — the "variable ⋈ ancillary
    * grid" pattern (SURVEY §2.3): fact table joined to small dims that
    * Catalyst broadcasts. */
  private val q03 = Q(
    "q03_join_revenue",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      o.filter($"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
               $"o_orderdate" <  lit("1999-01-01 00:00:00").cast("timestamp"))
        .join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(dsum($"o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy($"r_name", $"n_name")
    },
    Some(s"""
      SELECT r_name, n_name,
        ${sqlSum("o_totalprice")} AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""))

  /** Left-semi join (EXISTS) — the dreq filter-join pattern (SURVEY §2.3). */
  private val q04 = Q(
    "q04_semi_join",
    (s, dir) => {
      import s.implicits._
      val big = Tables(s, dir, "lineitem").filter($"l_quantity" >= 45)
      Tables(s, dir, "orders")
        .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey", $"o_totalprice",
          date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      ORDER BY o_orderkey"""))

  /** Left-anti join (NOT EXISTS) — the `mopdb check` anti-join
    * (mapping − cmorvar; SURVEY §3.3). */
  private val q05 = Q(
    "q05_anti_join",
    (s, dir) => {
      import s.implicits._
      val recent = Tables(s, dir, "orders")
        .filter($"o_orderdate" >= lit("2000-01-01 00:00:00").cast("timestamp"))
      Tables(s, dir, "customer")
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      ORDER BY c_custkey"""))

  /** Rollup — the basin per-basin + global replication pattern
    * (SURVEY §2.4, hfbasin: a cell contributes to its basin AND global). */
  private val q06 = Q(
    "q06_rollup",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(dsum($"o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
        .select(
          coalesce($"r_name", lit("ALL")).as("region"),
          coalesce($"n_name", lit("ALL")).as("nation"),
          $"revenue", $"n_orders")
        .orderBy($"region", $"nation")
    },
    Some(s"""
      SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        ${sqlSum("o_totalprice")} AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY region, nation"""))

  /** Relational division — the derivability join (SURVEY §2.3,
    * potential_vars): suppliers whose shipped parts cover every brand. */
  private val q07 = Q(
    "q07_division",
    (s, dir) => {
      import s.implicits._
      val li = Tables(s, dir, "lineitem")
      val part = Tables(s, dir, "part")
      val pairs = li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      graft.ops.Relational
        .divide(pairs, $"l_suppkey", $"p_brand", part, $"p_brand")
        .select(col("__key").as("suppkey"), col("__n").as("n_brands"))
        .orderBy(col("suppkey"))
    },
    Some("""
      SELECT l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS n_brands
      FROM (SELECT DISTINCT l_suppkey, p_brand
            FROM lineitem JOIN part ON l_partkey = p_partkey) t
      GROUP BY l_suppkey
      HAVING COUNT(*) = (SELECT COUNT(DISTINCT p_brand) FROM part)
      ORDER BY suppkey"""))

  /** Top-1 per group by rank — frequency-nearest variant selection
    * (SURVEY §2.5, mop_setup.py find_nearest). */
  private val q08 = Q(
    "q08_top1_per_group",
    (s, dir) => {
      import s.implicits._
      graft.ops.Relational
        .topOnePerGroup(
          Tables(s, dir, "orders"),
          Seq($"o_custkey"),
          Seq($"o_orderdate".desc, $"o_orderkey".asc))
        .select($"o_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"), $"o_totalprice")
        .orderBy($"o_custkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             o_totalprice
      FROM (SELECT *, ROW_NUMBER() OVER
              (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn
            FROM orders) t
      WHERE rn = 1
      ORDER BY o_custkey"""))

  /** Tuple-key dedup (SURVEY §2.4, mopdb remove_duplicate →
    * dropDuplicates). */
  private val q09 = Q(
    "q09_dedup_keys",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .select($"l_suppkey".as("suppkey"), $"l_partkey".as("partkey"))
        .dropDuplicates("suppkey", "partkey")
        .orderBy($"suppkey", $"partkey")
    },
    Some("""
      SELECT DISTINCT l_suppkey AS suppkey, l_partkey AS partkey
      FROM lineitem ORDER BY suppkey, partkey"""))

  /** Precedence-fallback match — catalog matching with priority buckets
    * (SURVEY §2.3, parse_vars exact → no-version → no-frequency): each
    * customer matched to their best order by status precedence O > P > F,
    * customers with no match kept with 'none'. */
  private val q10 = Q(
    "q10_precedence_match",
    (s, dir) => {
      import s.implicits._
      val pri = when($"o_orderstatus" === "O", 0)
        .when($"o_orderstatus" === "P", 1).otherwise(2)
      val best = graft.ops.Relational.topOnePerGroup(
        Tables(s, dir, "orders").withColumn("__pri", pri),
        Seq($"o_custkey"),
        Seq($"__pri".asc, $"o_orderkey".asc))
      Tables(s, dir, "customer")
        .join(best, $"c_custkey" === $"o_custkey", "left")
        .select($"c_custkey",
          coalesce($"o_orderstatus", lit("none")).as("status"),
          $"o_orderkey".as("orderkey"))
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, COALESCE(o_orderstatus, 'none') AS status,
             o_orderkey AS orderkey
      FROM customer
      LEFT JOIN (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
          ORDER BY CASE o_orderstatus WHEN 'O' THEN 0 WHEN 'P' THEN 1 ELSE 2 END,
                   o_orderkey) AS rn
        FROM orders) t
      ON c_custkey = t.o_custkey AND t.rn = 1
      ORDER BY c_custkey"""))

  def queries: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10)
}
