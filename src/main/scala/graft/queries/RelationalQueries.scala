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

  def queries: Seq[Q] = Seq(q01, q02)
}
