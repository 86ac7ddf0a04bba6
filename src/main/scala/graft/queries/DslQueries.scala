package graft.queries

import graft.Tables
import graft.dsl.Calc
import org.apache.spark.sql.functions._

/** Calculation-DSL queries (SURVEY.md §2.7/§2.9): catalog-style
  * `calculation` strings compiled by graft.dsl.Calc to Column expressions,
  * with the oracle SQL emitted by the same compiler from the same AST —
  * the cross-engine determinism contract is structural, not hand-kept.
  *
  * Expression shapes mirror data/mappings/master_map.csv rows
  * (`var[0]*var[1]`, unit scalings like `var[0]*12e-6`, long constant
  * ratios, `.fillna(0)`, `var[0]**2`, named operator calls).
  */
object DslQueries extends QueryGroup {

  /** One Q from a calculation string: Spark side compiles to a Column,
    * oracle side compiles the same AST to SQL. */
  private def dslQ(name: String, calc: String,
      sparkVars: Seq[org.apache.spark.sql.Column], sqlVars: Seq[String],
      nullGuard: Option[(org.apache.spark.sql.Column, String)] = None): Q = Q(
    name,
    (s, dir) => {
      import s.implicits._
      val base = Tables(s, dir, "lineitem")
      val withNull = nullGuard match {
        case Some((c, _)) => base.withColumn("v0n", c)
        case None         => base
      }
      withNull.select($"l_orderkey", $"l_linenumber",
          Calc.compile(calc, sparkVars).as("calc"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some {
      val pre = nullGuard.map { case (_, sql) => s", $sql AS v0n" }.getOrElse("")
      s"""
      WITH t AS (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                        l_discount, l_tax$pre FROM lineitem)
      SELECT l_orderkey, l_linenumber,
        ${Calc.compileSql(calc, sqlVars)} AS calc
      FROM t ORDER BY l_orderkey, l_linenumber"""
    })

  /** Catalog arithmetic over three inputs — the `var[0]*var[1]` family. */
  private val q35 = dslQ("q35_dsl_arith",
    "var[0]*(1.0-var[1])*(1.0+var[2])",
    Seq(col("l_extendedprice"), col("l_discount"), col("l_tax")),
    Seq("l_extendedprice", "l_discount", "l_tax"))

  /** Unit scaling + constant ratio — `var[0]*12e-6`,
    * `(var[0]*106*0.012)/(16*50*1000)` shapes. */
  private val q36 = dslQ("q36_dsl_units",
    "var[0]*12e-6 + (var[1]*106*0.012)/(16*50*1000)",
    Seq(col("l_extendedprice"), col("l_quantity")),
    Seq("l_extendedprice", "l_quantity"))

  /** fillna + integer power (lowered to repeated multiply on both
    * engines) over an input with genuine NULLs. */
  private val q37 = dslQ("q37_dsl_fill_pow",
    "var[0].fillna(0)**2/100 - var[1]*var[1]",
    Seq(col("v0n"), col("l_discount")),
    Seq("v0n", "l_discount"),
    nullGuard = Some((
      when(col("l_quantity") > 45, lit(null)).otherwise(col("l_quantity")),
      "CASE WHEN l_quantity > 45 THEN NULL ELSE l_quantity END")))

  /** Named operator call through the registry — the catalog's
    * `rho_from_theta(...)` style (EOS density per row). */
  private val q38 = dslQ("q38_dsl_funcall",
    "rho_from_theta(var[0]/2, 30+var[1]*100, var[2]*500) - 1000",
    Seq(col("l_quantity"), col("l_discount"), col("l_linenumber").cast("double")),
    Seq("l_quantity", "l_discount", "CAST(l_linenumber AS DOUBLE)"))

  def queries: Seq[Q] = Seq(q35, q36, q37, q38)
}
