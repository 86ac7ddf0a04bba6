package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine exact aggregation helpers.
  *
  * Floating-point sums are order-dependent: Spark's partial aggregation and
  * DuckDB's vectorized aggregation fold doubles in different orders, so raw
  * `sum(double)` results differ in the low bits and fail a hash compare.
  * The fix: round the per-row double to a decimal, sum exactly in decimal,
  * and cast the final result back to double. Both engines then produce
  * bit-identical values. Rounding ties DO occur (dyadic doubles such as
  * 0.0078125 = 2^-7 sit exactly halfway between adjacent multiples of
  * 10^-6); the invariant that keeps the engines in agreement is that both
  * Spark (HALF_UP decimal cast) and DuckDB round half away from zero —
  * covered by the midpoint unit test in OpsSpec.
  *
  * DuckDB oracle equivalent of `dsum(c)`:
  *   CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE)
  */
object Exact {
  val Scale = 6
  private val Dec = DecimalType(18, Scale)

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact mean: exact decimal sum (as double) over an exact count.
    * IEEE double division is deterministic, so both engines agree. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragments for DuckDB oracles, kept next to the Scala so the two
    * stay in sync. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$Scale))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / COUNT($expr))"
}
