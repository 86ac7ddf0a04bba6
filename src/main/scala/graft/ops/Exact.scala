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

  /** [[dsum]] for inputs with a KNOWN magnitude bound |x| < 10^intDigits:
    * the per-element cast narrows to DECIMAL(6+intDigits, 6), so Spark's
    * Sum buffer (input precision + 10 digits) stays within the 18-digit
    * compact range and every accumulation is long arithmetic instead of
    * boxed BigDecimal — measured 2.5× faster on the q84 grid agg at the
    * scale tier, values bit-identical (same scale-6 HALF_UP rounding;
    * precision is headroom, not rounding). The caller asserts the bounds:
    * |x| < 10^intDigits per element and |Σ| < 10^(10+intDigits) per
    * group (ANSI mode raises on violation rather than corrupting).
    * Oracle twin: the same [[sqlSum]] fragment — DuckDB's sum is exact
    * at any width, so the narrowing is invisible cross-engine. */
  def dsumBounded(c: Column, intDigits: Int = 2): Column = {
    require(intDigits >= 1 && intDigits <= 12, s"intDigits=$intDigits")
    sum(c.cast(DecimalType(Scale + intDigits, Scale))).cast(DoubleType)
  }

  /** Exact mean: exact decimal sum (as double) over an exact count.
    * IEEE double division is deterministic, so both engines agree. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** [[davg]] over a [[dsumBounded]] sum — same bounds contract. */
  def davgBounded(c: Column, intDigits: Int = 2): Column =
    dsumBounded(c, intDigits) / count(c)

  /** SQL fragments for DuckDB oracles, kept next to the Scala so the two
    * stay in sync. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$Scale))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / COUNT($expr))"

  /** Fine-grained exact sum for SMALL inputs — covariance entries,
    * eigenvector mat-vec products, squared norms in [1e-8, 1e3): the
    * scale-6 cast of [[dsum]] would quantize a 1e-6-sized product to
    * one significant digit. Deepening the decimal scale directly does
    * NOT work cross-engine: from ~17 significant digits Spark's
    * double→decimal cast (which rounds the double's SHORTEST decimal
    * rendering) and DuckDB's (which rounds the exact binary expansion)
    * disagree in the last place on the dyadic ties float products
    * produce in bulk (measured on the PCA covariance). So the rounding
    * happens in IEEE double space, where both engines are
    * bit-identical by specification: q = floor(x·2^30·10^6 + 0.5) —
    * one exact-constant multiply, one add, one floor (the
    * [[Similarity.quantizeInt8]] convention) — then q sums exactly as
    * an integer decimal and the result is unscaled. Effective
    * quantization 1/(2^30·10^6) ≈ 9.3e-16 per element. Magnitude
    * contract: |x| < 8 per element (keeps q within 2^53, where the
    * scaled double is still integer-exact). */
  // 2^30 · 10^6 — exactly representable as a double (2^36 · 5^6), so the
  // one multiply below is a single deterministic IEEE operation.
  val FineUnit = 1.073741824e15
  private val FineDec0 = DecimalType(38, 0)

  def dsumFine(c: Column): Column =
    sum(floor(c * lit(FineUnit) + lit(0.5)).cast(FineDec0))
      .cast(DoubleType) / lit(FineUnit)
  def davgFine(c: Column): Column = dsumFine(c) / count(c)
  def sqlSumFine(expr: String): String =
    s"(CAST(SUM(CAST(floor((($expr) * 1073741824000000.0e0) + 0.5e0) " +
      s"AS DECIMAL(38,0))) AS DOUBLE) / 1073741824000000.0e0)"
  def sqlAvgFine(expr: String): String =
    s"(${sqlSumFine(expr)} / COUNT($expr))"
}
