package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seawater equation of state: in-situ density ρ(θ, s, p) as the 25-term
  * rational polynomial of Jackett, McDougall, Feistel, Wright & Griffies
  * (2006) ("Algorithms for density, potential temperature, conservative
  * temperature, and the freezing temperature of seawater", J. Atmos.
  * Ocean. Tech. 23) — the exact coefficient set the reference's
  * `rho_from_theta` evaluates per cell (original/subroutines/
  * app_functions.py:683-714, used by the steric sea-level ops at
  * app_functions.py:632-680; the reference's minus signs are folded into
  * the negative constants here). Here it is a pure column expression —
  * +, *, / and sqrt only, all IEEE-deterministic and fully codegen'd, so
  * the hot path stays inside WholeStageCodegen with zero UDF overhead at
  * 100 TB.
  *
  * The Scala `Column` builder and the ANSI-SQL string builder are
  * generated from the same coefficient set with structurally identical
  * expression trees, so Spark and an oracle engine produce bit-identical
  * doubles.
  *
  * Check value: ρ(θ=25 °C, s=35 psu, p=2000 db) = 1031.65056056576
  * kg m⁻³ (JMFWG06 Table, reproduced by the reference code).
  */
object Eos {
  // Numerator coefficients (JMFWG06 eq. for ρ, numerator terms).
  val a0 = 9.9984085444849347e2; val a1 = 7.3471625860981584e0
  val a2 = -5.3211231792841769e-2; val a3 = 3.6492439109814549e-4
  val a4 = 2.5880571023991390e0;  val a5 = -6.7168282786692355e-3
  val a6 = 1.9203202055760151e-3; val a7 = 1.1798263740430364e-2
  val a8 = 9.8920219266399117e-8; val a9 = 4.6996642771754730e-6
  val a10 = -2.5862187075154352e-8; val a11 = -3.2921414007960662e-12
  // Denominator coefficients.
  val b1 = 7.2815210113327091e-3;  val b2 = -4.4787265461983921e-5
  val b3 = 3.3851002965802430e-7;  val b4 = 1.3651202389758572e-10
  val b5 = 1.7632126669040377e-3;  val b6 = -8.8066583251206474e-6
  val b7 = -1.8832689434804897e-10; val b8 = 5.7463776745432097e-6
  val b9 = 1.4716275472242334e-9;  val b10 = 6.7103246285651894e-6
  val b11 = -2.4461698007024582e-17; val b12 = -9.1534417604289062e-18

  /** ρ(θ, s, p) as a Spark column expression. */
  def rho(th: Column, s: Column, p: Column): Column = {
    val th2 = th * th
    val s5 = sqrt(s)
    val num = lit(a0) + th * (lit(a1) + th * (lit(a2) + lit(a3) * th)) +
      s * (lit(a4) + lit(a5) * th + lit(a6) * s) +
      p * (lit(a7) + lit(a8) * th2 + lit(a9) * s) +
      p * p * (lit(a10) + lit(a11) * th2)
    val den = lit(1.0) + th * (lit(b1) + th * (lit(b2) + th * (lit(b3) + lit(b4) * th))) +
      s * (lit(b5) + th * (lit(b6) + lit(b7) * th2) + s5 * (lit(b8) + lit(b9) * th2)) +
      p * (lit(b10) + p * th * (lit(b11) * th2 + lit(b12) * p))
    num / den
  }

  /** Render a double as a SQL literal that parses as DOUBLE (not DECIMAL)
    * in ANSI engines: scientific notation forces double typing, and
    * Double.toString round-trips the exact bit pattern. */
  def d(x: Double): String = {
    val s = x.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  /** The same expression as an ANSI-SQL fragment (θ, s, p are SQL
    * sub-expressions; caller guarantees they are double-typed and
    * parenthesized). Structure mirrors [[rho]] exactly — same literal
    * values, same association order, double-typed literals throughout —
    * so both engines compute identical IEEE doubles. */
  def rhoSql(th: String, s: String, p: String): String = {
    val th2 = s"($th * $th)"
    val s5 = s"sqrt($s)"
    val num = s"${d(a0)} + $th * (${d(a1)} + $th * (${d(a2)} + ${d(a3)} * $th)) + " +
      s"$s * (${d(a4)} + ${d(a5)} * $th + ${d(a6)} * $s) + " +
      s"$p * (${d(a7)} + ${d(a8)} * $th2 + ${d(a9)} * $s) + " +
      s"$p * $p * (${d(a10)} + ${d(a11)} * $th2)"
    val den = s"1.0e0 + $th * (${d(b1)} + $th * (${d(b2)} + $th * (${d(b3)} + ${d(b4)} * $th))) + " +
      s"$s * (${d(b5)} + $th * (${d(b6)} + ${d(b7)} * $th2) + $s5 * (${d(b8)} + ${d(b9)} * $th2)) + " +
      s"$p * (${d(b10)} + $p * $th * (${d(b11)} * $th2 + ${d(b12)} * $p))"
    s"(($num) / ($den))"
  }
}
