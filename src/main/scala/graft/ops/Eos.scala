package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seawater equation of state: in-situ density ρ(θ, s, p) as the 25-term
  * rational polynomial of McDougall, Jackett, Wright & Feistel (2003)
  * ("Accurate and computationally efficient algorithms for potential
  * temperature and density of seawater", J. Atmos. Ocean. Tech. 20).
  *
  * The reference evaluates the same published EOS per cell
  * (app_functions.py:683-714 `rho_from_theta`, used by the steric
  * sea-level ops at app_functions.py:632-680). Here it is a pure column
  * expression — +, *, / and sqrt only, all IEEE-deterministic and fully
  * codegen'd, so the hot path stays inside WholeStageCodegen with zero
  * UDF overhead at 100 TB.
  *
  * The Scala `Column` builder and the ANSI-SQL string builder are
  * generated from the same coefficient set with structurally identical
  * expression trees, so Spark and an oracle engine produce bit-identical
  * doubles.
  *
  * Check value: ρ(θ=25 °C, s=35 psu, p=2000 db) ≈ 1031.654229 kg m⁻³.
  */
object Eos {
  // Numerator coefficients (P1..P12 of MJWF03 Table A1).
  val a0 = 9.99843699e2;  val a1 = 7.35212840e0;   val a2 = -5.45928211e-2
  val a3 = 3.98476704e-4; val a4 = 2.96938239e0;   val a5 = -7.23268813e-3
  val a6 = 2.12382341e-3; val a7 = 1.04004591e-2;  val a8 = 1.03970529e-7
  val a9 = 5.18761880e-6; val a10 = -3.24041825e-8; val a11 = -1.23869360e-11
  // Denominator coefficients (P13..P25).
  val b1 = 7.28606739e-3;  val b2 = -4.60835542e-5; val b3 = 3.68390573e-7
  val b4 = 1.80809186e-10; val b5 = 2.14691708e-3;  val b6 = -9.27062484e-6
  val b7 = -1.78343643e-10; val b8 = 4.76534122e-6; val b9 = 1.63410736e-9
  val b10 = 5.30848875e-6; val b11 = -3.03175128e-16; val b12 = -1.27934137e-17

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
