package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Johnson–Lindenstrauss ±1 hash-projection of an embedding array to
  * `k` dimensions as ONE native expression: out[j] = Σ_i s(i,j)·x_i
  * with the sign s(i,j) keyed on md5("i|j") — Achlioptas '01
  * database-friendly projections, the matrix IS a hash and never
  * materializes.
  *
  * This replaces q218's explode formulation (r9 verdict, Next #6):
  * `posexplode(embedding) × explode(sequence(0, k-1))` blows every
  * 64-float vector into 512 rows that ride a hash-aggregate shuffle —
  * an 8× row multiplier the projection never needed. Here the k sums
  * come out of one pass over the ArrayData, map-side, zero extra rows.
  *
  * EXACTNESS CONTRACT (the q218 hash must not move): the old plan
  * summed `CAST(±x_i AS DECIMAL(18,6))` per (id, j) and cast the
  * decimal sum to double. This expression reproduces that arithmetic
  * bit-for-bit: each term is the HALF_UP 6-decimal rounding of the
  * double (Spark's double→decimal cast rounds the double's SHORTEST
  * decimal rendering — `BigDecimal.valueOf`), accumulated as exact
  * micro-unit longs, and the final double is the decimal's
  * correctly-rounded `doubleValue` (Spark's `Decimal.toDouble`).
  * HALF_UP is symmetric under negation, so the sign applies to the
  * micro units directly. Null elements contribute 0 (SQL sum skipna).
  *
  * The sign table is data-independent, so it precomputes ONCE per
  * (k, dim) per JVM — any executor regenerates any entry from the
  * hash, exactly the property that makes the operator shippable to a
  * 1000-executor cluster with no broadcast. */
case class JlProject(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 512, s"k=$k")

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jl_project expects array<float|double>, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "jl_project"

  private lazy val isFloat = elemType.contains(FloatType)

  override protected def nullSafeEval(input: Any): Any =
    JlProject.project(input.asInstanceOf[ArrayData], k, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.JlProject$$.MODULE$$.project($c, $k, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

object JlProject {
  // sign tables keyed by (k, dim): tiny (k·dim booleans), computed once
  // per JVM from md5("i|j") — the identical hash the old column chain
  // used (TextOps.h64 % 2), so the projection values are unchanged
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Boolean]]]()

  private def signs(k: Int, dim: Int): Array[Array[Boolean]] =
    signCache.computeIfAbsent((k, dim), { _ =>
      Array.tabulate(k) { j =>
        Array.tabulate(dim) { i =>
          val key = s"$i|$j".getBytes(StandardCharsets.UTF_8)
          Md5Prefix60.compute(key, 0) % 2 == 0 // + iff even, as pmod(h64,2)=0
        }
      }
    })

  /** micro-units (scale 6) of Spark's CAST(d AS DECIMAL(18,6)): HALF_UP
    * rounding of the double's shortest decimal rendering. */
  private def micros(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  def project(arr: ArrayData, k: Int, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val sg = signs(k, n)
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val row = sg(j)
      var acc = 0L
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          val m = micros(x)
          acc += (if (row(i)) m else -m)
        }
        i += 1
      }
      out(j) = java.math.BigDecimal.valueOf(acc, 6).doubleValue()
      j += 1
    }
    new GenericArrayData(out)
  }
}
