package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused dot product of two float-array columns as a native Catalyst
  * expression with whole-stage codegen: one primitive loop over the
  * ArrayData, no intermediate zip_with array, no lambda-function
  * interpretation.
  *
  * This is the (b)-tier extension point of the engine's design ladder
  * (compose built-ins → custom codegen'd Expression → custom plan node):
  * the built-in formulation `aggregate(zip_with(a, b, ...), ...)`
  * allocates a 64-element array per row and interprets two lambdas;
  * this expression is a tight double-accumulating loop — the hot inner
  * kernel of brute-force similarity scans over 100 TB of embeddings.
  *
  * Sums in double (fast path): use for ranking prefilters; the exact
  * decimal formulation (Similarity.dotExact) remains the reported-value
  * path. Null elements contribute 0, mirroring SQL aggregate skipna.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // each side may be float (the raw store) or double (derived vectors:
  // residuals, iterated Lloyd centroids) — the accumulator is double
  // either way and float widening is exact
  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot expects (array<float|double>, array<float|double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  private lazy val leftIsFloat = elem(left.dataType).contains(FloatType)
  private lazy val rightIsFloat = elem(right.dataType).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xv = if (leftIsFloat) s"((double) $a.getFloat($i))"
               else s"$a.getDouble($i)"
      val yv = if (rightIsFloat) s"((double) $b.getFloat($i))"
               else s"$b.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            $s += $xv * $yv;
          }
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration of the engine's native functions. */
object GraftFunctions {
  private val builder = (exprs: Seq[Expression]) => FloatDot(exprs(0), exprs(1))
  private val pqBuilder = (exprs: Seq[Expression]) =>
    PqEncodeExact(exprs(0), exprs(1), exprs(2), exprs(3))

  /** Register into an existing session (idempotent — skips when already
    * present, so per-query re-registration doesn't spam replace WARNs). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("float_dot")))
      reg.createOrReplaceTempFunction("float_dot", builder, "built-in")
    if (!reg.functionExists(FunctionIdentifier("pq_encode")))
      reg.createOrReplaceTempFunction("pq_encode", pqBuilder, "built-in")
  }
}

/** `spark.sql.extensions`-style installer:
  * `.config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")`. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (exprs: Seq[Expression]) => FloatDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncodeExact].getName, "pq_encode"),
      (exprs: Seq[Expression]) =>
        PqEncodeExact(exprs(0), exprs(1), exprs(2), exprs(3))))
    e.injectOptimizerRule(_ => LowerPow)
    e.injectPlannerStrategy(_ => AsOfStrategy)
  }
}
