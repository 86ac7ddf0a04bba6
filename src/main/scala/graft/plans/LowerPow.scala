package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Multiply, Pow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: lower `pow(x, k)` with a small integer-literal k to a
  * left-associated multiply chain `((x*x)*x)...`.
  *
  * Two reasons, both scale-relevant:
  *  - **Determinism.** libm `pow` differs in the last ulp between
  *    platforms and engines; repeated double multiplication is exact
  *    IEEE-754 and reproduces everywhere. The calculation-DSL compiler
  *    (graft.dsl.Calc) performs this lowering at build time for catalog
  *    expressions like `var[0]**2`; this rule extends the guarantee to
  *    any plan, including raw `spark.sql("... pow(x, 2) ...")` text.
  *  - **Throughput.** A multiply is a single fused instruction inside
  *    whole-stage codegen; `Math.pow` is a call. In a 60 000-column
  *    EOS-density kernel evaluated per grid cell the difference is
  *    measurable.
  *
  * The chain is left-associated to match Calc's lowering exactly, so
  * both paths produce bit-identical values. Exponents 2..8 only:
  * beyond that the duplicated-subtree cost outweighs the call, and
  * codegen common-subexpression elimination stops being a given.
  *
  * The base must be deterministic: the rewrite duplicates the `base`
  * subtree k-1 times, and each copy of a non-deterministic expression
  * evaluates independently (`pow(rand(), 2)` is NOT `rand()*rand()`).
  * Same guard Catalyst's own expression-duplicating rewrites apply.
  *
  * Installed by [[GraftSparkExtensions]] via `injectOptimizerRule`, so
  * it runs inside Catalyst's operator-optimization fixpoint (after
  * constant folding has collapsed `cast(2 as double)` into the literal
  * this rule matches).
  */
object LowerPow extends Rule[LogicalPlan] {
  private def isSmallInt(d: Double): Boolean =
    d.isWhole && d >= 2.0 && d <= 8.0

  private def chain(base: Expression, k: Int): Expression =
    (2 to k).foldLeft(base)((acc, _) => Multiply(acc, base))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Pow(base, Literal(d: Double, DoubleType))
          if isSmallInt(d) && base.deterministic =>
        chain(base, d.toInt)
    }
}
