package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Typed weighted-mean Aggregator — the `Aggregator[IN, BUF, OUT]`
  * extension class of SURVEY.md §2.9, for `Dataset[(value, weight)]`
  * pipelines where type safety matters (the untyped path is
  * ClimateOps.weightedMean).
  *
  * Semantics mirror the engine's exactness contract: each v·w and w is
  * rounded to 6 decimals (the Exact scale) and accumulated exactly in
  * BigDecimal, so the result is bit-identical to the Column formulation
  * regardless of partitioning or merge order.
  */
object WeightedMeanAgg
    extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

  // valueOf (shortest decimal string), not new BigDecimal(double) (exact
  // binary expansion): Spark's double→decimal cast goes through
  // BigDecimal.decimal = valueOf, and the two can round differently at
  // scale boundaries.
  private def d6(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(Exact.Scale, RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal), a: (Double, Double)): (JBigDecimal, JBigDecimal) =
    (b._1.add(d6(a._1 * a._2)), b._2.add(d6(a._2)))

  override def merge(x: (JBigDecimal, JBigDecimal), y: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (x._1.add(y._1), x._2.add(y._2))

  override def finish(b: (JBigDecimal, JBigDecimal)): Double =
    if (b._2.signum() == 0) Double.NaN
    else b._1.doubleValue() / b._2.doubleValue()

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
