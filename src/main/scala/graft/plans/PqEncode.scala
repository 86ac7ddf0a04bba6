package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ encoding: nearest-centroid code per subspace, computed as
  * tight primitive loops instead of the interpreted higher-order-function
  * formulation (whose `filter(fs, f -> f.fd <= array_min(fs) + ε)` alone
  * re-evaluates array_min per candidate — O(k²) interpreted struct work
  * per subspace). Encoding is the corpus-sized pass of every PQ index
  * build (q106/q109/q112/q121), so the kernel's constant factor is what
  * a 100 TB encode pays per vector; measured 1.8 s → ~0.2 s over the
  * sf0.1 store.
  *
  * Bit-compatible with the SQL formulation (kept as
  * `Similarity.pqEncodeSqlRef` and asserted equal in PqEncodeParitySpec),
  * which both engines of the oracle pair execute:
  *
  *  - sketch: per-subspace squared L2 against each centroid as a plain
  *    double left fold in element order;
  *  - margin: candidates within `dsub·1e-6 + 1e-5·(1 + min)` of the
  *    double minimum (covers decimal rounding of both sides plus double
  *    summation error);
  *  - verify: candidates re-scored with per-element
  *    `CAST((x−y)² AS DECIMAL(18,6))` semantics — HALF_UP at 6 dp of the
  *    shortest-repr double (java BigDecimal.valueOf, the same path
  *    Spark's double→decimal cast takes) — summed exactly in scaled
  *    longs (bounded: dsub terms of DECIMAL(18,6) squares), argmin with
  *    ties to the lower centroid id.
  *
  * Inputs: `emb` array<float|double>, `cb` the codebook column
  * (array over subspaces of arrays (by cid) of centroid subvectors,
  * [[graft.ops.Similarity.pqCodebook]]), `m`/`dim` integer literals.
  * Null array or null element → null result (the SQL formulation's
  * null propagation; the store contract has no null components).
  */
case class PqEncodeExact(emb: Expression, cb: Expression,
    m: Expression, dim: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(emb, cb, m, dim)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val embOk = emb.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    val cbOk = cb.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _                                                    => false
    }
    if (!embOk || !cbOk)
      TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<float|double>, array<array<array<double>>>, " +
          s"int, int), got (${emb.dataType.simpleString}, ${cb.dataType.simpleString})")
    else if (!m.foldable || !dim.foldable)
      TypeCheckResult.TypeCheckFailure("pq_encode m/dim must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val mVal = m.eval().asInstanceOf[Number].intValue()
  private lazy val dimVal = dim.eval().asInstanceOf[Number].intValue()
  private lazy val embIsFloat = emb.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** DECIMAL(18,6) of a double, as its unscaled long — HALF_UP on the
    * shortest decimal representation, matching Spark's Cast(double →
    * decimal) which goes through BigDecimal.valueOf. */
  private def dec6(d: Double): Long =
    JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    if (e == null) return null
    val c = cb.eval(input)
    if (c == null) return null
    val x = e.asInstanceOf[ArrayData]
    val book = c.asInstanceOf[ArrayData]
    val dsub = dimVal / mVal
    if (x.numElements() < dimVal) return null
    val xs = new Array[Double](dimVal)
    var i = 0
    while (i < dimVal) {
      if (x.isNullAt(i)) return null
      xs(i) = if (embIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    val codes = new Array[Int](mVal)
    var s = 0
    while (s < mVal) {
      val cents = book.getArray(s)
      val k = cents.numElements()
      val base = s * dsub
      // sketch: plain double squared-L2 sweep, left-fold element order
      val fds = new Array[Double](k)
      var mn = Double.PositiveInfinity
      var ci = 0
      while (ci < k) {
        val cent = cents.getArray(ci)
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          val d = xs(base + j) - cent.getDouble(j)
          acc += d * d
          j += 1
        }
        fds(ci) = acc
        if (acc < mn) mn = acc
        ci += 1
      }
      // verify: decimal-exact distance for in-margin candidates only
      val cut = mn + (dsub * 1.0e-6 + 1.0e-5 * (1.0 + mn))
      var bestSum = Long.MaxValue
      var best = -1
      ci = 0
      while (ci < k) {
        if (fds(ci) <= cut) {
          val cent = cents.getArray(ci)
          var sum = 0L
          var j = 0
          while (j < dsub) {
            val d = xs(base + j) - cent.getDouble(j)
            sum += dec6(d * d)
            j += 1
          }
          if (sum < bestSum) { bestSum = sum; best = ci }
        }
        ci += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def prettyName: String = "pq_encode"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqEncodeExact =
    copy(emb = newChildren(0), cb = newChildren(1),
      m = newChildren(2), dim = newChildren(3))
}
