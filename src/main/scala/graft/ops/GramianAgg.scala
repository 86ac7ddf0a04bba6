package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Gramian-row accumulator: for group key i, sums the quantized
  * products q_j = floor(e_i·e_j · 2^30·10^6 + 0.5) over all vectors —
  * one Array[Long] vector-add per input row instead of d² exploded
  * decimal rows. This is the per-partition Gramian accumulation a
  * 100 TB covariance build has to use: the shuffle carries d rows of
  * d longs (the partial Gramian), never n·d² anything.
  *
  * Bit-identical to the exploded `Exact.dsumFine(a.e * b.e)`
  * formulation (PcaSpec pins it): the per-element quantization is the
  * same IEEE chain — (e_i·e_j)·FineUnit, +0.5, floor — and long adds
  * are exact in any order. Overflow is loud (`Math.addExact`), bounding
  * n·|e|²·9.3e14 < 2^63: ~10^9 unit-scale vectors per partial; beyond
  * that, pre-aggregate per shard. */
object GramianAgg
    extends Aggregator[(Double, Array[Double]), Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], in: (Double, Array[Double])): Array[Long] = {
    val (ei, emb) = in
    val b = if (buf.length == emb.length) buf else new Array[Long](emb.length)
    var j = 0
    while (j < emb.length) {
      val q = math.floor(ei * emb(j) * Exact.FineUnit + 0.5).toLong
      b(j) = Math.addExact(b(j), q)
      j += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      var j = 0
      while (j < x.length) { x(j) = Math.addExact(x(j), y(j)); j += 1 }
      x
    }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  /** Column form: gramRow(e_i, emb) usable in a groupBy(i).agg(...). */
  def gramRow(ei: Column, emb: Column): Column = {
    val f = udaf(this, ExpressionEncoder[(Double, Array[Double])]())
    f(ei, emb)
  }
}
