package graft

import graft.ops.{Exact, Pca}
import org.apache.spark.sql.functions._

/** Distributed PCA: covariance, power iteration, projection — checked
  * on a rank-1 dataset whose principal axis is known in closed form. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // points t · (0.6, 0.8, 0, 0) for t in -2..2: principal axis (0.6, 0.8),
  // population variance along it = Σt²/5 = 2
  private def comp = (for {
    (t, id) <- Seq(-2.0, -1.0, 0.0, 1.0, 2.0).zipWithIndex
    (x, i) <- Seq(t * 0.6, t * 0.8, 0.0, 0.0).zipWithIndex
  } yield (id.toLong, i, x)).toDF("id", "i", "e")

  test("powerComponent recovers the known principal axis and eigenvalue") {
    val got = Pca.powerComponent(Pca.covariance(comp), iters = 3)
      .orderBy($"i").as[(Int, Double, Double)].collect()
    val v = got.map(_._2)
    assert(math.abs(v(0) - 0.6) < 1e-9 && math.abs(v(1) - 0.8) < 1e-9 &&
      math.abs(v(2)) < 1e-9 && math.abs(v(3)) < 1e-9, v.toSeq)
    assert(math.abs(got.head._3 - 2.0) < 1e-9, s"lambda=${got.head._3}")
  }

  test("project returns each point's coordinate along the axis") {
    val c = comp
    val scores = Pca.project(c, Pca.means(c),
        Pca.powerComponent(Pca.covariance(c), iters = 3))
      .orderBy($"id").as[(Long, Double)].collect().map(_._2)
    // score of t·(0.6,0.8,0,0) along (0.6,0.8,0,0) is t (mean is 0)
    assert(scores.zip(Seq(-2.0, -1.0, 0.0, 1.0, 2.0)).forall {
      case (g, w) => math.abs(g - w) < 1e-9 }, scores.toSeq)
  }

  test("covariance applies the mean correction (shifted data, same axis)") {
    val shifted = comp.withColumn("e", $"e" + when($"i" === 0, 10.0).otherwise(3.0))
    val got = Pca.powerComponent(Pca.covariance(shifted), iters = 3)
      .orderBy($"i").as[(Int, Double, Double)].collect()
    assert(math.abs(got(0)._2 - 0.6) < 1e-9 && math.abs(got(1)._2 - 0.8) < 1e-9)
    assert(math.abs(got.head._3 - 2.0) < 1e-9)
  }

  test("dsumFine sums tiny magnitudes without the scale-6 quantization loss") {
    val xs = Seq.fill(1000)(1.234e-7).toDF("x")
    val fine = xs.agg(Exact.dsumFine($"x")).as[Double].head()
    val coarse = xs.agg(Exact.dsum($"x")).as[Double].head()
    assert(math.abs(fine - 1.234e-4) < 1e-12, s"fine=$fine")
    // scale-6 rounds each 1.234e-7 element to 0 — the motivating failure
    assert(coarse == 0.0, s"coarse=$coarse")
  }
}
