package graft

import graft.ops.{Exact, Pca}
import org.apache.spark.sql.functions._

/** Distributed PCA: covariance, power iteration, deflation, projection —
  * checked on datasets whose principal axes are known in closed form,
  * plus the Gramian-aggregator/exploded-decimal bit-parity pin. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // points t · (0.6, 0.8, 0, 0) for t in -2..2: principal axis (0.6, 0.8),
  // population variance along it = Σt²/5 = 2
  private def vecsDf = Seq(-2.0, -1.0, 0.0, 1.0, 2.0).zipWithIndex
    .map { case (t, id) => (id.toLong, Seq(t * 0.6, t * 0.8, 0.0, 0.0)) }
    .toDF("id", "emb")

  test("powerComponent recovers the known principal axis and eigenvalue") {
    val got = Pca.powerComponent(Pca.covariance(vecsDf), iters = 3)
      .orderBy($"i").as[(Int, Double, Double)].collect()
    val v = got.map(_._2)
    assert(math.abs(v(0) - 0.6) < 1e-9 && math.abs(v(1) - 0.8) < 1e-9 &&
      math.abs(v(2)) < 1e-9 && math.abs(v(3)) < 1e-9, v.toSeq)
    assert(math.abs(got.head._3 - 2.0) < 1e-9, s"lambda=${got.head._3}")
  }

  test("project returns each point's coordinate along the axis") {
    val c = Pca.compOf(vecsDf)
    val scores = Pca.project(c, Pca.means(c),
        Pca.powerComponent(Pca.covariance(vecsDf), iters = 3))
      .orderBy($"id").as[(Long, Double)].collect().map(_._2)
    // score of t·(0.6,0.8,0,0) along (0.6,0.8,0,0) is t (mean is 0)
    assert(scores.zip(Seq(-2.0, -1.0, 0.0, 1.0, 2.0)).forall {
      case (g, w) => math.abs(g - w) < 1e-9 }, scores.toSeq)
  }

  test("covariance applies the mean correction (shifted data, same axis)") {
    val shifted = vecsDf.select($"id",
      expr("transform(emb, (x, i) -> x + CASE WHEN i = 0 THEN 10.0 ELSE 3.0 END)")
        .as("emb"))
    val got = Pca.powerComponent(Pca.covariance(shifted), iters = 3)
      .orderBy($"i").as[(Int, Double, Double)].collect()
    assert(math.abs(got(0)._2 - 0.6) < 1e-9 && math.abs(got(1)._2 - 0.8) < 1e-9)
    assert(math.abs(got.head._3 - 2.0) < 1e-9)
  }

  test("deflation recovers the second component of a rank-2 dataset") {
    // points a·(0.6, 0.8, 0, 0) + b·(0, 0, 1, 0): axis 1 variance 2,
    // axis 2 variance 0.2 — pc1 = ±(0.6, 0.8, 0, 0), pc2 = ±(0, 0, 1, 0)
    val bs = Seq(0.5, -0.5, 0.0, -0.5, 0.5)
    val pts = Seq(-2.0, -1.0, 0.0, 1.0, 2.0).zipWithIndex.map { case (a, k) =>
      (k.toLong, Seq(a * 0.6, a * 0.8, bs(k), 0.0))
    }
    val v = pts.toDF("id", "emb")
    val cov = Pca.covariance(v)
    val pc1 = Pca.powerComponent(cov, iters = 6)
    val pc2 = Pca.powerComponent(Pca.deflate(cov, pc1), iters = 6)
    val v1 = pc1.orderBy($"i").as[(Int, Double, Double)].collect()
    val v2 = pc2.orderBy($"i").as[(Int, Double, Double)].collect()
    assert(math.abs(math.abs(v1(0)._2) - 0.6) < 1e-6 &&
      math.abs(math.abs(v1(1)._2) - 0.8) < 1e-6 &&
      math.abs(v1(2)._2) < 1e-6, v1.map(_._2).toSeq)
    assert(math.abs(v1.head._3 - 2.0) < 1e-6)
    assert(math.abs(math.abs(v2(2)._2) - 1.0) < 1e-4 &&
      math.abs(v2(0)._2) < 1e-4 && math.abs(v2(1)._2) < 1e-4,
      v2.map(_._2).toSeq)
    // b-axis population variance: Σb²/5 = (0.25·4)/5 = 0.2
    assert(math.abs(v2.head._3 - 0.2) < 1e-4, s"lambda2=${v2.head._3}")
  }

  test("Gramian covariance is bit-identical to the exploded decimal formulation") {
    // deterministic pseudo-random 7-dim vectors (hash-derived values)
    val v = spark.range(20).select($"id",
      expr("""transform(sequence(0, 6), j ->
        CAST(hash(id, j) % 1000 AS DOUBLE) / 997.0)""").as("emb"))
      .localCheckpoint()
    val got = Pca.covariance(v)
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // the reference: the oracle's exploded m2 shape over dsumFine
    val comp = Pca.compOf(v)
    val m2 = comp.as("a").join(comp.as("b"), $"a.id" === $"b.id")
      .groupBy($"a.i".as("i"), $"b.i".as("j"))
      .agg(Exact.dsumFine($"a.e" * $"b.e").as("s"), count(lit(1)).as("cnt"))
    val mu = Pca.means(comp)
    val want = m2
      .join(broadcast(mu.select($"i", $"mu".as("mu_i"))), Seq("i"))
      .join(broadcast(mu.select($"i".as("j"), $"mu".as("mu_j"))), Seq("j"))
      .select($"i", $"j", ($"s" / $"cnt" - $"mu_i" * $"mu_j").as("cov"))
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size == 49 && got.keySet == want.keySet)
    assert(got.forall { case (k, g) => g == want(k) },
      got.collect { case (k, g) if g != want(k) => (k, g, want(k)) }.take(5))
  }

  test("dsumFine is invariant to row order and partitioning") {
    val xs = (1 to 2000).map(i => math.sin(i.toDouble) * 1e-3)
    val base = xs.toDF("x").coalesce(1)
      .agg(Exact.dsumFine($"x")).as[Double].head()
    val shuffled = scala.util.Random.shuffle(xs).toDF("x").repartition(17)
      .agg(Exact.dsumFine($"x")).as[Double].head()
    assert(base == shuffled, s"$base != $shuffled") // bit-identical
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
