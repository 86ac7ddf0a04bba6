package graft

import graft.ops.Drift
import org.apache.spark.sql.functions._

/** PSI drift monitor: frozen reference quartile bins, smoothed terms. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def frame(vals: Seq[Double]) = vals.zipWithIndex
    .map { case (v, i) => ("g", v, i.toLong) }.toDF("k", "x", "id")

  test("identical slices score exactly zero drift") {
    val ref = frame(Seq(1, 2, 3, 4, 5, 6, 7, 8).map(_.toDouble))
    val got = Drift.psi(ref, ref, Seq("k"), $"x", $"id",
        Seq(0.25, 0.5, 0.75), eps = 1e-4)
      .as[(String, Double, Long, Long)].head()
    assert(got == (("g", 0.0, 8L, 8L)), got)
  }

  test("a fully shifted current window scores a large finite PSI") {
    val ref = frame(Seq(1, 2, 3, 4, 5, 6, 7, 8).map(_.toDouble))
    val cur = frame(Seq(7.5, 8.5, 9.0, 10.0))
    val got = Drift.psi(ref, cur, Seq("k"), $"x", $"id",
        Seq(0.25, 0.5, 0.75), eps = 1e-4)
      .as[(String, Double, Long, Long)].head()
    // quartile edges 2/4/6 -> ref 0.25 per bin; cur sits entirely in
    // bin 4 (pc = 1), bins 1-3 floored at eps
    def term(pc: Double, pr: Double) =
      BigDecimal((pc - pr) * math.log(pc / pr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = 3 * term(1e-4, 0.25) + term(1.0, 0.25)
    assert(math.abs(got._2 - want) < 1e-9, s"psi=${got._2} want=$want")
    assert(got._2 > 0.25) // "shifted" by the standard PSI rubric
    assert(got._3 == 8L && got._4 == 4L)
  }

  test("bins empty on the CURRENT side only still contribute finite terms") {
    val ref = frame(Seq(1, 2, 3, 4, 5, 6, 7, 8).map(_.toDouble))
    val cur = frame(Seq(1.0, 1.5)) // all in bin 1
    val got = Drift.psi(ref, cur, Seq("k"), $"x", $"id",
        Seq(0.25, 0.5, 0.75), eps = 1e-4)
      .as[(String, Double, Long, Long)].head()
    assert(!got._2.isInfinite && !got._2.isNaN && got._2 > 0.25, got)
  }
}
