package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class DoremiSpec extends SparkSpec {
  import spark.implicits._

  private def step(rows: Seq[(String, Double)], eta: Double = 1.0,
      smooth: Double = 0.2) =
    Sampling.doremiReweight(rows.toDF("domain", "loss"),
      $"domain", $"loss", eta, smooth)

  test("weights are a distribution and order follows excess loss") {
    val rows = Seq.tabulate(30)(i => ("low", 1.0 + (i % 3) * 0.1)) ++
      Seq.tabulate(30)(i => ("mid", 2.0 + (i % 3) * 0.1)) ++
      Seq.tabulate(30)(i => ("high", 4.0 + (i % 3) * 0.1))
    val w = step(rows).collect()
      .map(r => r.getAs[String]("domain") -> r.getAs[Double]("weight")).toMap
    assert(math.abs(w.values.sum - 1.0) < 1e-5)
    assert(w("low") < w("mid") && w("mid") < w("high"))
  }

  test("equal losses give the uniform mixture") {
    val rows = Seq(("a", 2.0), ("a", 2.0), ("b", 2.0), ("c", 2.0))
    val w = step(rows).select($"weight").as[Double].collect()
    assert(w.forall(x => math.abs(x - 1.0 / 3) < 1e-5))
  }

  test("smooth=1 ignores losses entirely") {
    val rows = Seq(("a", 1.0), ("b", 9.0))
    val w = step(rows, smooth = 1.0).select($"weight").as[Double].collect()
    assert(w.forall(x => math.abs(x - 0.5) < 1e-9))
  }

  test("excess is measured from the best domain") {
    val rows = Seq(("best", 1.5), ("worse", 2.5))
    val got = step(rows).orderBy($"domain").collect()
    assert(got(0).getAs[Double]("excess") == 0.0) // best
    assert(math.abs(got(1).getAs[Double]("excess") - 1.0) < 1e-9)
  }
}
