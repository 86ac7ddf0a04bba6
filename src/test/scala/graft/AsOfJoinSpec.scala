package graft

import graft.plans.{AsOf, AsOfJoinExec}
import graft.ops.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Custom as-of join operator: semantics against the naive formulation,
  * null extension, partition invariance, and physical-plan shape. */
class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private lazy val trades = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 5L, 4.0), ("b", 6L, 5.0),
    ("c", 7L, 6.0)) // key with no quotes at all
    .toDF("sym", "t", "px")

  private lazy val quotes = Seq(
    ("a", 10L, 0.1), ("a", 25L, 0.2), ("a", 40L, 0.3),
    ("b", 6L, 0.4),
    ("d", 1L, 0.9)) // key with no trades
    .toDF("qsym", "qt", "bid")

  // deterministic full ordering driver-side: duplicate (sym, t) left
  // rows make a SQL orderBy on those two columns a partial order
  private def fullSort(xs: Seq[(String, Long, Double, Option[Double])]) =
    xs.sortBy(x => (x._1, x._2, x._3, x._4.getOrElse(-1.0)))

  private def run(l: DataFrame, r: DataFrame): Seq[(String, Long, Double, Option[Double])] =
    fullSort(AsOf.backwardJoin(l, r, Seq("sym"), Seq("qsym"), "t", "qt")
      .select($"sym", $"t", $"px", $"bid")
      .as[(String, Long, Double, Option[Double])].collect().toSeq)

  // naive oracle: join all earlier-or-equal quotes, keep latest per left
  // ROW (a unique id — duplicate (sym, t) left rows each produce output)
  private def naive(l: DataFrame, r: DataFrame): Seq[(String, Long, Double, Option[Double])] = {
    val lid = l.withColumn("__lid", monotonically_increasing_id())
    val cand = lid.join(r, $"sym" === $"qsym" && $"qt" <= $"t", "left")
    fullSort(Relational.topOnePerGroup(cand, Seq($"__lid"), Seq($"qt".desc_nulls_last))
      .select($"sym", $"t", $"px", $"bid")
      .as[(String, Long, Double, Option[Double])].collect().toSeq)
  }

  test("backward as-of matches the naive latest-earlier formulation") {
    val got = run(trades, quotes)
    assert(got == naive(trades, quotes))
    // spot semantics: inclusive at equal times, null before first quote
    assert(got.contains(("a", 10L, 1.0, Some(0.1)))) // qt == t matches
    assert(got.contains(("a", 30L, 3.0, Some(0.2)))) // 25 <= 30 < 40
    assert(got.contains(("b", 5L, 4.0, None)))       // before first quote
    assert(got.contains(("c", 7L, 6.0, None)))       // key absent on right
  }

  test("nearest as-of picks the closer side, ties to the earlier row") {
    val l = Seq(("a", 1L, 0.0), ("a", 30L, 0.0), ("a", 33L, 0.0),
        ("b", 5L, 0.0), ("t", 15L, 0.0))
      .toDF("sym", "t", "px")
    val r = Seq(("a", 25L, 1.0), ("a", 40L, 2.0),
        ("t", 10L, 3.0), ("t", 20L, 4.0))
      .toDF("qsym", "qt", "bid")
    val got = AsOf.nearestJoin(l, r, Seq("sym"), Seq("qsym"), "t", "qt")
      .select($"sym", $"t", $"bid").orderBy($"sym", $"t")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("a", 1L, Some(1.0)),  // before first quote: forward match
      ("a", 30L, Some(1.0)), // |30-25| < |40-30|
      ("a", 33L, Some(2.0)), // |40-33| < |33-25|
      ("b", 5L, None),       // key absent on right
      ("t", 15L, Some(3.0)))) // equidistant 10/20: earlier wins
  }

  test("result is invariant to input partitioning") {
    val base = run(trades, quotes)
    assert(run(trades.repartition(7), quotes.repartition(3)) == base)
    assert(run(trades.repartition(1), quotes.repartition(13)) == base)
  }

  test("randomized parity with the naive formulation (seeded)") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 5) {
      val keys = Seq("k1", "k2", "k3", "k4")
      val l = Seq.fill(120)((keys(rnd.nextInt(4)), rnd.nextInt(500).toLong,
        rnd.nextDouble())).toDF("sym", "t", "px")
      // right side unique per (key, time): equal right times would make
      // backward ambiguous in both formulations
      val r = Seq.fill(200)((keys(rnd.nextInt(4)), rnd.nextInt(500).toLong))
        .distinct.map { case (k, t) => (k, t, rnd.nextDouble()) }
        .toDF("qsym", "qt", "bid")
      val lp = l.repartition(1 + rnd.nextInt(8))
      val rp = r.repartition(1 + rnd.nextInt(8))
      assert(run(lp, rp) == naive(l, r), s"round $round")
    }
  }

  test("plans as one AsOfJoinExec with one exchange per side") {
    val df = AsOf.backwardJoin(trades, quotes, Seq("sym"), Seq("qsym"), "t", "qt")
    df.collect() // finalize any adaptive planning
    val plan = df.queryExecution.executedPlan
    assert(collectFirst(plan) { case e: AsOfJoinExec => e }.isDefined, plan)
    val exchanges = collect(plan) {
      case e if e.getClass.getSimpleName.contains("ShuffleExchange") => e
    }
    assert(exchanges.size == 2, plan)
  }
}
