package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's widen adjudication plan ([[Bench.widenPlan]]
  * — r14 verdict #1c): the unbounded widen rule amplified a disturbed
  * host's noise (~15 graph rows over the 2× bar) into extra passes of
  * the SLOWEST queries and the driver's rc=124 timeout. The plan must
  * (a) trigger exactly on the health bar, (b) never widen a row whose
  * median is already past the ceiling — extra passes there buy minutes
  * to adjudicate noise the median out-votes, (c) spend the wall cap
  * cheapest-first, and (d) never touch a crashed row. Pure logic — no
  * SparkSession. */
class BenchSpec extends AnyFunSuite {

  test("health-bar trigger: >2x spread above the 0.5s jitter floor") {
    val runs = Seq(
      Vector(1.0, 1.1, 1.05), // stable — not a candidate
      Vector(1.0, 2.5, 1.1),  // 2.5x spread — widened
      Vector(0.1, 0.4, 0.12), // noisy but sub-0.5s — jitter, exempt
      Vector(2.0, 2.0))       // flat — not a candidate
    val (order, skipped) = Bench.widenPlan(runs, 15.0, 240.0)
    assert(order == Seq(1) && skipped.isEmpty)
  }

  test("median ceiling: a slow noisy row with >=3 samples is skipped, not re-run") {
    val runs = Seq(
      Vector(9.2, 95.9, 8.8),   // r14's q224 shape: median 9.2 — widened
      Vector(60.4, 12.4, 30.2)) // median 30.2 > 15 — skipped (2 min to adjudicate noise)
    val (order, skipped) = Bench.widenPlan(runs, 15.0, 240.0)
    assert(order == Seq(0) && skipped == Seq(1))
  }

  test("a slow noisy 2-sample row is still widened (ADVICE r15)") {
    // the r15 full-tier 27s 'median' shape: 2 kept passes, one
    // steal-hit — there is no majority for the ceiling to defer to,
    // so the row must be adjudicated despite its median being > 15
    val runs = Seq(Vector(11.2, 43.7))
    val (order, skipped) = Bench.widenPlan(runs, 15.0, 240.0)
    assert(order == Seq(0) && skipped.isEmpty)
  }

  test("wall cap spends cheapest-first and drops the overflow") {
    // medians 2, 4, 10 -> est extra wall 4, 8, 20; cap 13 fits 4+8 only
    val runs = Seq(
      Vector(10.0, 25.0, 10.5),
      Vector(2.0, 5.0, 2.1),
      Vector(4.0, 9.0, 4.2))
    val (order, skipped) = Bench.widenPlan(runs, 15.0, 13.0)
    assert(order == Seq(1, 2) && skipped == Seq(0))
  }

  test("a crashed row is never a candidate") {
    val runs = Seq(Vector(1.0, -1.0, 3.0))
    val (order, skipped) = Bench.widenPlan(runs, 15.0, 240.0)
    assert(order.isEmpty && skipped.isEmpty)
  }

  test("no candidates -> empty plan") {
    val (order, skipped) =
      Bench.widenPlan(Seq(Vector(1.0, 1.0), Vector(0.2, 0.3)), 15.0, 240.0)
    assert(order.isEmpty && skipped.isEmpty)
  }
}
