package graft

import graft.streaming.{BudgetEvent, StreamBudget}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming token-budget admission: greedy per-stratum fold, state
  * carried across micro-batches, matches a reference fold exactly. */
class StreamBudgetSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def referenceFold(evs: Seq[BudgetEvent], budget: Long) =
    evs.groupBy(_.key).toSeq.flatMap { case (k, kevs) =>
      var spent = 0L
      kevs.sortBy(e => (e.t, e.tie)).map { e =>
        val ok = spent + e.n <= budget
        if (ok) spent += e.n
        (k, e.t, e.tie, e.doc, e.n, ok, spent)
      }
    }.sortBy(r => (r._1, r._2, r._3))

  private val events = Seq(
    BudgetEvent(1L, 10L, 1L, 101L, 40L),
    BudgetEvent(1L, 20L, 2L, 102L, 50L),
    BudgetEvent(2L, 10L, 1L, 201L, 99L),
    // ---- batch split ----
    BudgetEvent(1L, 30L, 3L, 103L, 20L), // 40+50+20 > 100: rejected
    BudgetEvent(1L, 40L, 4L, 104L, 10L), // but 10 still fits (greedy)
    BudgetEvent(2L, 20L, 2L, 202L, 2L))  // 99+2 > 100: rejected

  test("greedy admission matches the reference fold across micro-batches") {
    val in = MemoryStream[BudgetEvent]
    val q = StreamBudget.admit(in.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("sbudget_out")
      .outputMode("append").start()
    try {
      in.addData(events.take(3)); q.processAllAvailable()
      in.addData(events.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sbudget_out")
      .orderBy($"key", $"t", $"tie")
      .as[(Long, Long, Long, Long, Long, Boolean, Long)].collect().toSeq
    assert(got == referenceFold(events, 100L))
    // the semantics the comments promise
    val byDoc = got.map(r => r._4 -> r._6).toMap
    assert(!byDoc(103L) && byDoc(104L) && !byDoc(202L))
  }

  test("a rejected doc does not consume budget") {
    val in = MemoryStream[BudgetEvent]
    val q = StreamBudget.admit(in.toDS(), budget = 10L)
      .writeStream.format("memory").queryName("sbudget_keep")
      .outputMode("append").start()
    try {
      in.addData(
        BudgetEvent(1L, 1L, 1L, 1L, 8L),
        BudgetEvent(1L, 2L, 2L, 2L, 5L),  // rejected: 8+5 > 10
        BudgetEvent(1L, 3L, 3L, 3L, 2L))  // admitted: 8+2 <= 10
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sbudget_keep").orderBy($"t")
      .as[(Long, Long, Long, Long, Long, Boolean, Long)].collect().toSeq
    assert(got.map(_._6) == Seq(true, false, true))
    assert(got.map(_._7) == Seq(8L, 8L, 10L))
  }

  test("zero budget rejects everything, state stays at zero") {
    val in = MemoryStream[BudgetEvent]
    val q = StreamBudget.admit(in.toDS(), budget = 0L)
      .writeStream.format("memory").queryName("sbudget_zero")
      .outputMode("append").start()
    try {
      in.addData(BudgetEvent(1L, 1L, 1L, 1L, 1L)); q.processAllAvailable()
      in.addData(BudgetEvent(1L, 2L, 2L, 2L, 1L)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sbudget_zero")
      .as[(Long, Long, Long, Long, Long, Boolean, Long)].collect().toSeq
    assert(got.forall(r => !r._6 && r._7 == 0L))
  }
}
