package graft

import graft.plans.AsOf
import graft.streaming.{AsOfEvent, StreamAsOf}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming as-of: parity with the batch AsOfJoin plan operator,
  * including state carried across micro-batches and the equal-timestamp
  * (<=) match rule. */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String) = Timestamp.valueOf(s)

  // key a: right quotes at 08:00/08:30, left trades at 08:00 (equal ts
  // -> matches the 08:00 quote), 08:20, and — after the batch split —
  // 08:40 (must match the 08:30 quote held in state). key b: a left
  // event before any right -> null-extended.
  private val events = Seq(
    AsOfEvent("a", ts("2024-01-01 08:00:00"), "R", 100L, 10.0),
    AsOfEvent("a", ts("2024-01-01 08:00:00"), "L", 1L, 1.0),
    AsOfEvent("a", ts("2024-01-01 08:20:00"), "L", 2L, 2.0),
    AsOfEvent("b", ts("2024-01-01 08:05:00"), "L", 3L, 3.0),
    AsOfEvent("a", ts("2024-01-01 08:30:00"), "R", 101L, 20.0),
    // ---- batch split ----
    AsOfEvent("a", ts("2024-01-01 08:40:00"), "L", 4L, 4.0),
    AsOfEvent("b", ts("2024-01-01 08:50:00"), "R", 102L, 30.0),
    AsOfEvent("b", ts("2024-01-01 08:55:00"), "L", 5L, 5.0))

  private type Row6 = (String, Long, Timestamp, Double, Option[Timestamp], Option[Double])

  private def batchExpected: Seq[Row6] = {
    val left = events.filter(_.side == "L")
      .map(e => (e.key, e.id, e.ts, e.value)).toDF("key", "l_id", "l_ts", "l_value")
    val right = events.filter(_.side == "R")
      .map(e => (e.key, e.ts, e.value)).toDF("rkey", "r_ts", "r_value")
    AsOf.backwardJoin(left, right, Seq("key"), Seq("rkey"), "l_ts", "r_ts")
      .select($"key", $"l_id", $"l_ts", $"l_value", $"r_ts", $"r_value")
      .orderBy($"key", $"l_id")
      .as[Row6].collect().toSeq
  }

  test("streamed backward as-of matches the batch plan operator across batches") {
    val expected = batchExpected
    val in = MemoryStream[AsOfEvent]
    val q = StreamAsOf.backward(in.toDS())
      .writeStream.format("memory").queryName("sao_out")
      .outputMode("append").start()
    try {
      in.addData(events.take(5)); q.processAllAvailable()
      in.addData(events.drop(5)); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sao_out")
      .orderBy($"key", $"l_id")
      .as[Row6].collect().toSeq
    assert(streamed == expected)
    // the cross-batch case specifically: left id=4 matched the quote
    // from the previous micro-batch
    assert(streamed.exists(r => r._2 == 4L && r._6.contains(20.0)))
  }

  test("cross-batch stragglers degrade to no-match, never a wrong match") {
    val in = MemoryStream[AsOfEvent]
    val q = StreamAsOf.backward(in.toDS())
      .writeStream.format("memory").queryName("sao_late")
      .outputMode("append").start()
    try {
      in.addData(AsOfEvent("a", ts("2024-01-01 09:00:00"), "R", 200L, 9.0))
      q.processAllAvailable()
      in.addData(
        // late left: older than the held right -> must NOT match 09:00
        AsOfEvent("a", ts("2024-01-01 08:00:00"), "L", 10L, 1.0),
        // late right: older than state -> must NOT roll state back
        AsOfEvent("a", ts("2024-01-01 07:00:00"), "R", 201L, 7.0))
      q.processAllAvailable()
      in.addData(AsOfEvent("a", ts("2024-01-01 09:30:00"), "L", 11L, 2.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("sao_late")
      .orderBy($"l_id").as[Row6].collect().toSeq
    assert(rows.map(r => (r._2, r._6)) == Seq(
      (10L, None),        // null-extended, not matched to the future 09:00
      (11L, Some(9.0))))  // state still holds 09:00, not the stale 07:00
  }
}
