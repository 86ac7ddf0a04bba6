package graft

import graft.ops.Sessionize
import graft.streaming.{SessionEvent, StreamDedup, StreamSessionize}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming sessionization and dedup: batch/stream parity and
  * cross-batch state carry. */
class StreamSessionizeSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two sessions (65 min gap); user 2: one session; the second
  // session of user 1 SPANS the micro-batch split below, so parity
  // proves state carries across batches.
  private val events = Seq(
    SessionEvent(1L, 1L, ts("2024-01-01 08:00:00"), 1.25),
    SessionEvent(1L, 2L, ts("2024-01-01 08:10:00"), 2.5),
    SessionEvent(2L, 3L, ts("2024-01-01 08:20:00"), 10.0),
    SessionEvent(1L, 4L, ts("2024-01-01 09:15:00"), 0.0078125), // new session
    // ---- batch split ----
    SessionEvent(1L, 5L, ts("2024-01-01 09:30:00"), 4.75),
    SessionEvent(2L, 6L, ts("2024-01-01 08:40:00"), 20.0))

  test("streaming sessions match the batch sessionizer bit-exactly") {
    val batch = Sessionize.sessions(events.toDF(),
        $"user_id", $"ts", $"event_id", $"value", gapSeconds = 1800L)
      .orderBy($"user_id", $"session_id")
      .as[(Long, Long, Long, Timestamp, Timestamp, Option[Double])]
      .collect().toSeq

    val in = MemoryStream[SessionEvent]
    // 2h watermark delay: user 2's 08:40 event arrives in the second
    // micro-batch after the watermark has reached 09:15 — a tighter
    // delay would (correctly) drop it as late and break parity
    val q = StreamSessionize.sessionize(in.toDS(), gapSeconds = 1800L,
        watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("ss_out")
      .outputMode("append").start()
    try {
      in.addData(events.take(4)); q.processAllAvailable()
      in.addData(events.drop(4)); q.processAllAvailable()
      // two sentinel pushes: the first advances the watermark past every
      // open session's timeout, the second triggers the timeout batch
      in.addData(SessionEvent(99L, 900L, ts("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      in.addData(SessionEvent(99L, 901L, ts("2024-01-03 00:00:00"), 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("ss_out")
      .filter($"user_id" < 99L)
      .orderBy($"user_id", $"session_id")
      .as[(Long, Long, Long, Timestamp, Timestamp, Option[Double])]
      .collect().toSeq

    assert(streamed == batch)
    // the dyadic-midpoint value sums survive the fixed-point state carry
    assert(streamed.map(_._6).toSet == batch.map(_._6).toSet)
  }

  test("all-non-finite session sums to NULL, matching the batch decimal path") {
    // user 7: both values NaN/Inf -> batch decimal sum over all-NULL
    // contributions is NULL; user 8: NaN + finite -> finite part only
    val weird = Seq(
      SessionEvent(7L, 1L, ts("2024-01-01 08:00:00"), Double.NaN),
      SessionEvent(7L, 2L, ts("2024-01-01 08:05:00"), Double.PositiveInfinity),
      SessionEvent(8L, 3L, ts("2024-01-01 08:00:00"), Double.NaN),
      SessionEvent(8L, 4L, ts("2024-01-01 08:05:00"), 2.5))
    val batch = Sessionize.sessions(weird.toDF(),
        $"user_id", $"ts", $"event_id", $"value", gapSeconds = 1800L)
      .orderBy($"user_id", $"session_id")
      .as[(Long, Long, Long, Timestamp, Timestamp, Option[Double])]
      .collect().toSeq
    assert(batch.map(t => (t._1, t._3, t._6)) ==
      Seq((7L, 2L, None), (8L, 2L, Some(2.5))))

    val in = MemoryStream[SessionEvent]
    val q = StreamSessionize.sessionize(in.toDS(), gapSeconds = 1800L,
        watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("ss_nan_out")
      .outputMode("append").start()
    try {
      in.addData(weird); q.processAllAvailable()
      in.addData(SessionEvent(99L, 900L, ts("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      in.addData(SessionEvent(99L, 901L, ts("2024-01-03 00:00:00"), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ss_nan_out")
      .filter($"user_id" < 99L)
      .orderBy($"user_id", $"session_id")
      .as[(Long, Long, Long, Timestamp, Timestamp, Option[Double])]
      .collect().toSeq
    assert(streamed == batch)
  }

  test("streaming dedup keeps only the first occurrence across batches") {
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDS().toDF("doc_id", "ts", "text")
    val q = StreamDedup.firstOccurrence(df, "ts", col("text"), "1 hour")
      .writeStream.format("memory").queryName("sd_out")
      .outputMode("append").start()
    try {
      in.addData((1L, ts("2024-01-01 08:00:00"), "alpha beta"))
      in.addData((2L, ts("2024-01-01 08:05:00"), "  ALPHA BETA  ")) // dup after normalize
      q.processAllAvailable()
      in.addData(
        (3L, ts("2024-01-01 08:10:00"), "alpha beta"), // dup from earlier batch
        (4L, ts("2024-01-01 08:15:00"), "gamma delta")) // fresh
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.table("sd_out").select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }
}
