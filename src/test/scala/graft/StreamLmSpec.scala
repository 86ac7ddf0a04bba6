package graft

import graft.ops.LmScore
import graft.streaming.{DocEvent, StreamLm}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming LM scoring: bit-parity with the batch operator against
  * the same frozen model, across micro-batches. */
class StreamLmSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // K covers every training word (17 distinct), so the trained corpus
  // has no <unk> — a streamed OOV then forms genuinely unseen bigrams
  private val K = 20
  private lazy val corpus = ((1L to 5L).map(i =>
      (i, s"the cat sat on the mat ${i % 2}")) ++
    (6L to 10L).map(i => (i, s"dogs run fast and far $i")))
    .toDF("doc_id", "text")

  private lazy val frames =
    LmScore.lmModel(corpus, $"doc_id", $"text", vocabK = K)
  private lazy val vocabSet =
    frames.vocab.select($"w").as[String].collect().toSet // ≤ K rows
  private lazy val c1Map =
    frames.c1.as[(String, Long)].collect().toMap // ≤ K+1 rows
  private lazy val c2Map = frames.c2.as[(String, String, Long)].collect()
    .map { case (a, b, c) => (a, b) -> c }.toMap // ≤ (K+1)² rows

  test("streamed LM scores are bit-identical to the batch operator") {
    val expected = LmScore
      .lmScore(corpus, $"doc_id", $"text", vocabK = K, pplFlag = 8.0)
      .select($"doc", $"n_bigrams", $"nll", $"ppl", $"decision")
      .orderBy($"doc")
      .as[(Long, Long, Double, Double, String)].collect().toSeq
    val events = corpus.as[(Long, String)].collect().toSeq
      .map { case (d, t) => DocEvent(d, t) }
    val in = MemoryStream[DocEvent]
    val q = StreamLm.score(in.toDS(), vocabSet, c1Map, c2Map, K, 8.0)
      .writeStream.format("memory").queryName("slm_out")
      .outputMode("append").start()
    try {
      in.addData(events.take(4)); q.processAllAvailable()
      in.addData(events.drop(4)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("slm_out")
      .orderBy($"doc").as[(Long, Long, Double, Double, String)]
      .collect().toSeq
    assert(streamed.map(_._1) == expected.map(_._1))
    assert(streamed.map(r => java.lang.Double.doubleToLongBits(r._3)) ==
      expected.map(r => java.lang.Double.doubleToLongBits(r._3)))
    assert(streamed.map(r => java.lang.Double.doubleToLongBits(r._4)) ==
      expected.map(r => java.lang.Double.doubleToLongBits(r._4)))
    assert(streamed == expected)
  }

  test("unseen bigrams and short docs follow the batch inner-join contract") {
    val in = MemoryStream[DocEvent]
    val q = StreamLm.score(in.toDS(), vocabSet, c1Map, c2Map, K, 8.0)
      .writeStream.format("memory").queryName("slm_edge")
      .outputMode("append").start()
    try {
      in.addData(
        DocEvent(100L, "solo"),                 // < 2 tokens: no row
        DocEvent(101L, "the cat sat zzz qqq"))  // tail bigrams unseen
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("slm_edge")
      .as[(Long, Long, Double, Double, String)].collect().toSeq
    assert(rows.map(_._1) == Seq(101L))
    // "the cat" and "cat sat" are trained; "sat zzz"/"zzz qqq" are not
    assert(rows.head._2 == 2L)
  }
}
