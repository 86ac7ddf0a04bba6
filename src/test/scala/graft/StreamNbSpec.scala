package graft

import graft.ops.{LmScore, TextOps}
import graft.streaming.{DocEvent, StreamNb}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming NB scoring: bit-parity with the batch operator against
  * the same frozen model, across micro-batches. */
class StreamNbSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val sf = "/root/testdata/sf0.001"

  test("streamed NB scores are bit-identical to the batch operator") {
    val docs = Tables(spark, sf, "documents")
    def ts = TextOps.tokens($"text")
    val isPos = (size(ts) >= 20) and
      (aggregate(transform(ts, t => length(t).cast("double")),
        lit(0.0), (a, x) => a + x) / size(ts).cast("double") >= 3.5)
    val expected = LmScore
      .nbScore(docs, $"doc_id", $"text", isPos, vocabK = 50)
      .orderBy($"doc")
      .as[(Long, Long, Double, String)].collect().toSeq
    val m = LmScore.nbModel(docs, $"doc_id", $"text", isPos, vocabK = 50)
    val vocabSet = m.vocab.select($"w").as[String].collect().toSet
    val llrMap = m.llr.as[(String, Double)].collect().toMap
    val prior = m.prior.as[Double].collect().head
    val events = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.map { case (d, t) => DocEvent(d, t) }
    val in = MemoryStream[DocEvent]
    val q = StreamNb.score(in.toDS(), vocabSet, llrMap, prior)
      .writeStream.format("memory").queryName("snb_out")
      .outputMode("append").start()
    try {
      in.addData(events.take(events.size / 2)); q.processAllAvailable()
      in.addData(events.drop(events.size / 2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("snb_out").orderBy($"doc")
      .as[(Long, Long, Double, String)].collect().toSeq
    assert(streamed.size == expected.size)
    assert(streamed.map(r => java.lang.Double.doubleToLongBits(r._3)) ==
      expected.map(r => java.lang.Double.doubleToLongBits(r._3)))
    assert(streamed == expected)
    // both labels must occur or the parity proves nothing
    assert(streamed.map(_._4).distinct.sorted == Seq("bad", "good"))
  }

  test("OOV with no <unk> event and empty docs follow the inner-join contract") {
    // model trained where every token is in-vocab: no <unk> row exists
    val in = MemoryStream[DocEvent]
    val q = StreamNb.score(in.toDS(), Set("a", "b"),
        Map("a" -> 0.5, "b" -> -0.25), prior = 0.1)
      .writeStream.format("memory").queryName("snb_edge")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        DocEvent(1L, "zzz yyy xxx"), // all OOV, no <unk> row -> no output
        DocEvent(2L, "a b zzz")))    // zzz dropped; n_tokens = 2
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("snb_edge")
      .as[(Long, Long, Double, String)].collect().toSeq
    assert(got.map(_._1) == Seq(2L))
    assert(got.head._2 == 2L)
    assert(got.head._3 == 0.1 + 0.25 && got.head._4 == "good")
  }
}
