package graft

import graft.ops.LmScore
import graft.streaming.{DocEvent, StreamDsir}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming DSIR scoring: bit-parity with the batch operator against
  * the same frozen model, across micro-batches. */
class StreamDsirSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val B = 1024
  // the training corpus: an English-ish target slice + background
  private lazy val corpus = ((1L to 6L).map(i =>
      (i, s"the quick fox ${i % 2} jumps high", true)) ++
    (7L to 12L).map(i =>
      (i, s"roca piedra hierro $i carbon viento", false)))
    .toDF("doc_id", "text", "is_en")

  private lazy val modelMap: Map[Long, Double] =
    LmScore.dsirModel(corpus, $"doc_id", $"text", $"is_en", B)
      .as[(Long, Double)].collect().toMap // bounded: ≤ B rows by design

  test("streamed scores are bit-identical to the batch operator") {
    val expected = LmScore
      .dsirLogWeights(corpus, $"doc_id", $"text", $"is_en", B)
      .orderBy($"doc")
      .as[(Long, Long, Double, String)].collect().toSeq
    val events = corpus.select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq
      .map { case (d, t) => DocEvent(d, t) }
    val in = MemoryStream[DocEvent]
    val q = StreamDsir.score(in.toDS(), modelMap, B)
      .writeStream.format("memory").queryName("sdsir_out")
      .outputMode("append").start()
    try {
      in.addData(events.take(5)); q.processAllAvailable()
      in.addData(events.drop(5)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sdsir_out")
      .orderBy($"doc").as[(Long, Long, Double, String)].collect().toSeq
    assert(streamed.map(_._1) == expected.map(_._1))
    assert(streamed.map(r => java.lang.Double.doubleToLongBits(r._3)) ==
      expected.map(r => java.lang.Double.doubleToLongBits(r._3)))
    assert(streamed == expected)
  }

  test("unseen buckets and short docs follow the batch inner-join contract") {
    val in = MemoryStream[DocEvent]
    val q = StreamDsir.score(in.toDS(), modelMap, B)
      .writeStream.format("memory").queryName("sdsir_edge")
      .outputMode("append").start()
    try {
      in.addData(
        DocEvent(100L, "one-token"),                 // < 2 tokens: no row
        DocEvent(101L, "zzz qqq yyy xxx"),           // all buckets unseen
        DocEvent(102L, "the quick zzz qqq"))         // mixed coverage
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sdsir_edge")
      .as[(Long, Long, Double, String)].collect().toSeq.sortBy(_._1)
    // 100/101 emit nothing; 102 counts only its model-covered bigram
    assert(rows.map(_._1) == Seq(102L))
    assert(rows.head._2 == 1L)
  }
}
