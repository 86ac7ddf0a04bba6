package graft

import graft.ops.{Retrieval, TextOps}
import graft.streaming.{DocEvent, StreamBm25}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming BM25 standing-query routing: bit-parity with the batch
  * operator against the same frozen index, across micro-batches. */
class StreamBm25Spec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val sf = "/root/testdata/sf0.001"

  test("streamed BM25 scores are bit-identical to the batch operator") {
    val docs = Tables(spark, sf, "documents")
    val tok = docs.select($"doc_id".as("doc"),
      explode(TextOps.tokens($"text")).as("token"))
    val (postings, dfreq, stats) = Retrieval.bm25Index(tok)
    val qt = Seq(
      0L -> "dup", 0L -> "spark",
      1L -> "scan", 1L -> "filter", 1L -> "fast")
    val expected = Retrieval
      .bm25Scores(postings, dfreq, stats, qt.toDF("qid", "token"))
      .orderBy($"qid", $"doc")
      .as[(Long, Long, Double)].collect().toSeq

    // freeze the index statistics the stream ships as broadcast values
    val qtermSet = qt.map(_._2).toSet
    val dfMap = dfreq.filter($"token".isin(qtermSet.toSeq: _*))
      .as[(String, Long)].collect().toMap
    val (nDocs, avgdl) = stats.as[(Double, Double)].collect().head
    val standing = qt.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val events = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.map { case (d, t) => DocEvent(d, t) }
    val in = MemoryStream[DocEvent]
    val q = StreamBm25.score(in.toDS(), standing, dfMap, nDocs, avgdl)
      .writeStream.format("memory").queryName("sbm_out")
      .outputMode("append").start()
    try {
      in.addData(events.take(events.size / 2)); q.processAllAvailable()
      in.addData(events.drop(events.size / 2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sbm_out").orderBy($"qid", $"doc")
      .as[(Long, Long, Double)].collect().toSeq
    assert(streamed.size == expected.size && streamed.nonEmpty)
    assert(streamed.map(r => java.lang.Double.doubleToLongBits(r._3)) ==
      expected.map(r => java.lang.Double.doubleToLongBits(r._3)))
    assert(streamed == expected)
  }

  test("docs matching no standing query emit nothing; multi-query docs fan out") {
    val in = MemoryStream[DocEvent]
    // df for terms a (2 docs) and b (1 doc) in a 4-doc, avgdl=3 corpus
    val q = StreamBm25.score(in.toDS(),
        Map(0L -> Set("a"), 1L -> Set("b")),
        Map("a" -> 2L, "b" -> 1L), nDocs = 4.0, avgdl = 3.0)
      .writeStream.format("memory").queryName("sbm_edge")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        DocEvent(1L, "z z z"), // no query term -> no rows
        DocEvent(2L, "a b c"), // matches both standing queries
        DocEvent(3L, "a a a"))) // matches query 0 only
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sbm_edge")
      .as[(Long, Long, Double)].collect().toSet
    assert(!rows.exists(_._2 == 1L))
    assert(rows.count(_._2 == 2L) == 2) // one row per matched query
    assert(rows.count(_._2 == 3L) == 1)
    // rarer term must contribute a higher score at the same tf/dl
    val s2a = rows.find(r => r._1 == 0L && r._2 == 2L).get._3
    val s2b = rows.find(r => r._1 == 1L && r._2 == 2L).get._3
    assert(s2b > s2a)
  }
}
