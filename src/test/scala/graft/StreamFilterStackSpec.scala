package graft

import graft.ops.LmScore
import graft.queries.Registry
import graft.streaming.{DocEvent, StreamFilterStack}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Online filter stack: bit-parity with the q131 batch decision table
  * on the real sf0.001 documents, across micro-batches. */
class StreamFilterStackSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val sf = "/root/testdata/sf0.001"

  test("streamed verdicts are bit-identical to the batch q131 table") {
    val expected = Registry.runMap("q131_filter_stack")(spark, sf)
      .as[(Long, Int, Int, Int, Int, String)].collect().toSeq
    // freeze the q131-equivalent model (vocabK = 50) from the same corpus
    val docs = Tables(spark, sf, "documents")
    val frames = LmScore.lmModel(docs, $"doc_id", $"text", vocabK = 50)
    val vocabSet = frames.vocab.select($"w").as[String].collect().toSet
    val c1 = frames.c1.as[(String, Long)].collect().toMap
    val c2 = frames.c2.as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val events = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.map { case (d, t) => DocEvent(d, t) }
    val in = MemoryStream[DocEvent]
    val q = StreamFilterStack.decide(in.toDS(), vocabSet, c1, c2, vocabK = 50)
      .writeStream.format("memory").queryName("sfs_out")
      .outputMode("append").start()
    try {
      in.addData(events.take(events.size / 2)); q.processAllAvailable()
      in.addData(events.drop(events.size / 2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sfs_out").orderBy($"doc_id")
      .as[(Long, Int, Int, Int, Int, String)].collect().toSeq
    assert(streamed.size == expected.size)
    assert(streamed == expected)
    // every decision class should actually occur on this fixture — a
    // parity test over an all-"kept" table would prove nothing
    assert(streamed.map(_._6).distinct.size >= 3,
      s"fixture too uniform: ${streamed.map(_._6).distinct}")
  }

  test("edge docs: empty text is short; repeated phrase is repetition") {
    val in = MemoryStream[DocEvent]
    val q = StreamFilterStack.decide(in.toDS(), Set("a"), Map("a" -> 1L),
        Map(("a", "a") -> 1L), vocabK = 1)
      .writeStream.format("memory").queryName("sfs_edge")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        DocEvent(1L, ""),
        DocEvent(2L, Seq.fill(30)("spam phrase").mkString(" ") +
          " padded with words so the doc is long enough to pass length")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sfs_edge").orderBy($"doc_id")
      .as[(Long, Int, Int, Int, Int, String)].collect().toSeq
    assert(got(0)._6 == "short")
    assert(got(1)._4 == 1 && got(1)._6 == "repetition")
  }
}
