package graft

import graft.ops.{Retrieval, TextOps}
import graft.streaming.{DocEvent, StreamIncDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental dedup: the per-row signature chain must be
  * bit-identical to the batch minhash operators, and the stream-static
  * match must equal q139's new-vs-corpus half. */
class StreamIncDedupSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val sf = "/root/testdata/sf0.001"

  private def mhOf(df: org.apache.spark.sql.DataFrame) = {
    val sh = df.withColumn("ts", TextOps.tokens($"text"))
      .select($"doc_id", explode(TextOps.shingles("ts", 3)).as("sg"))
      .distinct()
    TextOps.minhash(sh, $"doc_id", $"sg", k = 8)
  }

  test("per-row signature is bit-identical to the batch minhash chain") {
    val docs = Tables(spark, sf, "documents").limit(50)
    val batch = mhOf(docs).groupBy($"doc")
      .agg(expr("transform(array_sort(collect_list(struct(j, h))), x -> x.h)")
        .as("mhs"))
      .as[(Long, Seq[Long])].collect().toMap
    val local = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (d, t) => d -> StreamIncDedup.signature(t).toSeq }.toMap
    assert(local.keySet == batch.keySet)
    local.foreach { case (d, sig) => assert(sig == batch(d), s"doc $d") }
  }

  test("stream-static matches equal the batch incremental candidates (old side)") {
    val docs = Tables(spark, sf, "documents")
    val mh = mhOf(docs)
    // batch expected: q139's pipeline, restricted to new-vs-OLD pairs
    val bands = TextOps.bandSignatures(mh, r = 4)
      .withColumn("is_new", col("doc") % 10 === 7)
    val cands = Retrieval.incrementalLshCandidates(bands)
      .filter($"d2" % 10 =!= 7)
    val expected = TextOps.estJaccard(cands, mh, k = 8)
      .filter($"est_jaccard" >= 0.5)
      .as[(Long, Long, Double)].collect().toSet

    val store = StreamIncDedup.corpusStore(
      mh.filter($"doc" % 10 =!= 7)).localCheckpoint()
    val events = docs.filter($"doc_id" % 10 === 7)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (d, t) => DocEvent(d, t) }
    val in = MemoryStream[DocEvent]
    val q = StreamIncDedup.matches(
        StreamIncDedup.bandRows(in.toDS()).toDF(), store, threshold = 0.5)
      .writeStream.format("memory").queryName("sid_out")
      .outputMode("append").start()
    try {
      in.addData(events.take(events.length / 2)); q.processAllAvailable()
      in.addData(events.drop(events.length / 2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sid_out")
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed.map(r => (r._1, r._2)) == expected.map(r => (r._1, r._2)))
    // estimates bit-identical, and exactly one row per pair (the
    // first-agreeing-band filter deduped without state)
    assert(streamed == expected)
    assert(streamed.size ==
      spark.table("sid_out").count())
  }

  test("short docs (< 3 tokens) produce no band rows") {
    val in = MemoryStream[DocEvent]
    val store = StreamIncDedup.corpusStore(
      mhOf(Tables(spark, sf, "documents").limit(20))).localCheckpoint()
    val q = StreamIncDedup.matches(
        StreamIncDedup.bandRows(in.toDS()).toDF(), store, threshold = 0.0)
      .writeStream.format("memory").queryName("sid_edge")
      .outputMode("append").start()
    try {
      in.addData(Seq(DocEvent(900L, "one two"), DocEvent(901L, "  ")))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("sid_edge").count() == 0)
  }
}
