package graft

import graft.ops.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(texts: Seq[(Long, String)], k: Int = 2, m: Int = 4) =
    Cdc.chunks(texts.toDF("doc_id", "text"), $"doc_id", $"text", k, m)

  test("chunks partition the token stream exactly") {
    val text = (1 to 120).map(i => s"t${i % 37}").mkString(" ")
    val ch = chunksOf(Seq(1L -> text)).collect()
    assert(ch.map(_.getAs[Long]("n_tokens")).sum == 120)
    // chunk ids are 0..n-1 dense
    val ids = ch.map(_.getAs[Long]("chunk")).sorted
    assert(ids.toSeq == (0L until ids.length).toSeq)
  }

  test("boundaries are content-defined: a prefix insertion re-chunks only the head") {
    val body = (1 to 200).map(i => s"w${i % 53}").mkString(" ")
    val a = chunksOf(Seq(1L -> body)).select($"h").as[Long].collect().toSet
    val b = chunksOf(Seq(1L -> s"inserted byline tokens $body"))
      .select($"h").as[Long].collect().toSet
    // most chunk hashes survive the shift (fixed-size chunking would share none)
    val shared = a.intersect(b).size
    assert(shared >= (a.size * 0.6).toInt, s"shared $shared of ${a.size}")
  }

  test("dedup profile flags cross-document shared chunks only") {
    val shared = (1 to 80).map(i => s"s${i % 41}").mkString(" ")
    val ch = chunksOf(Seq(
      1L -> s"$shared unique tail one alpha beta gamma delta",
      2L -> s"$shared different ending here entirely other words",
      3L -> "totally disjoint content with no overlap at all present"))
    val prof = Cdc.chunkDedupProfile(ch)
      .orderBy($"doc").collect()
    val d1 = prof(0); val d3 = prof(2)
    assert(d1.getAs[Long]("n_shared") >= 1)
    assert(d1.getAs[Double]("shared_token_frac") > 0.3)
    assert(d3.getAs[Long]("n_shared") == 0)
    assert(d3.getAs[Double]("shared_token_frac") == 0.0)
  }

  test("expected chunk length tracks m") {
    val text = (1 to 600).map(i => s"v${i % 97}").mkString(" ")
    val n = chunksOf(Seq(1L -> text), k = 2, m = 8).count()
    // ~600/8 = 75 chunks; allow wide slack for hash variance
    assert(n > 25 && n < 200, s"n=$n")
  }
}
