package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

class GopherSpec extends SparkSpec {
  import spark.implicits._

  private val stops = Seq("the", "of", "and")

  private def run(texts: Seq[(Long, String)], minWords: Long = 5) =
    TextOps.gopherRules(texts.toDF("doc_id", "text"), $"doc_id", $"text",
        minWords = minWords, maxWords = 1000, stopwords = stops)
      .orderBy($"doc")
      .collect()

  test("rules fire in the paper's order; a clean doc is kept") {
    val clean = "the quick brown fox jumps over rivers of deep grass and stone"
    val short = "too short here"
    val symbols = "the of and " + Seq.fill(9)("##tag##").mkString(" ")
    val numeric = "the of and 1111 2222 3333 4444 5555 6666 7777 8888 9999"
    val noStops = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val got = run(Seq(1L -> clean, 2L -> short, 3L -> symbols,
      4L -> numeric, 5L -> noStops))
      .map(r => r.getAs[Long]("doc") -> r.getAs[String]("decision")).toMap
    assert(got(1L) == "kept")
    assert(got(2L) == "word_count")
    assert(got(3L) == "symbol_ratio")
    assert(got(4L) == "alpha_fraction")
    assert(got(5L) == "stopwords")
  }

  test("mean word length band rejects both extremes") {
    val tiny = "a b c d e f g h i j k l"
    val huge = Seq.fill(12)("thisisaveryverylongtoken").mkString(" ")
    val got = run(Seq(1L -> tiny, 2L -> huge))
      .map(r => r.getAs[Long]("doc") -> r.getAs[String]("decision")).toMap
    assert(got(1L) == "mean_word_length")
    assert(got(2L) == "mean_word_length")
  }

  test("stop hits count DISTINCT lexicon words") {
    val repeated = "the the the the the quick brown foxes running fast today"
    val got = run(Seq(1L -> repeated))
    assert(got(0).getAs[Long]("n_stop_hits") == 1L)
    assert(got(0).getAs[String]("decision") == "stopwords")
  }
}
