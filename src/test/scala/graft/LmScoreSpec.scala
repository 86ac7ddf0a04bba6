package graft

import graft.ops.LmScore
import org.apache.spark.sql.functions._

/** Model-based selection: bigram-LM perplexity and DSIR importance
  * weights on hand-checkable corpora. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("lmScore reproduces the hand-computed add-one bigram NLL") {
    // vocab (top-2) = {a, b}; c maps to <unk>.
    // mapped: doc1 = a b a b, doc2 = a b <unk>
    // c1: a=3 b=3 <unk>=1; c2: (a,b)=3 (b,a)=1 (b,<unk>)=1; smooth = 3
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = LmScore.lmScore(docs, $"doc_id", $"text",
        vocabK = 2, pplFlag = 2.0)
      .select($"doc", $"n_bigrams", $"nll", $"ppl", $"decision")
      .orderBy($"doc").as[(Long, Long, Double, Double, String)].collect()

    val pAB = r6(math.log(4.0 / 6.0)) // (c2+1)/(c1(a)+3)
    val pBA = r6(math.log(2.0 / 6.0))
    val pBU = r6(math.log(2.0 / 6.0))
    val nll1 = -(pAB + pBA + pAB) / 3.0
    val nll2 = -(pAB + pBU) / 2.0
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0)._2 == 3L && out(1)._2 == 2L)
    assert(math.abs(out(0)._3 - nll1) < 1e-12)
    assert(math.abs(out(1)._3 - nll2) < 1e-12)
    assert(out(0)._4 == r6(math.exp(nll1)))
    // doc2 (with the OOV) is the higher-perplexity one
    assert(out(1)._4 > out(0)._4)
    assert(out(0)._5 == "kept" && out(1)._5 == "flagged")
  }

  test("lmScore drops docs with fewer than two tokens") {
    val docs = Seq((1L, "only"), (2L, "two tokens")).toDF("doc_id", "text")
    val got = LmScore.lmScore(docs, $"doc_id", $"text", 10, 1e9)
      .select($"doc").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("dsir: target == corpus gives identically zero log-weights") {
    val docs = Seq((1L, "a b c d"), (2L, "c d e f"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val out = LmScore.dsirLogWeights(docs, $"doc_id", $"text",
        lit(true), buckets = 16)
      .as[(Long, Long, Double, String)].collect()
    assert(out.length == 3)
    assert(out.forall(_._3 == 0.0))
    assert(out.forall(_._4 == "rest")) // 0 is not > 0: nothing selected
  }

  test("dsir separates target-like from corpus-unlike documents") {
    // targets share bigrams drawn from one phrase; the others are
    // disjoint — a target doc must score positive, the rest negative
    // buckets ≫ distinct bigrams so bucket collisions (which blur the
    // two distributions together — correct DSIR behavior, wrong test
    // fixture) are unlikely; the fixture is deterministic either way
    val tgt = (1L to 4L).map(i => (i, "alpha beta gamma delta", true))
    val bg = (5L to 8L).map(i => (i, s"rock$i stone$i iron$i coal$i", false))
    val docs = (tgt ++ bg).toDF("doc_id", "text", "is_en")
    val out = LmScore.dsirLogWeights(docs, $"doc_id", $"text",
        $"is_en", buckets = 4096)
      .as[(Long, Long, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    (1L to 4L).foreach { i =>
      assert(out(i)._3 > 0.0, s"target doc $i not positive")
      assert(out(i)._4 == "selected")
    }
    (5L to 8L).foreach { i =>
      assert(out(i)._3 < 0.0, s"background doc $i not negative")
      assert(out(i)._4 == "rest")
    }
  }

  test("lmScore and dsir yield empty output on an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(LmScore.lmScore(empty, $"doc_id", $"text", 5, 1.0).count() == 0)
    assert(LmScore.dsirLogWeights(empty, $"doc_id", $"text",
      lit(true), 16).count() == 0)
  }

  test("dsir with an empty target slice still scores (pure smoothing)") {
    // nt = 0: every bucket's target prob is the smoothing floor
    // 1/(0+B); weights are finite and negative for observed buckets
    val docs = Seq((1L, "a b c"), (2L, "c d e")).toDF("doc_id", "text")
    val out = LmScore.dsirLogWeights(docs, $"doc_id", $"text",
        lit(false), 64)
      .as[(Long, Long, Double, String)].collect()
    assert(out.length == 2)
    assert(out.forall(r => !r._3.isNaN && !r._3.isInfinite))
    assert(out.forall(_._4 == "rest"))
  }

  test("lmScore and dsir are invariant to input partitioning") {
    val docs = (1L to 40L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 2} tail"))
      .toDF("doc_id", "text")
    def lmRows(df: org.apache.spark.sql.DataFrame) =
      LmScore.lmScore(df, $"doc_id", $"text", 5, 10.0)
        .select($"doc", $"n_bigrams", $"nll", $"nll_num", $"decision")
        .as[(Long, Long, Double, Double, String)].collect().toSet
    def dsRows(df: org.apache.spark.sql.DataFrame) =
      LmScore.dsirLogWeights(df, $"doc_id", $"text",
          $"doc_id" % 2 === 0, 32)
        .as[(Long, Long, Double, String)].collect().toSet
    assert(lmRows(docs) == lmRows(docs.repartition(13)))
    assert(dsRows(docs) == dsRows(docs.repartition(13)))
  }

  test("nbScore separates classes by vocabulary and generalizes past labels") {
    // good docs speak "signal"; bad docs speak "noise"; labels are a
    // per-doc flag the classifier must distill into word likelihoods
    val docs = ((1L to 10L).map(i => (i, "signal clean prose text here", true)) ++
      (11L to 20L).map(i => (i, "noise spam junk garbage here", false)) ++
      // held-out docs: label says bad (excluded from pos class) but the
      // VOCABULARY is good-class — a word-level model must score it good
      Seq((21L, "signal clean prose text extra", false)))
      .toDF("doc_id", "text", "pos")
    val out = LmScore.nbScore(docs, $"doc_id", $"text", $"pos", vocabK = 20)
      .as[(Long, Long, Double, String)].collect().map(r => r._1 -> r._4).toMap
    (1L to 10L).foreach(i => assert(out(i) == "good", s"doc $i"))
    (11L to 20L).foreach(i => assert(out(i) == "bad", s"doc $i"))
    assert(out(21L) == "good", "held-out doc with good vocabulary")
  }

  test("nbScore is invariant to input partitioning") {
    val docs = (1L to 40L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 2} tail"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      LmScore.nbScore(df, $"doc_id", $"text", $"doc_id" % 3 === 0, 5)
        .as[(Long, Long, Double, String)].collect().toSet
    assert(rows(docs) == rows(docs.repartition(13)))
  }
}
