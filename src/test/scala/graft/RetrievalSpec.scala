package graft

import graft.ops.{Retrieval, TextOps}
import org.apache.spark.sql.functions._

/** BM25 scoring math, RRF fusion, and incremental LSH candidate
  * generation (the new-batch-vs-frozen-corpus contract). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def tokRows(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text").select($"doc_id".as("doc"),
      explode(TextOps.tokens($"text")).as("token"))

  test("bm25 matches a hand-computed score on a 3-doc corpus") {
    // corpus: dl = 4, 2, 3; avgdl = 3; "cat" appears in docs 1 (tf 2) and 2 (tf 1)
    val tok = tokRows(Seq(
      (1L, "cat cat dog fish"),
      (2L, "cat bird"),
      (3L, "dog fish bird")))
    val (postings, dfreq, stats) = Retrieval.bm25Index(tok)
    val scored = Retrieval.bm25Scores(postings, dfreq, stats,
        Seq((0L, "cat")).toDF("qid", "token"))
      .as[(Long, Long, Double)].collect().map(r => (r._2, r._3)).toMap
    // idf = ln(1 + (3 - 2 + 0.5) / (2 + 0.5)) = ln(1.6)
    val idf = math.log(1.6)
    def bm(tf: Long, dl: Long): Double =
      math.rint(idf * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * dl / 3.0)) * 1e6) / 1e6
    assert(scored.keySet == Set(1L, 2L))
    assert(math.abs(scored(1L) - bm(2, 4)) < 1e-9)
    assert(math.abs(scored(2L) - bm(1, 2)) < 1e-9)
  }

  test("bm25 ranks a rare term above a common one at equal tf") {
    // "rare" in 1 of 4 docs, "common" in all 4 — idf must dominate
    val tok = tokRows(Seq(
      (1L, "rare common pad"),
      (2L, "common pad pad"),
      (3L, "common pad pad"),
      (4L, "common pad pad")))
    val (postings, dfreq, stats) = Retrieval.bm25Index(tok)
    val s = Retrieval.bm25Scores(postings, dfreq, stats,
        Seq((0L, "rare"), (1L, "common")).toDF("qid", "token"))
      .as[(Long, Long, Double)].collect()
    val rareOn1 = s.find(r => r._1 == 0L && r._2 == 1L).get._3
    val commonOn1 = s.find(r => r._1 == 1L && r._2 == 1L).get._3
    assert(rareOn1 > commonOn1)
  }

  test("maxDf elides stop-terms before the postings join") {
    // "the" is in all 4 docs; "rare" in one — a query mixing both must
    // score on "rare" alone once the stop-term is elided
    val tok = tokRows(Seq(
      (1L, "the rare cat"),
      (2L, "the dog"),
      (3L, "the dog"),
      (4L, "the dog")))
    val (postings, dfreq, stats) = Retrieval.bm25Index(tok)
    val qt = Seq((0L, "the"), (0L, "rare")).toDF("qid", "token")
    val capped = Retrieval.bm25Scores(postings, dfreq, stats, qt,
        maxDf = Some(3L))
      .as[(Long, Long, Double)].collect()
    // only doc 1 has a surviving query term; docs 2-4 matched only "the"
    assert(capped.map(_._2).toSet == Set(1L))
    val uncapped = Retrieval.bm25Scores(postings, dfreq, stats, qt)
      .as[(Long, Long, Double)].collect()
    assert(uncapped.map(_._2).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("rrfFuse sums reciprocal ranks over the rankings that retrieved") {
    val a = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("qid", "doc", "rank")
    val b = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("qid", "doc", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b))
      .as[(Long, Long, Double)].collect().map(r => (r._2, r._3)).toMap
    def rr(rank: Int) = math.rint(1.0 / (60 + rank) * 1e9) / 1e9
    assert(math.abs(fused(11L) - (rr(2) + rr(1))) < 1e-12) // consensus doc
    assert(math.abs(fused(10L) - rr(1)) < 1e-12) // one-ranker doc
    assert(math.abs(fused(12L) - rr(2)) < 1e-12)
    // the consensus doc must outrank both single-ranker docs
    assert(fused(11L) > fused(10L) && fused(11L) > fused(12L))
  }

  test("jaccardQbe computes |Q∩D| / |Q∪D| over distinct token sets") {
    val dt = tokRows(Seq(
      (0L, "a b c"),
      (1L, "a b d"),
      (2L, "x y z"))).distinct()
    val qd = Seq(Tuple1(0L)).toDF("qid")
    val j = Retrieval.jaccardQbe(dt, qd)
      .as[(Long, Long, Double)].collect().map(r => (r._2, r._3)).toMap
    assert(math.abs(j(1L) - 0.5) < 1e-9) // {a,b} / {a,b,c,d}
    assert(!j.contains(2L)) // no shared token -> no pair generated
  }

  test("hardNegatives drops positives and re-ranks the remainder densely") {
    val scored = Seq(
      (0L, 10L, 5.0), (0L, 11L, 4.0), (0L, 12L, 3.0), (0L, 13L, 2.0),
      (1L, 10L, 9.0), (1L, 11L, 8.0))
      .toDF("qid", "doc", "score")
    // doc 10 is a positive for query 0 only — it must survive for query 1
    val pos = Seq((0L, 10L)).toDF("qid", "doc")
    val negs = Retrieval.hardNegatives(scored, pos, k = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(negs == Set(
      (0L, 11L, 4.0, 1), (0L, 12L, 3.0, 2), // rank 1 starts after the drop
      (1L, 10L, 9.0, 1), (1L, 11L, 8.0, 2)))
  }

  test("tokenBudgetSelect takes whole bins above the cut, prefix of the boundary bin") {
    import graft.ops.Sampling
    // quality bins (gran 10): 0.9->9, 0.8->8, 0.7->7; 115 tokens total
    // budget = 115 div 2 = 57: bin 9 fits whole (40), bin 8 is boundary
    val q = Seq(
      (1L, 40L, 0.9), (2L, 25L, 0.8), (3L, 10L, 0.8), (4L, 40L, 0.7))
      .toDF("doc", "n_tokens", "quality")
    val sel = Sampling.tokenBudgetSelect(q, num = 1, den = 2)
      .as[(Long, Double, Long)].collect().map(_._1).toSet
    // remaining budget in bin 8 = 57 - 40 = 17; the prefix sum includes
    // the current row, so doc 2 (run 25) already exceeds it
    assert(sel == Set(1L))
    // a laxer budget (115*3 div 4 = 86) admits bin 8 whole, bin 7 is out
    val sel2 = Sampling.tokenBudgetSelect(q, num = 3, den = 4)
      .as[(Long, Double, Long)].collect().map(_._1).toSet
    assert(sel2 == Set(1L, 2L, 3L)) // spent 75 <= 86; doc 4 (40) exceeds
  }

  test("tokenBudgetSelect edges: budget below every bin, budget above the corpus") {
    import graft.ops.Sampling
    val q = Seq((1L, 30L, 0.5), (2L, 20L, 0.5), (3L, 10L, 0.4))
      .toDF("doc", "n_tokens", "quality")
    // budget 6 tokens: no bin fits whole; greedy prefix of the TOP bin
    // by (quality desc, doc) admits nothing (doc 1's 30 > 6)
    val tiny = Sampling.tokenBudgetSelect(q, num = 1, den = 10)
      .as[(Long, Double, Long)].collect()
    assert(tiny.isEmpty)
    // budget = everything: all docs selected
    val all = Sampling.tokenBudgetSelect(q, num = 1, den = 1)
      .as[(Long, Double, Long)].collect().map(_._1).toSet
    assert(all == Set(1L, 2L, 3L))
  }

  test("incremental LSH candidates never pair two old docs") {
    // one shared signature across four docs: 1,2 old; 3,4 new
    val bands = Seq(
      (1L, 0, 42L, false), (2L, 0, 42L, false),
      (3L, 0, 42L, true), (4L, 0, 42L, true))
      .toDF("doc", "band", "sig", "is_new")
    val pairs = Retrieval.incrementalLshCandidates(bands)
      .as[(Long, Long)].collect().toSet
    // new x old (both directions collapse to new-first), new x new once
    assert(pairs == Set((3L, 1L), (3L, 2L), (4L, 1L), (4L, 2L), (3L, 4L)))
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 1L)))
  }

  test("incremental candidates equal the full join restricted to new docs") {
    // randomized-ish corpus: docs 0..19, text repeats in pairs so LSH fires
    val docs = (0L until 20L).map(i => (i, s"w${i / 2} x y z w${i / 2}"))
    val sh = docs.toDF("doc_id", "text")
      .withColumn("ts", TextOps.tokens($"text"))
      .select($"doc_id", explode(TextOps.shingles("ts", 2)).as("s"))
      .distinct()
    val mh = TextOps.minhash(sh, $"doc_id", $"s", k = 4)
    val full = TextOps.lshCandidates(mh, r = 2)
      .as[(Long, Long)].collect().toSet
    val bands = TextOps.bandSignatures(mh, r = 2)
      .withColumn("is_new", col("doc") % 2 === 1)
    val inc = Retrieval.incrementalLshCandidates(bands)
      .as[(Long, Long)].collect().toSet
    // normalize into (min,max) pairs; the incremental set must be exactly
    // the full pairs touching at least one new doc
    val incNorm = inc.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val expect = full.filter { case (a, b) => a % 2 == 1 || b % 2 == 1 }
    assert(incNorm == expect)
    assert(inc.forall { case (d1, _) => d1 % 2 == 1 }) // d1 always new
  }

  test("phraseMatches: anchor-vote intersection, overlaps, and absences") {
    val docsDf = Seq(
      (1L, "a b c a b c"),     // "a b c" at 0 and 3; "b c" at 1 and 4
      (2L, "a a a a"),          // "a a" overlapping at 0,1,2
      (3L, "b c a"),            // "a b c" absent (wrong order)
      (4L, "a b"))              // too short for "a b c"
      .toDF("doc_id", "text")
    val postings = docsDf.select(col("doc_id").as("doc"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "token")))
    val phrases = Seq(
      (0L, "a b c", 0, "a", 3L), (0L, "a b c", 1, "b", 3L),
      (0L, "a b c", 2, "c", 3L),
      (1L, "a a", 0, "a", 2L), (1L, "a a", 1, "a", 2L))
      .toDF("pid", "phrase", "j", "term", "len")
    val got = Retrieval.phraseMatches(postings, phrases)
      .as[(Long, String, Long, Long, Int)].collect()
      .map(r => (r._1, r._3) -> ((r._4, r._5))).toMap
    assert(got((0L, 1L)) == ((2L, 0)))  // two occurrences, first at 0
    assert(got((1L, 2L)) == ((3L, 0)))  // overlapping occurrences all count
    // doc 1 has "a" only at 0 and 3 — never adjacent, so no "a a" match;
    // wrong order (doc 3) and too short (doc 4) also produce nothing
    assert(!got.contains((1L, 1L)))
    assert(!got.contains((0L, 3L)) && !got.contains((0L, 4L)))
  }
}
