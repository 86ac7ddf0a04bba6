package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse text retrieval and rank fusion: BM25 over an inverted index,
  * reciprocal-rank fusion of heterogeneous rankers, and incremental
  * (new-batch-vs-frozen-corpus) LSH candidate generation.
  *
  * Scale shapes:
  *  - The BM25 index is three frames (postings, document frequencies,
  *    corpus scalars) built with map-side partial aggregation — one
  *    shuffle each on (doc, token) / doc / token. At 100 TB the index is
  *    built once and persisted; queries never touch the corpus text.
  *  - Query scoring broadcasts the (tiny) query-term table into the
  *    postings list, so only postings of query terms survive the join:
  *    per-query cost follows matched postings, not corpus size. The
  *    score reduction shuffles one row per (query, matched doc).
  *  - RRF fuses top-k frames — already k·|queries| rows — with a union
  *    and one groupBy; no ranker internals are touched.
  *  - Incremental LSH joins the new batch's band signatures against the
  *    frozen corpus band store: per-batch cost follows the batch plus
  *    matched buckets, never corpus × corpus (the daily-ingest shape —
  *    re-deduplicating the full corpus per batch would be quadratic in
  *    deliveries).
  *
  * Determinism contract (oracle parity): per-term/per-rank contributions
  * are rounded to a fixed scale and summed exactly in long-backed
  * decimals ([[Exact.dsumBounded]]), so scores are independent of
  * aggregation order and bit-identical across engines; ranks break ties
  * on the rounded score then the doc id.
  */
object Retrieval {

  /** BM25 inverted index from token rows (doc, token) with
    * multiplicity. Returns (postings, dfreq, stats):
    *  - postings (doc, token, tf, dl) — each posting carries its
    *    document's length so scoring never re-joins a doc table;
    *  - dfreq (token, df) — distinct-document frequency per term;
    *  - stats (n_docs, avgdl) — 1-row corpus scalars (avgdl computed as
    *    exact long sum / count, divided in double — engine-identical).
    */
  def bm25Index(tokenRows: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val tf = tokenRows.groupBy(col("doc"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = tokenRows.groupBy(col("doc")).agg(count(lit(1)).as("dl"))
    val postings = tf.join(dl, Seq("doc"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    (postings, dfreq, stats)
  }

  /** Okapi BM25 scores for query term sets (qid, token), one row per
    * distinct (qid, token):
    *
    *   score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(0.25 + 0.75·dl/avgdl))
    *   idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))
    *
    * with the standard k1 = 1.2, b = 0.75 folded into the constants
    * (1 − b = 0.25). Per-term contributions round to 6 dp, then sum
    * exactly — order-free and bit-identical to the SQL twin
    * ([[bm25Sql]]). Output: (qid, doc, score).
    */
  /** `maxDf`: drop query terms whose posting list spans more than that
    * many documents BEFORE the postings join — the retrieval twin of
    * [[TextOps.capHotBands]]. A stop-term in a query ("the") would
    * otherwise drag a corpus-sized posting list through the join while
    * its idf contributes almost nothing; eliding it bounds per-query
    * cost at any corpus scale (standard stopword elision in inverted
    * indexes). The cut is on the frozen index's df, so it is
    * deterministic and oracle-expressible (`... WHERE df <= maxDf`). */
  def bm25Scores(postings: DataFrame, dfreq: DataFrame, stats: DataFrame,
      queryTerms: DataFrame, maxDf: Option[Long] = None): DataFrame = {
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    val dfk = maxDf.map(m => dfreq.filter(col("df") <= m)).getOrElse(dfreq)
    postings
      .join(broadcast(queryTerms), Seq("token"))
      .join(broadcast(dfk), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc"), round(contrib, 6).as("c"))
      .groupBy(col("qid"), col("doc"))
      .agg(Exact.dsumBounded(col("c")).as("score"))
  }

  /** The DuckDB twin of [[bm25Scores]]' per-pair score, given CTEs
    * named `postings(doc, token, tf, dl)`, `dfreq(token, df)`,
    * `stats(n_docs, avgdl)`, `qterms(qid, token)` — kept next to the
    * Scala so the expression trees stay in sync. */
  val bm25Sql: String = """
      SELECT qid, doc,
        CAST(SUM(CAST(ROUND(
          LN(1.0e0 + (n_docs - df + 0.5e0) / (df + 0.5e0)) * (tf * 2.2e0) /
            (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl)),
          6) AS DECIMAL(18,6))) AS DOUBLE) AS score
      FROM postings JOIN qterms USING (token) JOIN dfreq USING (token), stats
      GROUP BY qid, doc"""

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher '09):
    * score(q, d) = Σ_r 1 / (kRrf + rank_r(q, d)) over the rankings that
    * retrieved d for q — an item outside one ranker's top-k simply
    * contributes nothing for that ranker. Inputs: (qid, doc, rank)
    * frames (top-k sized). Per-ranker contributions round to 9 dp and
    * sum exactly (long-backed DECIMAL(12,9)); ranks are small ints so
    * the rounding is far below any fusion-relevant gap. */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Int = 60): DataFrame = {
    val u = rankings
      .map(_.select(col("qid"), col("doc"), col("rank")))
      .reduce(_ unionAll _)
    u.select(col("qid"), col("doc"),
        round(lit(1.0) / (lit(kRrf) + col("rank")), 9)
          .cast("decimal(12,9)").as("c"))
      .groupBy(col("qid"), col("doc"))
      .agg(sum(col("c")).cast("double").as("rrf"))
  }

  /** The DuckDB twin of one [[rrfFuse]] contribution. */
  def rrfSql(rankExpr: String, kRrf: Int = 60): String =
    s"CAST(ROUND(1.0e0 / ($kRrf + $rankExpr), 9) AS DECIMAL(12,9))"

  /** Query-by-example token-set Jaccard: for each query doc, the
    * Jaccard similarity |Q ∩ D| / |Q ∪ D| of distinct token sets
    * against every doc sharing at least one term. Inputs: `dt` =
    * distinct (doc, token) rows; `queryDocs` = (qid) — a small query
    * batch, broadcast. The pair space is generated by the token
    * equi-join, so cost follows the query docs' postings, not
    * |corpus|²; a stop-token shared by every doc is the same skew bomb
    * as a hot LSH band — apply the [[TextOps.capHotBands]]-style
    * postings cap upstream for open-vocabulary corpora. Scores round
    * to 6 dp (engine-identical ranking). */
  def jaccardQbe(dt: DataFrame, queryDocs: DataFrame): DataFrame = {
    val q = dt.join(broadcast(queryDocs), col("doc") === col("qid"))
      .select(col("qid"), col("token"))
    val qsz = q.groupBy(col("qid")).agg(count(lit(1)).as("qn"))
    val dsz = dt.groupBy(col("doc")).agg(count(lit(1)).as("dn"))
    q.join(dt, Seq("token"))
      .filter(col("qid") =!= col("doc"))
      .groupBy(col("qid"), col("doc"))
      .agg(count(lit(1)).as("ix"))
      .join(broadcast(qsz), Seq("qid"))
      .join(dsz, Seq("doc"))
      .select(col("qid"), col("doc"),
        round(col("ix") * lit(1.0) / (col("qn") + col("dn") - col("ix")), 6)
          .as("jaccard"))
  }

  /** DPR-style hard-negative mining: from a scored retrieval run
    * (qid, doc, score), drop the pairs present in `positives`
    * (qid, doc) — the labeled relevant set, in practice near-dups or
    * click data — and re-rank what remains per query. The result is
    * the top-k docs that score like positives but aren't: the
    * contrastive-training negatives. Both inputs are retrieval-sized
    * (scored is already per-query bounded); the anti-join is the only
    * added work. */
  def hardNegatives(scored: DataFrame, positives: DataFrame,
      k: Int): DataFrame =
    Relational.topKPerGroup(
      scored.join(positives, Seq("qid", "doc"), "left_anti"),
      Seq(col("qid")), Seq(col("score").desc, col("doc").asc), k)

  /** Incremental banded-LSH candidates: pairs sharing a band signature
    * where at least one side is in the new batch. `bands` is
    * (doc, band, sig, is_new); the old side is the frozen index. The
    * join is new-side × all-sides, so old–old pairs are never generated
    * (they were adjudicated when THEIR batch arrived) and new–new pairs
    * appear once (doc order). Output: (d1, d2) distinct, d1 ∈ new. */
  def incrementalLshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.filter(col("is_new")).as("a")
    a.join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          (!col("b.is_new") || col("a.doc") < col("b.doc")))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .distinct()
  }

  /** Exact phrase search over a POSITIONAL postings list — the
    * classical positional-intersection algorithm (Manning/Raghavan/
    * Schütze IR ch. 2): a phrase of terms t_0..t_{m-1} occurs at
    * anchor position a iff for every offset j the posting
    * (doc, a + j, t_j) exists, i.e. every matched posting votes for
    * anchor = pos − j and an anchor with all m distinct offsets wins.
    *
    * `postings`: (doc, pos, token) — built once per corpus, the same
    * one-pass explode as the BM25 index but keeping positions.
    * `phrases`: (pid, phrase, j, term, len) — the query set, exploded
    * one row per term; query-sized, so it BROADCASTS into the postings
    * scan and per-phrase cost follows matched postings, not corpus
    * size (the q137 contract). The anchor groupBy is
    * (phrase × candidate-anchor)-sized. */
  def phraseMatches(postings: DataFrame, phrases: DataFrame): DataFrame =
    postings.join(broadcast(phrases), col("token") === col("term"))
      .select(col("pid"), col("phrase"), col("doc"),
        (col("pos") - col("j")).as("anchor"), col("j"), col("len"))
      .groupBy(col("pid"), col("phrase"), col("doc"), col("anchor"))
      .agg(countDistinct(col("j")).as("__njs"), max(col("len")).as("__len"))
      .filter(col("__njs") === col("__len"))
      .groupBy(col("pid"), col("phrase"), col("doc"))
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("anchor")).as("first_pos"))
}
