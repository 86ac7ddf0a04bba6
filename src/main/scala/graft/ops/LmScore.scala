package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based corpus selection — the two published recipes a
  * large-scale LM data pipeline runs after the rule-based filters
  * (quality q43, repetition q78) and before mixing (q101/q124):
  *
  *  - [[lmScore]]: CCNet-style n-gram LM perplexity (Wenzek et al.
  *    2019). Train a bigram LM with add-one smoothing over a capped
  *    vocabulary on the corpus itself, score every document by its
  *    mean negative log-likelihood, and flag the high-perplexity
  *    (boilerplate/gibberish) tail.
  *  - [[dsirLogWeights]]: Data Selection via Importance Resampling
  *    (Xie et al. 2023). Hash bigram features into a fixed number of
  *    buckets, fit smoothed bucket distributions for a target slice
  *    and the raw corpus, and weight every document by its summed
  *    bucket log-likelihood ratio — positive log-weight means the doc
  *    looks more like the target than the corpus at large.
  *
  * Scale design: both models are BOUNDED by construction — the LM
  * vocabulary is a top-K cut (the unigram table broadcasts; the bigram
  * table is a standard shuffle join at worst), and the DSIR model is
  * exactly 2·B counters regardless of corpus size (that fixed size is
  * the point of hashed features — the model broadcasts at any corpus
  * scale, so scoring is one map-side join per doc-bucket row). Doc
  * scores aggregate per doc_id; nothing is ever driver-collected.
  *
  * Cross-engine determinism: ln() differs in the last ulp between
  * libms, so every transcendental is rounded to 6 decimals per row
  * (the q59 convention) and summed with the exact-decimal pattern
  * ([[Exact.dsumBounded]]); the vocabulary cut uses a total order
  * (count desc, token asc — the q72/q100 convention).
  */
object LmScore {

  /** Per-document bigram-LM scores over whitespace tokens.
    *
    * Model: vocabulary = top `vocabK` tokens by corpus frequency
    * (count desc, token asc); everything else maps to `<unk>`. The
    * bigram probability is add-one smoothed over the mapped stream:
    * p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + vocabK + 1).
    *
    * Output: (doc, n_bigrams, nll, ppl, decision) — nll is the mean
    * negative log-likelihood (natural log), ppl = round(exp(nll), 6),
    * decision flags ppl > `pplFlag`. Documents with fewer than two
    * tokens have no bigrams and are absent from the output.
    */
  /** The trained LM's three bounded frames: `vocab` (w, __v — ≤ K
    * rows), `c1` (mw, c1 — ≤ K+1), `c2` (mw, mw2, c2 — observed
    * bigrams, ≤ (K+1)²). All checkpointed — train once, score
    * anywhere, including [[graft.streaming.StreamLm]]. */
  final case class LmModelFrames(vocab: DataFrame, c1: DataFrame,
      c2: DataFrame)

  /** Fit the capped-vocabulary bigram model on a batch corpus.
    *
    * The model tables are all BOUNDED (vocab ≤ K, unigrams ≤ K+1,
    * bigrams ≤ (K+1)²) while every derivation of them scans the whole
    * corpus — materialize each once (eager localCheckpoint, the q121
    * convention) so training is three linear passes and scoring one,
    * instead of re-deriving the vocabulary under every consumer
    * (unchecked, the q127 plan scanned the corpus six times). The
    * corpus-sized token/bigram streams are deliberately NOT
    * materialized: storing them would cost more than the one extra
    * window pass they save. */
  def lmModel(docs: DataFrame, idCol: Column, textCol: Column,
      vocabK: Int): LmModelFrames = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = lmTokens(docs, idCol, textCol)
    val vocab = toks.groupBy($"w").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"w".asc).limit(vocabK)
      .select($"w", lit(1).as("__v"))
      .localCheckpoint()
    val mapped = lmMapped(toks, vocab)
    val c1 = mapped.groupBy($"mw").agg(count(lit(1)).as("c1"))
      .localCheckpoint()
    val c2 = lmBigrams(mapped).groupBy($"mw", $"mw2")
      .agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    LmModelFrames(vocab, c1, c2)
  }

  def lmScore(docs: DataFrame, idCol: Column, textCol: Column,
      vocabK: Int, pplFlag: Double): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val m = lmModel(docs, idCol, textCol, vocabK)
    val big = lmBigrams(lmMapped(lmTokens(docs, idCol, textCol), m.vocab))
    val smooth = vocabK + 1
    // |lp| <= ln(c1 + smooth) — double digits at any corpus size
    // c2 is left unhinted: bounded by observed bigrams (≤ (K+1)²), it
    // auto-broadcasts when small but may legitimately shuffle at a
    // production vocab; c1 (≤ K+1 rows) always broadcasts
    val scored = big.join(m.c2, Seq("mw", "mw2"))
      .join(broadcast(m.c1), Seq("mw"))
      .withColumn("lp", round(log(($"c2" + 1).cast("double") /
        ($"c1" + lit(smooth)).cast("double")), 6))
    scored.groupBy($"doc")
      .agg(count(lit(1)).as("n_bigrams"),
        Exact.dsumBounded($"lp", 2).as("__slp"))
      .withColumn("nll", -$"__slp" / $"n_bigrams".cast("double"))
      .withColumn("ppl", round(exp($"nll"), 6))
      // nll_num: the NEGATED exact log-prob sum (a 6-decimal quantum,
      // so later decimal casts are boundary-free — unlike `nll`, a
      // division result whose low bits can sit on a decimal-cast
      // half-ulp). Aggregators that average losses across docs should
      // fold (nll_num, n_bigrams), not nll — see doremiReweightWeighted.
      .select($"doc", $"n_bigrams", $"nll", (-$"__slp").as("nll_num"),
        $"ppl",
        when($"ppl" > pplFlag, "flagged").otherwise("kept").as("decision"))
  }

  private def lmTokens(docs: DataFrame, idCol: Column,
      textCol: Column): DataFrame =
    docs.select(idCol.as("doc"),
      posexplode(TextOps.tokens(textCol)).as(Seq("pos", "w")))

  private def lmMapped(toks: DataFrame, vocab: DataFrame): DataFrame = {
    val s = toks.sparkSession
    import s.implicits._
    toks.join(broadcast(vocab), Seq("w"), "left")
      .select($"doc", $"pos",
        when($"__v".isNotNull, $"w").otherwise(lit("<unk>")).as("mw"))
  }

  private def lmBigrams(mapped: DataFrame): DataFrame = {
    val s = mapped.sparkSession
    import s.implicits._
    mapped
      .withColumn("mw2",
        lead($"mw", 1).over(Window.partitionBy($"doc").orderBy($"pos")))
      .filter($"mw2".isNotNull)
      .select($"doc", $"mw", $"mw2")
  }

  /** Oracle twin of [[lmScore]] (DuckDB CTE fragment ending in a
    * SELECT of (doc, n_bigrams, nll, ppl, decision); caller appends
    * ordering). `docExpr`/`textExpr` are SQL expressions over the
    * `documents` view. */
  def lmScoreSql(docExpr: String, textExpr: String, vocabK: Int,
      pplFlag: Double): String = {
    val smooth = vocabK + 1
    s"""
    toks AS (
      SELECT $docExpr AS doc,
        generate_subscripts(string_split_regex(trim($textExpr), '\\s+'), 1) AS pos,
        unnest(string_split_regex(trim($textExpr), '\\s+')) AS w
      FROM documents),
    vocab AS (
      SELECT w FROM (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w)
      ORDER BY cnt DESC, w LIMIT $vocabK),
    mapped AS (
      SELECT t.doc, t.pos,
        CASE WHEN v.w IS NULL THEN '<unk>' ELSE t.w END AS mw
      FROM toks t LEFT JOIN vocab v ON t.w = v.w),
    bigs AS (
      SELECT doc, mw, mw2 FROM (
        SELECT doc, mw,
          LEAD(mw) OVER (PARTITION BY doc ORDER BY pos) AS mw2
        FROM mapped) WHERE mw2 IS NOT NULL),
    c1 AS (SELECT mw, CAST(COUNT(*) AS BIGINT) AS c1 FROM mapped GROUP BY mw),
    c2 AS (SELECT mw, mw2, CAST(COUNT(*) AS BIGINT) AS c2
           FROM bigs GROUP BY mw, mw2),
    lp AS (
      SELECT b.doc,
        ROUND(LN(CAST(c2.c2 + 1 AS DOUBLE) /
                 CAST(c1.c1 + $smooth AS DOUBLE)), 6) AS lp
      FROM bigs b
      JOIN c2 ON b.mw = c2.mw AND b.mw2 = c2.mw2
      JOIN c1 ON b.mw = c1.mw),
    lmscore AS (
      SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        -${Exact.sqlSum("lp")} / CAST(COUNT(*) AS DOUBLE) AS nll,
        -${Exact.sqlSum("lp")} AS nll_num
      FROM lp GROUP BY doc),
    lmout AS (
      SELECT doc, n_bigrams, nll, nll_num, ROUND(EXP(nll), 6) AS ppl,
        CASE WHEN ROUND(EXP(nll), 6) > ${pplFlag}e0
             THEN 'flagged' ELSE 'kept' END AS decision
      FROM lmscore)"""
  }

  /** Per-document DSIR importance log-weights over hashed bigram
    * features.
    *
    * `isTarget` marks the rows whose feature distribution defines the
    * target; the source distribution is the whole corpus. Each bigram
    * hashes ([[TextOps.h64]]) into one of `buckets` counters; both
    * distributions are add-one smoothed. Per doc:
    * logw = Σ_b cnt(doc, b) · round(ln(p_t(b) / p_s(b)), 6), and
    * decision `selected` ⟺ logw > 0 (more target-like than the
    * corpus) — a map-side predicate, deliberately NOT a global top-N
    * rank, which would be a single-partition sort at scale. Docs with
    * fewer than two tokens have no features and are absent.
    */
  def dsirLogWeights(docs: DataFrame, idCol: Column, textCol: Column,
      isTarget: Column, buckets: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val feats = features(docs, idCol, textCol, isTarget, buckets)
    val perDoc = feats.groupBy($"doc", $"b").agg(count(lit(1)).as("cnt"))
    perDoc.join(broadcast(dsirModel(docs, idCol, textCol, isTarget, buckets)),
        Seq("b"))
      .groupBy($"doc")
      .agg(sum($"cnt").as("n_feats"),
        // plain dsum, not the bounded fast path: a single (doc, bucket)
        // cell of a very long doc can push |cnt·lr| past any small bound
        Exact.dsum($"cnt".cast("double") * $"lr").as("logw"))
      .select($"doc", $"n_feats", $"logw",
        when($"logw" > 0.0, "selected").otherwise("rest").as("decision"))
  }

  /** The trained DSIR model on its own: (b, lr) — exactly the bounded
    * `buckets`-row frame [[dsirLogWeights]] broadcasts, exposed so a
    * consumer can train once on a batch corpus and score elsewhere
    * (e.g. [[graft.streaming.StreamDsir]] scoring a document stream
    * map-side against a frozen model). */
  def dsirModel(docs: DataFrame, idCol: Column, textCol: Column,
      isTarget: Column, buckets: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val feats = features(docs, idCol, textCol, isTarget, buckets)
    val totals = feats.agg(
      count(lit(1)).cast("double").as("ns"),
      count(when($"__tgt", 1)).cast("double").as("nt"))
    val src = feats.groupBy($"b").agg(count(lit(1)).as("cs"))
    val tgt = feats.filter($"__tgt").groupBy($"b").agg(count(lit(1)).as("ct"))
    src.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select($"b", round(log(
        ((coalesce($"ct", lit(0L)) + 1).cast("double") / ($"nt" + lit(buckets))) /
          (($"cs" + 1).cast("double") / ($"ns" + lit(buckets)))), 6).as("lr"))
  }

  /** Hashed-bigram feature rows (doc, __tgt, b) shared by the model fit
    * and the per-doc scoring. */
  private def features(docs: DataFrame, idCol: Column, textCol: Column,
      isTarget: Column, buckets: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .withColumn("__ts", TextOps.tokens(textCol))
      .select(idCol.as("doc"), isTarget.as("__tgt"),
        explode(TextOps.shingles("__ts", 2)).as("sh"))
      .select($"doc", $"__tgt", (TextOps.h64($"sh") % buckets).as("b"))
  }

  /** Oracle twin of [[dsirLogWeights]] (DuckDB CTE fragment ending in
    * `dsirout`(doc, n_feats, logw, selected)). `tgtExpr` is the target
    * predicate over the `documents` view. */
  def dsirLogWeightsSql(docExpr: String, textExpr: String,
      tgtExpr: String, buckets: Int): String = s"""
    dtk AS (SELECT $docExpr AS doc, $tgtExpr AS tgt,
              string_split_regex(trim($textExpr), '\\s+') AS ts
            FROM documents),
    f AS (
      SELECT doc, tgt, ${TextOps.h64Sql("sh")} % $buckets AS b
      FROM (SELECT doc, tgt,
              unnest(list_transform(generate_series(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i+1])) AS sh
            FROM dtk)),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ns,
                   CAST(COUNT(CASE WHEN tgt THEN 1 END) AS DOUBLE) AS nt
            FROM f),
    src AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cs FROM f GROUP BY b),
    tgtc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct
             FROM f WHERE tgt GROUP BY b),
    model AS (
      SELECT s.b,
        ROUND(LN((CAST(COALESCE(tg.ct, 0) + 1 AS DOUBLE) / (tot.nt + $buckets)) /
                 (CAST(s.cs + 1 AS DOUBLE) / (tot.ns + $buckets))), 6) AS lr
      FROM src s LEFT JOIN tgtc tg ON s.b = tg.b CROSS JOIN tot),
    pd AS (SELECT doc, b, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM f GROUP BY doc, b),
    dsirout AS (
      SELECT pd.doc, CAST(SUM(pd.cnt) AS BIGINT) AS n_feats,
        ${Exact.sqlSum("CAST(pd.cnt AS DOUBLE) * m.lr")} AS logw,
        CASE WHEN ${Exact.sqlSum("CAST(pd.cnt AS DOUBLE) * m.lr")} > 0.0e0
             THEN 'selected' ELSE 'rest' END AS decision
      FROM pd JOIN model m ON pd.b = m.b
      GROUP BY pd.doc)"""

  /** Multinomial Naive Bayes quality classifier — the
    * fastText-classifier stage of published pipelines (CCNet trains
    * one on "looks like Wikipedia"; GPT-3/LLaMA on curated-vs-crawl),
    * here trained on caller-supplied heuristic labels: distill the
    * rule gates into a word-level scorer that generalizes past the
    * exact rule boundaries.
    *
    * Model: vocabulary = top `vocabK` corpus tokens (count desc,
    * token asc), rest → `<unk>`; per-class add-one-smoothed token
    * likelihoods over the (K+1)-word event space. A doc's score is the
    * add-one-smoothed class-prior log-odds plus the sum of per-token
    * log-likelihood ratios; label `good` ⟺ score > 0.
    *
    * Scale: the model is ≤ K+1 rows of (token, llr) plus two scalars —
    * bounded by construction, broadcast at any corpus size; training
    * is two linear passes (vocab cut, class counts) and scoring one
    * map-side broadcast join + per-doc agg. Determinism: one ln per
    * model row rounded to 6 (q59 convention; the ratio is formed in
    * IEEE doubles identically in both engines), decimal-exact doc
    * sums, total-order vocab cut.
    *
    * Output: (doc, n_tokens, score, label) — one row per doc with ≥ 1
    * token (empty text still tokenizes to one empty token, as in the
    * quality stack). */
  /** The trained NB model's bounded frames: `vocab` (w, __v — ≤ K
    * rows), `llr` (mw, llr — ≤ K+1 rows), `prior` (one scalar row).
    * Train once, score anywhere — including
    * [[graft.streaming.StreamNb]]. */
  final case class NbModelFrames(vocab: DataFrame, llr: DataFrame,
      prior: DataFrame)

  /** Fit the NB classifier on a labeled batch corpus (see [[nbScore]]
    * for the model definition). */
  def nbModel(docs: DataFrame, idCol: Column, textCol: Column,
      isPos: Column, vocabK: Int): NbModelFrames = {
    val s = docs.sparkSession
    import s.implicits._
    val smooth = vocabK + 1
    val labeled = docs.select(idCol.as("doc"), textCol.as("__text"),
      isPos.cast("boolean").as("__pos"))
    val toks = labeled.select($"doc", $"__pos",
      explode(TextOps.tokens($"__text")).as("w"))
    val vocab = toks.groupBy($"w").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"w".asc).limit(vocabK)
      .select($"w", lit(1).as("__v")).localCheckpoint()
    val mapped = toks.join(broadcast(vocab), Seq("w"), "left")
      .select($"doc", $"__pos",
        when($"__v".isNotNull, $"w").otherwise(lit("<unk>")).as("mw"))
    // class-conditional counts over the mapped event space: ≤ K+1 rows
    val classCnt = mapped.groupBy($"mw")
      .agg(sum(when($"__pos", 1L).otherwise(0L)).as("cp"),
        sum(when(!$"__pos", 1L).otherwise(0L)).as("cn"))
      .localCheckpoint()
    val totals = classCnt.agg(sum($"cp").as("tp"), sum($"cn").as("tn"))
    val llr = classCnt.crossJoin(broadcast(totals))
      .select($"mw", round(log(
        (($"cp" + 1).cast("double") * ($"tn" + smooth).cast("double")) /
          (($"cn" + 1).cast("double") * ($"tp" + smooth).cast("double"))),
        6).as("llr"))
    val prior = labeled.agg(
        sum(when($"__pos", 1L).otherwise(0L)).as("np"),
        sum(when(!$"__pos", 1L).otherwise(0L)).as("nn"))
      .select(round(log(($"np" + 1).cast("double") /
        ($"nn" + 1).cast("double")), 6).as("prior"))
    NbModelFrames(vocab, llr, prior)
  }

  def nbScore(docs: DataFrame, idCol: Column, textCol: Column,
      isPos: Column, vocabK: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val m = nbModel(docs, idCol, textCol, isPos, vocabK)
    val toks = docs.select(idCol.as("doc"),
      explode(TextOps.tokens(textCol)).as("w"))
    val mapped = toks.join(broadcast(m.vocab), Seq("w"), "left")
      .select($"doc",
        when($"__v".isNotNull, $"w").otherwise(lit("<unk>")).as("mw"))
    mapped.join(broadcast(m.llr), Seq("mw"))
      .groupBy($"doc")
      .agg(count(lit(1)).as("n_tokens"), Exact.dsum($"llr").as("__s"))
      .crossJoin(broadcast(m.prior))
      .select($"doc", $"n_tokens", ($"prior" + $"__s").as("score"),
        when(($"prior" + $"__s") > 0, "good").otherwise("bad").as("label"))
  }

  /** Oracle twin of [[nbScore]] (DuckDB CTE fragment ending in
    * `nbout(doc, n_tokens, score, label)`). `labelExpr` is a boolean
    * SQL expression over the `documents` view columns. */
  def nbScoreSql(docExpr: String, textExpr: String, labelExpr: String,
      vocabK: Int): String = {
    val smooth = vocabK + 1
    s"""
    nbt AS (
      SELECT $docExpr AS doc, $labelExpr AS pos,
        unnest(string_split_regex(trim($textExpr), '\\s+')) AS w
      FROM documents),
    nbvocab AS (
      SELECT w FROM (SELECT w, COUNT(*) AS cnt FROM nbt GROUP BY w)
      ORDER BY cnt DESC, w LIMIT $vocabK),
    nbmapped AS (
      SELECT t.doc, t.pos,
        CASE WHEN v.w IS NULL THEN '<unk>' ELSE t.w END AS mw
      FROM nbt t LEFT JOIN nbvocab v ON t.w = v.w),
    nbcnt AS (
      SELECT mw,
        CAST(COUNT(CASE WHEN pos THEN 1 END) AS BIGINT) AS cp,
        CAST(COUNT(CASE WHEN NOT pos THEN 1 END) AS BIGINT) AS cn
      FROM nbmapped GROUP BY mw),
    nbtot AS (SELECT SUM(cp) AS tp, SUM(cn) AS tn FROM nbcnt),
    nbllr AS (
      SELECT mw, ROUND(LN(
        (CAST(cp + 1 AS DOUBLE) * CAST(tn + $smooth AS DOUBLE)) /
        (CAST(cn + 1 AS DOUBLE) * CAST(tp + $smooth AS DOUBLE))), 6) AS llr
      FROM nbcnt CROSS JOIN nbtot),
    nbprior AS (
      SELECT ROUND(LN(
        CAST(COUNT(CASE WHEN pos THEN 1 END) + 1 AS DOUBLE) /
        CAST(COUNT(CASE WHEN NOT pos THEN 1 END) + 1 AS DOUBLE)), 6) AS pri
      FROM (SELECT DISTINCT doc, pos FROM nbt)),
    nbout AS (
      SELECT m.doc, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        p.pri + ${Exact.sqlSum("l.llr")} AS score,
        CASE WHEN p.pri + ${Exact.sqlSum("l.llr")} > 0.0e0
             THEN 'good' ELSE 'bad' END AS label
      FROM nbmapped m JOIN nbllr l ON m.mw = l.mw CROSS JOIN nbprior p
      GROUP BY m.doc, p.pri)"""
  }
}
