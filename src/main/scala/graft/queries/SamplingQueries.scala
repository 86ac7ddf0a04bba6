package graft.queries

import graft.Tables
import graft.ops.{Exact, Relational, Sampling, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Dataset-construction batch: deterministic sampling, a k-means
  * centroid-update step over embeddings, and corpus vocabulary top-k —
  * the reproducible building blocks of a training-data pipeline.
  */
object SamplingQueries extends QueryGroup {

  /** Stratified deterministic sample: ~5% of documents per source,
    * keyed on hash(source | doc_id). Pure map-side filter — the
    * predicate pushes to the scan, zero shuffle at any scale, and the
    * sample is identical on every rerun and engine (the DuckDB oracle
    * draws the exact same rows). */
  private val q69 = Q(
    "q69_stratified_sample",
    (s, dir) => {
      import s.implicits._
      Sampling.hashRateSample(
          Tables(s, dir, "documents"),
          concat($"source", lit("|"), $"doc_id".cast("string")),
          num = 50, den = 1000)
        .select($"doc_id", $"source", $"n_chars")
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, source, n_chars FROM documents
      WHERE ${Sampling.hashRateSampleSql(
        "(source || '|' || CAST(doc_id AS VARCHAR))", 50, 1000)}
      ORDER BY doc_id"""))

  /** Deterministic reservoir: exactly 10 docs per source, the 10
    * smallest content hashes — rerun-stable uniform-without-replacement
    * per stratum. The rank-<=-k window compiles to WindowGroupLimit, so
    * each shuffle partition retains only k candidates per stratum. */
  private val q70 = Q(
    "q70_reservoir_per_stratum",
    (s, dir) => {
      import s.implicits._
      Sampling.hashTopKPerStratum(
          Tables(s, dir, "documents").select($"doc_id", $"source"),
          $"source", $"doc_id".cast("string"), $"doc_id", k = 10)
        .select($"source", $"doc_id", $"rank")
        .orderBy($"source", $"rank")
    },
    Some(s"""
      WITH h AS (
        SELECT doc_id, source,
          ${TextOps.h64Sql("CAST(doc_id AS VARCHAR)")} AS hkey
        FROM documents),
      r AS (
        SELECT doc_id, source,
          CAST(ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY hkey, doc_id) AS INT) AS rank
        FROM h)
      SELECT source, doc_id, rank FROM r
      WHERE rank <= 10 ORDER BY source, rank"""))

  private val compSql = """
    comp AS (
      SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS e
      FROM embeddings)"""

  private val cosSql =
    "CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) / " +
      "(sqrt(CAST(SUM(CAST(a2 AS DECIMAL(18,6))) AS DOUBLE)) * " +
      "sqrt(CAST(SUM(CAST(b2 AS DECIMAL(18,6))) AS DOUBLE)))"

  /** One k-means (Lloyd) iteration over the embedding corpus: assign
    * every vector to its nearest of 16 centroids (cosine, the IVF
    * assignment of q61), then recompute each centroid component as the
    * decimal-exact mean of its members — assignment is a broadcast
    * sweep, the update one groupBy on (cid, dim). Looping this pair is
    * the standard distributed k-means; one step is enough to verify the
    * kernel bit-exactly. */
  private val q71 = Q(
    "q71_kmeans_step",
    (s, dir) => {
      import s.implicits._
      val all = Similarity.withNorms(Tables.spread(s, dir, "embeddings"),
        $"vec_id", $"embedding")
      val cents = all.filter($"id" < 16)
        .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
      val assign = Similarity.ivfAssign(all, cents).select($"id", $"cid")
      val comp = Tables(s, dir, "embeddings")
        .select($"vec_id".as("id"), posexplode($"embedding").as(Seq("i", "e")))
        .withColumn("e", $"e".cast("double"))
      assign.join(comp, Seq("id"))
        .groupBy($"cid", $"i")
        .agg(count(lit(1)).as("n_members"), Exact.davg($"e").as("mean_e"))
        .orderBy($"cid", $"i")
    },
    Some(s"""
      WITH $compSql,
      cparts AS (
        SELECT v.id AS id, c.id AS cid, v.e * c.e AS p,
               v.e * v.e AS a2, c.e * c.e AS b2
        FROM comp v JOIN comp c ON v.i = c.i
        WHERE c.id < 16),
      ccos AS (SELECT id, cid, $cosSql AS ccos
               FROM cparts GROUP BY id, cid),
      assign AS (
        SELECT id, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                      ORDER BY ccos DESC, cid) AS rn
          FROM ccos) WHERE rn = 1)
      SELECT a.cid, m.i, CAST(COUNT(*) AS BIGINT) AS n_members,
        ${Exact.sqlAvg("m.e")} AS mean_e
      FROM assign a JOIN comp m ON a.id = m.id
      GROUP BY a.cid, m.i ORDER BY a.cid, m.i"""))

  /** Corpus vocabulary: top 30 tokens by document frequency
    * (distinct-per-doc, deterministic (df desc, token) tie-break).
    * orderBy+limit compiles to TakeOrderedAndProject — per-partition
    * top-k then a single k-row merge, never a global sort. */
  private val q72 = Q(
    "q72_vocab_topk",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(explode(array_distinct(TextOps.tokens($"text"))).as("token"))
        .groupBy($"token")
        .agg(count(lit(1)).as("df"))
        .orderBy($"df".desc, $"token".asc)
        .limit(30)
    },
    Some("""
      WITH tok AS (
        SELECT doc_id,
          unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS token
        FROM documents)
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df
      FROM tok GROUP BY token
      ORDER BY df DESC, token LIMIT 30"""))

  /** End-to-end corpus build: quality gates → keep-first near-dup
    * suppression → deterministic 50% sample of the kept set → per-source
    * stats. Every stage is an operator verified on its own elsewhere
    * (q63, q69, q73); this query proves they compose into the full
    * dataset-construction pipeline under one oracle, with the stage
    * boundaries the 100 TB run would use: decisions are one pass, the
    * sample predicate is map-side, and only the final stats shuffle. */
  private val q76 = Q(
    "q76_corpus_build",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val kept = TextOps.corpusDecisions(docs)
        .filter($"decision" === "kept").select($"doc_id")
      Sampling.hashRateSample(docs.join(kept, Seq("doc_id")),
          $"doc_id".cast("string"), num = 500, den = 1000)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          Exact.dsum($"n_chars").as("sum_chars"))
        .orderBy($"source")
    },
    Some(s"""
      WITH ${TextOps.corpusDecisionsSql},
      kept AS (SELECT doc_id FROM decisions WHERE decision = 'kept'),
      sampled AS (
        SELECT d.source, d.n_chars FROM documents d
        JOIN kept k ON d.doc_id = k.doc_id
        WHERE ${Sampling.hashRateSampleSql("CAST(d.doc_id AS VARCHAR)", 500, 1000)})
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        ${Exact.sqlSum("n_chars")} AS sum_chars
      FROM sampled GROUP BY source ORDER BY source"""))

  /** Deterministic train/val/test split (ops/Sampling.hashSplit):
    * hash-range assignment keyed on the document id — map-side,
    * rerun/parallelism-stable, and join-consistent so features and
    * labels keyed on the same id can never leak across the boundary.
    * Per-(source, split) counts verify the assignment end-to-end. */
  private val q117 = Q(
    "q117_train_val_test",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .withColumn("split", Sampling.hashSplit(
          concat($"source", lit("|"), $"doc_id".cast("string")),
          den = 10, train = 8, valSlots = 1))
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"source", $"split")
    },
    Some(s"""
      SELECT source,
        ${Sampling.hashSplitSql(
          "(source || '|' || CAST(doc_id AS VARCHAR))", 10, 8, 1)} AS split,
        CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1, 2 ORDER BY source, split"""))

  /** Per-source z-score of document length (ops/Normalize.zscore): one
    * decimal-exact stats shuffle, broadcast join-back, map-side z —
    * the within-source standardization every quality-threshold pass
    * needs, bit-exact against the oracle through the pinned double
    * chain. */
  private val q118 = Q(
    "q118_zscore",
    (s, dir) => {
      import s.implicits._
      graft.ops.Normalize.zscore(
          Tables(s, dir, "documents"), Seq("source"), $"n_chars")
        .select($"doc_id", $"source", $"n_chars", $"mean", $"z")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH st AS (
        SELECT source,
          ${graft.ops.Exact.sqlSum("CAST(n_chars AS DOUBLE)")} AS sx,
          ${graft.ops.Exact.sqlSum(
            "CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)")} AS sxx,
          CAST(COUNT(n_chars) AS DOUBLE) AS n
        FROM documents GROUP BY source)
      SELECT doc_id, d.source, n_chars, sx / n AS mean,
        CASE WHEN (sxx - sx * sx / n) / n > 0
             THEN (CAST(n_chars AS DOUBLE) - sx / n) /
                  sqrt((sxx - sx * sx / n) / n)
        END AS z
      FROM documents d JOIN st ON d.source = st.source
      ORDER BY doc_id"""))

  /** Curriculum quartile bins (ops/Normalize.quantileBins): each doc's
    * source-relative length quartile from exact nearest-rank
    * thresholds (q89's rule) — the difficulty-bucketing pass of a
    * curriculum data loader, with engine-identical bucket edges. */
  private val q119 = Q(
    "q119_quantile_bins",
    (s, dir) => {
      import s.implicits._
      graft.ops.Normalize.quantileBins(
          Tables(s, dir, "documents"), Seq("source"), $"n_chars",
          $"doc_id", Seq(0.25, 0.5, 0.75))
        .select($"doc_id", $"source", $"n_chars", $"bin")
        .orderBy($"doc_id")
    },
    Some("""
      WITH r AS (
        SELECT doc_id, source, n_chars,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars, doc_id) AS rn,
          COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents),
      th AS (
        SELECT source,
          MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(0.25e0 * n) AS BIGINT))
                THEN CAST(n_chars AS DOUBLE) END) AS t1,
          MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(0.5e0 * n) AS BIGINT))
                THEN CAST(n_chars AS DOUBLE) END) AS t2,
          MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(0.75e0 * n) AS BIGINT))
                THEN CAST(n_chars AS DOUBLE) END) AS t3
        FROM r GROUP BY source)
      SELECT doc_id, d.source, n_chars,
        1 + (CASE WHEN n_chars > t1 THEN 1 ELSE 0 END)
          + (CASE WHEN n_chars > t2 THEN 1 ELSE 0 END)
          + (CASE WHEN n_chars > t3 THEN 1 ELSE 0 END) AS bin
      FROM documents d JOIN th ON d.source = th.source
      ORDER BY doc_id"""))

  /** Weighted sample without replacement: 100 documents drawn ∝
    * n_chars (longer docs more likely — the "sample by token budget"
    * variant of corpus subsampling), via the deterministic A-ES key.
    * The plan is TakeOrderedAndProject: per-partition top-k, one
    * 100-row merge, no global sort, no shuffle of the losers. */
  private val q129 = Q(
    "q129_weighted_sample",
    (s, dir) => {
      import s.implicits._
      Sampling.weightedHashSample(
          Tables(s, dir, "documents").select($"doc_id", $"n_chars"),
          $"doc_id".cast("string"), $"n_chars", k = 100)
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, n_chars, skey FROM (
        SELECT doc_id, n_chars,
          ${Sampling.weightedHashSampleSql(
            "CAST(doc_id AS VARCHAR)", "n_chars")} AS skey
        FROM documents
        ORDER BY skey DESC, CAST(doc_id AS VARCHAR) LIMIT 100)
      ORDER BY doc_id"""))

  /** Leakage-safe train/val/test split: the split key is the NORMALIZED
    * CONTENT (TextOps.normalizeText), not the row id — every
    * formatting-variant copy of a document hashes to the same slot, so
    * exact and fuzzy-exact duplicates co-travel into one split and can
    * never straddle the train/test boundary (the q117 row-id split
    * cannot promise that). Pure map-side projection: no shuffle, no
    * group table, rerun- and parallelism-stable. Residual NEAR-dup
    * leakage across splits is what q151 audits. */
  private val q150 = Q(
    "q150_grouped_split",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select($"doc_id", $"source",
          Sampling.hashSplit(TextOps.normalizeText($"text"),
            den = 10, train = 8, valSlots = 1).as("split"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, source,
        ${Sampling.hashSplitSql(TextOps.normalizeTextSql("text"), 10, 8, 1)}
          AS split
      FROM documents ORDER BY doc_id"""))

  /** Cross-split near-dup leakage audit: q47's MinHash-LSH candidate
    * pairs (est. Jaccard ≥ 0.5) tabulated by the q150 split assignment
    * of each side — the count in (train, test) / (train, val) cells IS
    * the measured contamination the grouped split could not prevent
    * (near-dups that are not normalization-identical). Split labels are
    * map-side column chains on each end of the pair join; no new
    * shuffle beyond q47's own. */
  private val q151 = Q(
    "q151_split_leakage_audit",
    (s, dir) => {
      import s.implicits._
      val assigned = Tables(s, dir, "documents")
        .select($"doc_id",
          Sampling.hashSplit(TextOps.normalizeText($"text"),
            den = 10, train = 8, valSlots = 1).as("split"))
      val sh = Tables(s, dir, "documents")
        .withColumn("ts", TextOps.tokens($"text"))
        .select($"doc_id", explode(TextOps.shingles("ts", 3)).as("s"))
        .distinct()
      val mh = TextOps.minhash(sh, $"doc_id", $"s", k = 8)
      val cands = TextOps.lshCandidates(mh, r = 4)
      val pairs = TextOps.estJaccard(cands, mh, k = 8)
        .filter($"est_jaccard" >= 0.5)
      pairs
        .join(assigned.select($"doc_id".as("d1"), $"split".as("s1")), Seq("d1"))
        .join(assigned.select($"doc_id".as("d2"), $"split".as("s2")), Seq("d2"))
        .select(least($"s1", $"s2").as("split_a"),
          greatest($"s1", $"s2").as("split_b"))
        .groupBy($"split_a", $"split_b")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"split_a", $"split_b")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
                 FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(ts) - 2),
          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        FROM t),
      hashes AS (
        SELECT doc_id AS doc, ${TextOps.h64Sql("s")} AS h1,
               ${TextOps.h64bSql("s")} % 1000000007 AS h2
        FROM sh),
      mh AS (
        SELECT doc, j, MIN(h1 + j * h2) AS h
        FROM hashes, (SELECT unnest(generate_series(0, 7)) AS j) seeds
        GROUP BY doc, j),
      bands AS (
        SELECT doc, CAST(j // 4 AS INT) AS band, SUM(h) AS sig
        FROM mh GROUP BY 1, 2),
      cands AS (
        SELECT DISTINCT a.doc AS d1, b.doc AS d2
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.sig = b.sig AND a.doc < b.doc),
      est AS (
        SELECT d1, d2, COUNT(*) * 1.0e0 / 8 AS est_jaccard
        FROM cands
        JOIN mh ma ON d1 = ma.doc
        JOIN mh mb ON d2 = mb.doc AND ma.j = mb.j AND ma.h = mb.h
        GROUP BY d1, d2),
      assigned AS (
        SELECT doc_id,
          ${Sampling.hashSplitSql(TextOps.normalizeTextSql("text"), 10, 8, 1)}
            AS split
        FROM documents)
      SELECT LEAST(a1.split, a2.split) AS split_a,
        GREATEST(a1.split, a2.split) AS split_b,
        CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM est JOIN assigned a1 ON est.d1 = a1.doc_id
               JOIN assigned a2 ON est.d2 = a2.doc_id
      WHERE est.est_jaccard >= 0.5
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** DoReMi domain-reweighting step (Xie et al. '23): each source
    * domain is scored by its per-TOKEN bigram-LM NLL — Σ(per-doc exact
    * log-prob sums)/Σ(bigram counts), the paper's token-normalized
    * domain loss — high-loss domains are exponentially up-weighted and
    * the mixture is smoothed 20% toward uniform: the data-side step of
    * mixture optimization. One corpus pass for the LM scores, one for
    * the domain sums; everything after is domain-count-sized broadcast
    * arithmetic. The token-weighted fold is also the numerically exact
    * one: it aggregates 6-decimal-quantum numerators and integer
    * denominators (no per-doc division result ever crosses a decimal
    * cast — the sf0.1 half-ulp lesson). */
  private val q167 = Q(
    "q167_doremi_reweight",
    (s, dir) => {
      import s.implicits._
      val d = Tables(s, dir, "documents")
      val lm = graft.ops.LmScore.lmScore(d, $"doc_id", $"text",
        vocabK = 50, pplFlag = 32.0)
      val dl = lm.select($"doc", $"nll_num", $"n_bigrams")
        .join(d.select($"doc_id".as("doc"), $"source"), Seq("doc"))
      Sampling.doremiReweightWeighted(dl, $"source", $"nll_num",
          $"n_bigrams", eta = 1.0, smooth = 0.2)
        .orderBy($"domain")
    },
    Some(s"""
      WITH ${graft.ops.LmScore.lmScoreSql("doc_id", "text", 50, 32.0)},
      dl AS (
        SELECT d.source AS domain, l.nll_num AS num, l.n_bigrams AS den
        FROM lmout l JOIN documents d ON l.doc = d.doc_id),
      ${Sampling.doremiWeightedSql(eta = 1.0, smooth = 0.2)}
      SELECT * FROM doremi ORDER BY domain"""))

  /** Neyman optimal stratified allocation (Neyman '34 / Cochran):
    * split a fixed audit budget of N = 1000 docs across sources
    * ∝ N_h·σ_h — big AND internally-varied strata get the samples;
    * a uniform or size-proportional split wastes budget on
    * homogeneous strata (this is how a QA pass over a 100 TB corpus
    * should spend its annotation budget). Per-stratum σ comes from
    * exact 64-bit integer power sums (n·Σx² − (Σx)² stays within
    * 2^63 for this table's magnitudes; at larger Σx² swap in the
    * [[Exact]] decimal buffers); the only doubles are one sqrt per
    * stratum (6-rounded), the weight products (exact-decimal-summed),
    * and the share division. Integer seats are floor + largest-
    * remainder (rank by remainder desc, source asc — total order), so
    * allocations sum to N exactly on both engines. */
  private val q183 = Q(
    "q183_neyman_allocation",
    (s, dir) => {
      import s.implicits._
      val budget = 1000L
      val st = Tables(s, dir, "documents")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_h"),
          sum($"n_chars").as("sx"),
          sum($"n_chars" * $"n_chars").as("sxx"))
        .select($"source", $"n_h",
          round(sqrt((($"n_h" * $"sxx" - $"sx" * $"sx")
            .cast("double")) / ($"n_h" * $"n_h").cast("double")), 6)
            .as("sigma"))
        .withColumn("wt", round($"n_h".cast("double") * $"sigma", 6))
      val tot = st.agg(Exact.dsum($"wt").as("t"))
      val seats = st.crossJoin(broadcast(tot))
        .withColumn("share", round($"wt" / $"t", 6))
        .withColumn("target", $"wt" / $"t" * budget)
        .withColumn("base", floor($"target").cast("long"))
        .withColumn("rem", $"target" - $"base")
      val wRem = org.apache.spark.sql.expressions.Window
        .orderBy($"rem".desc, $"source".asc)
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
      seats
        .withColumn("rrank", row_number().over(wRem))
        .withColumn("deficit", lit(budget) - sum($"base").over(wAll))
        .select($"source", $"n_h", $"sigma", $"share",
          ($"base" + when($"rrank" <= $"deficit", 1L).otherwise(0L))
            .as("alloc_n"))
        .orderBy($"source")
    },
    Some(s"""
      WITH st AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_h,
          CAST(SUM(n_chars) AS BIGINT) AS sx,
          CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY source),
      sig AS (
        SELECT source, n_h,
          round(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE) /
            CAST(n_h * n_h AS DOUBLE)), 6) AS sigma
        FROM st),
      wts AS (
        SELECT *, round(CAST(n_h AS DOUBLE) * sigma, 6) AS wt FROM sig),
      tot AS (SELECT ${Exact.sqlSum("wt")} AS t FROM wts),
      seats AS (
        SELECT w.source, w.n_h, w.sigma,
          round(w.wt / t.t, 6) AS share,
          w.wt / t.t * 1000 AS target,
          CAST(FLOOR(w.wt / t.t * 1000) AS BIGINT) AS base,
          w.wt / t.t * 1000 - FLOOR(w.wt / t.t * 1000) AS rem
        FROM wts w CROSS JOIN tot t),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rrank,
          1000 - CAST(SUM(base) OVER () AS BIGINT) AS deficit
        FROM seats)
      SELECT source, n_h, sigma, share,
        base + CASE WHEN rrank <= deficit THEN 1 ELSE 0 END AS alloc_n
      FROM ranked ORDER BY source"""))

  /** Poisson-bootstrap confidence intervals (the distributed bootstrap
    * of Chamandy et al.: classic resampling needs n draws from n rows —
    * impossible row-locally — but Multinomial(n, 1/n) ≈ iid Poisson(1)
    * weights, so each row mints its own replicate weights with no
    * coordination). Every weight is hash-derived (h64(doc#b) against a
    * frozen 1000-slot pmf table for Poisson(1): 368/368/184/61/15/4),
    * so the B = 32 replicates are deterministic and engine-identical —
    * error bars on a 100 TB corpus statistic in ONE pass, no data
    * movement beyond the stats rollup. Replicate means are ratios of
    * exact integer sums; the CI is nearest-rank over the 32 means
    * (ranks 2 and 31 ≈ 94% coverage), a total order. */
  private val q186 = Q(
    "q186_bootstrap_ci",
    (s, dir) => {
      import s.implicits._
      val reps = Tables(s, dir, "documents")
        .select($"source", $"doc_id", $"n_chars")
        .withColumn("b", explode(expr("sequence(0, 31)")))
        .withColumn("u", TextOps.h64(
          concat($"doc_id".cast("string"), lit("#"), $"b".cast("string")))
          % 1000)
        .withColumn("w",
          when($"u" < 368, 0L).when($"u" < 736, 1L).when($"u" < 920, 2L)
            .when($"u" < 981, 3L).when($"u" < 996, 4L).otherwise(5L))
      val rmeans = reps.groupBy($"source", $"b")
        .agg((sum($"w" * $"n_chars").cast("double") /
          sum($"w").cast("double")).as("rmean"))
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"rmean".asc, $"b".asc)
      val ci = rmeans.withColumn("rk", row_number().over(wRank))
        .groupBy($"source")
        .agg(max(when($"rk" === 2, $"rmean")).as("ci_lo"),
          max(when($"rk" === 31, $"rmean")).as("ci_hi"))
      val pt = Tables(s, dir, "documents").groupBy($"source")
        .agg((sum($"n_chars").cast("double") /
          count(lit(1)).cast("double")).as("mean_chars"))
      pt.join(ci, Seq("source"))
        .select($"source", $"mean_chars", $"ci_lo", $"ci_hi",
          round(($"ci_hi" - $"ci_lo") / $"mean_chars", 6).as("rel_width"))
        .orderBy($"source")
    },
    Some(s"""
      WITH reps AS (
        SELECT source, doc_id, n_chars, b,
          ${TextOps.h64Sql("CAST(doc_id AS VARCHAR) || '#' || CAST(b AS VARCHAR)")}
            % 1000 AS u
        FROM documents, (SELECT unnest(generate_series(0, 31)) AS b) bs),
      wts AS (
        SELECT source, b, n_chars,
          CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1 WHEN u < 920 THEN 2
               WHEN u < 981 THEN 3 WHEN u < 996 THEN 4 ELSE 5 END AS w
        FROM reps),
      rmeans AS (
        SELECT source, b,
          CAST(SUM(w * n_chars) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS rmean
        FROM wts GROUP BY source, b),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY rmean, b) AS rk
        FROM rmeans),
      ci AS (
        SELECT source, MAX(CASE WHEN rk = 2 THEN rmean END) AS ci_lo,
          MAX(CASE WHEN rk = 31 THEN rmean END) AS ci_hi
        FROM ranked GROUP BY source),
      pt AS (
        SELECT source, CAST(SUM(n_chars) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS mean_chars
        FROM documents GROUP BY source)
      SELECT pt.source, mean_chars, ci_lo, ci_hi,
        round((ci_hi - ci_lo) / mean_chars, 6) AS rel_width
      FROM pt JOIN ci ON pt.source = ci.source
      ORDER BY pt.source"""))

  /** Cross-source quantile normalization of quality scores (the
    * rank-based calibration genomics calls quantile normalization and
    * score-fusion calls rank mapping): a fixed quality threshold means
    * different things in different sources — a doc's score is replaced
    * by the GLOBAL score at its within-source percentile, so "top 20%
    * of src3" and "top 20% of src7" land on one comparable scale and a
    * single global cutoff does per-source-fair filtering. Ranks are
    * exact integers over the (score, doc) total order; the percentile
    * lookup is the integer rank map ⌈r·N/n_s⌉ — an equi-join, no
    * interpolation, no float comparisons. The global rank comes from
    * [[graft.ops.Shard.histogramRank]] (counting-sort: histogram
    * prefix-sum + per-bucket windows), NOT a single-partition
    * ROW_NUMBER — the 100 TB-safe global order. */
  private val q187 = Q(
    "q187_quantile_normalize",
    (s, dir) => {
      import s.implicits._
      val docsT = Tables(s, dir, "documents")
      val tok = docsT.select($"doc_id".as("doc"),
        explode(TextOps.tokens($"text")).as("token"))
      val qual = TextOps.qualityScore(tok, Seq("the", "a", "of", "and"))
        .withColumn("quality",
          $"stop_ratio" * lit(-1.0) + $"mean_token_len" / lit(10.0))
        .select($"doc", $"quality")
        .join(docsT.select($"doc_id".as("doc"), $"source"), Seq("doc"))
      val g = graft.ops.Shard.histogramRank(qual,
          floor($"quality" * 10).cast("int"), bucketAsc = true,
          Seq($"quality".asc, $"doc".asc), "grank")
        .select($"grank", $"quality".as("norm_quality"))
      val wSrc = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"quality".asc, $"doc".asc)
      val ns = qual.groupBy($"source").agg(count(lit(1)).as("ns"))
      val n = qual.agg(count(lit(1)).as("n"))
      qual
        .withColumn("r", row_number().over(wSrc).cast("long"))
        .join(broadcast(ns), Seq("source"))
        .crossJoin(broadcast(n))
        .withColumn("grank", expr("(r * n + ns - 1) div ns"))
        .join(g, Seq("grank"))
        .select($"doc", $"source", round($"quality", 6).as("quality"),
          round($"norm_quality", 6).as("norm_quality"))
        .orderBy($"doc")
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id AS doc, unnest(string_split_regex(trim(text), '\\s+'))
          AS token
        FROM documents),
      q0 AS (
        SELECT doc,
          (CAST(SUM(CASE WHEN token IN ('the','a','of','and') THEN 1 ELSE 0
                END) AS DOUBLE) / COUNT(*)) * -1.0e0 +
          (${Exact.sqlSum("CAST(length(token) AS DOUBLE)")} / COUNT(*))
            / 10.0e0 AS quality
        FROM tok GROUP BY doc),
      qs AS (
        SELECT q0.doc, d.source, q0.quality
        FROM q0 JOIN documents d ON d.doc_id = q0.doc),
      g AS (
        SELECT quality AS norm_quality,
          ROW_NUMBER() OVER (ORDER BY quality, doc) AS grank
        FROM qs),
      r AS (
        SELECT doc, source, quality,
          CAST(ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY quality, doc) AS BIGINT) AS r,
          CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns,
          CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM qs)
      SELECT r.doc, r.source, round(r.quality, 6) AS quality,
        round(g.norm_quality, 6) AS norm_quality
      FROM r JOIN g ON g.grank = (r.r * r.n + r.ns - 1) // r.ns
      ORDER BY r.doc"""))

  /** Purged/embargoed temporal split (López de Prado '18, purged
    * k-fold; the time-series analog of the q150/q151 leakage-safe
    * split): train strictly BEFORE cutoff−gap, test at-or-after the
    * cutoff, and the 2-day embargo between them dropped entirely, so
    * no training row's look-ahead window overlaps evaluation time.
    * The cutoff is the exact nearest-rank 80th-percentile timestamp —
    * computed with the counting-sort histogramRank bucketed by DAY
    * (never a whole-frame window), the rank index ⌈0.8n⌉ in pure
    * integer arithmetic. The audit column the purge cannot fix rides
    * along: users appearing on both sides (panel-identity leakage —
    * the signal that a user-grouped split like q150 is ALSO needed).
    * Everything is microsecond-integer comparisons. */
  private val q214 = Q(
    "q214_embargo_split",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
        .select($"event_id", $"ts", $"user_id", $"event_type")
      val ranked = graft.ops.Shard.histogramRank(
        ev, to_date($"ts"), bucketAsc = true,
        Seq($"ts".asc, $"event_id".asc), "rnk")
      val n = ev.agg(count(lit(1)).as("n"))
      val cut = ranked.crossJoin(broadcast(n))
        .filter($"rnk" === expr("(8 * n + 9) div 10"))
        .select($"ts".as("cutoff"))
      val flagged = ev.crossJoin(broadcast(cut))
        .withColumn("part", Sampling.embargoPart($"ts", $"cutoff", 2))
      val counts = flagged.groupBy($"event_type")
        .agg(sum(when($"part" === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when($"part" === "purged", 1L).otherwise(0L)).as("n_purged"),
          sum(when($"part" === "test", 1L).otherwise(0L)).as("n_test"))
      val trainU = flagged.filter($"part" === "train")
        .select($"event_type", $"user_id").distinct()
      val testU = flagged.filter($"part" === "test")
        .select($"event_type", $"user_id").distinct()
      val both = trainU.join(testU, Seq("event_type", "user_id"),
          "left_semi")
        .groupBy($"event_type").agg(count(lit(1)).as("n_users_both"))
      counts.join(both, Seq("event_type"), "left")
        .select($"event_type", $"n_train", $"n_purged", $"n_test",
          coalesce($"n_users_both", lit(0L)).as("n_users_both"))
        .orderBy($"event_type")
    },
    Some(s"""
      WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
      rk AS (
        SELECT ts, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rnk
        FROM events),
      cut AS (
        SELECT ts AS cutoff FROM rk, nn WHERE rnk = (8 * n + 9) // 10),
      fl AS (
        SELECT e.event_type, e.user_id,
          CASE WHEN e.ts < c.cutoff - INTERVAL 2 DAY THEN 'train'
               WHEN e.ts >= c.cutoff THEN 'test'
               ELSE 'purged' END AS part
        FROM events e, cut c),
      counts AS (
        SELECT event_type,
          CAST(SUM(CASE WHEN part = 'train' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_train,
          CAST(SUM(CASE WHEN part = 'purged' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_purged,
          CAST(SUM(CASE WHEN part = 'test' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_test
        FROM fl GROUP BY event_type),
      ub AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users_both
        FROM (SELECT DISTINCT event_type, user_id FROM fl
                WHERE part = 'train'
              INTERSECT
              SELECT DISTINCT event_type, user_id FROM fl
                WHERE part = 'test')
        GROUP BY event_type)
      SELECT c.event_type, c.n_train, c.n_purged, c.n_test,
        COALESCE(b.n_users_both, 0) AS n_users_both
      FROM counts c LEFT JOIN ub b ON c.event_type = b.event_type
      ORDER BY c.event_type"""))

  def queries: Seq[Q] =
    Seq(q69, q70, q71, q72, q76, q117, q118, q119, q129, q150, q151,
      q167, q183, q186, q187, q214)
}
