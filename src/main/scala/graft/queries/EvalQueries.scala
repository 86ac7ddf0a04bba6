package graft.queries

import graft.Tables
import graft.ops.{Exact, LmScore, TextOps, WindowOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-evaluation operators: the audits and policy computations a
  * production corpus run executes AROUND the core dedup/filter stages —
  * measuring a probabilistic index against its exact ground truth,
  * Bloom-gating an expensive membership probe, watching embedding-space
  * drift, CCNet perplexity bucketing, and temperature-scaled mixture
  * weights. All hashing goes through the cross-engine h64/h64b pair;
  * every threshold and count is integer; transcendentals follow the
  * round-to-6 convention.
  */
object EvalQueries extends QueryGroup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** LSH recall audit: q47's MinHash-LSH candidates measured against
    * the EXACT blocked shingle-Jaccard ≥ 0.9 ground truth, per source —
    * the quality gate for every probabilistic dedup pass (an LSH
    * parameter regression still produces well-shaped plans; it
    * surfaces here as a recall drop the oracle recomputes). Both sides
    * run over the same distinct 3-shingle sets, so the comparison is
    * apples-to-apples; ground truth stays non-O(n²) via the
    * source×length blocking, and candidate volume rides along as the
    * cost half of the recall/cost trade. */
  private val q196 = Q(
    "q196_lsh_recall_audit",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val sh = d.withColumn("ts", TextOps.tokens($"text"))
        .select($"doc_id", explode(TextOps.shingles("ts", 3)).as("s"))
        .distinct()
      val mh = TextOps.minhash(sh, $"doc_id", $"s", k = 8)
      val cands = TextOps.lshCandidates(mh, r = 4)
      val tr = d.withColumn("ts", TextOps.tokens($"text"))
        .select($"doc_id".as("doc"),
          concat($"source", lit("#"),
            ($"n_chars" / 100).cast("int").cast("string")).as("block"),
          explode(TextOps.shingles("ts", 3)).as("token"))
        .distinct()
      val truth = TextOps.blockedJaccard(tr)
        .filter($"jaccard" >= 0.9).select($"d1", $"d2")
      val src = d.select($"doc_id".as("d1"), $"source")
      val hits = truth
        .join(cands.select($"d1", $"d2").withColumn("__c", lit(1)),
          Seq("d1", "d2"), "left")
        .join(src, Seq("d1"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce($"__c", lit(0))).cast("long").as("n_hit"))
      val vol = cands.join(src, Seq("d1")).groupBy($"source")
        .agg(count(lit(1)).as("n_cands"))
      hits.join(vol, Seq("source"), "left")
        .select($"source", $"n_true", $"n_hit",
          coalesce($"n_cands", lit(0L)).as("n_cands"),
          ($"n_hit".cast("double") / $"n_true".cast("double")).as("recall"))
        .orderBy($"source")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, source, n_chars,
                   string_split_regex(trim(text), '\\s+') AS ts
                 FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
          generate_series(1, len(ts) - 2),
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
      tr AS (
        SELECT DISTINCT doc_id AS doc,
          source || '#' || CAST(CAST(n_chars // 100 AS INT) AS VARCHAR)
            AS block,
          unnest(list_transform(generate_series(1, len(ts) - 2),
            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS token
        FROM t),
      sz AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM tr GROUP BY doc),
      inter AS (
        SELECT a.doc AS d1, b.doc AS d2, CAST(COUNT(*) AS BIGINT) AS i
        FROM tr a JOIN tr b ON a.block = b.block AND a.token = b.token
          AND a.doc < b.doc
        GROUP BY 1, 2),
      truth AS (
        SELECT d1, d2
        FROM inter JOIN sz sa ON d1 = sa.doc JOIN sz sb ON d2 = sb.doc
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.9),
      hits AS (
        SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_true,
          CAST(SUM(CASE WHEN c.d1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_hit
        FROM truth tr2
        JOIN documents d ON tr2.d1 = d.doc_id
        LEFT JOIN cands c ON tr2.d1 = c.d1 AND tr2.d2 = c.d2
        GROUP BY d.source),
      vol AS (
        SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_cands
        FROM cands c JOIN documents d ON c.d1 = d.doc_id
        GROUP BY d.source)
      SELECT h.source, h.n_true, h.n_hit,
        COALESCE(v.n_cands, 0) AS n_cands,
        CAST(h.n_hit AS DOUBLE) / CAST(h.n_true AS DOUBLE) AS recall
      FROM hits h LEFT JOIN vol v ON h.source = v.source
      ORDER BY h.source"""))

  /** Bloom-filter membership gate with a false-positive audit: the
    * reference corpus's distinct 5-token span hashes build a 16384-bit
    * Bloom filter (k = 3 Kirsch–Mitzenmacher probes
    * p_j = h1 + j·(2·h2+1) mod m — one md5 digest feeds the family as
    * in the minhash machinery, and the odd stride stays coprime with
    * the power-of-two m so the probes never collapse onto one bit)
    * stored in the HLL-style PINNED layout: 512 32-bit
    * words packed in BIGINTs via bit_or (bit 63 would overflow
    * DuckDB's checked shift), a ≤512-row table that broadcasts into
    * the probe. Every current doc's spans probe the filter (3 broadcast
    * lookups, map-side) and the exact membership join rides along as
    * ground truth — n_bloom ≥ n_true ALWAYS (no false negatives, the
    * Bloom contract), and the per-doc FP rate is the measured cost of
    * replacing the exact reference join with a 2 KB broadcast at
    * 100 TB. */
  private val q197 = Q(
    "q197_bloom_membership",
    (s, dir) => {
      import s.implicits._
      val m = 16384L
      val sp = docs(s, dir)
        .select($"doc_id".as("doc"), $"source", TextOps.tokens($"text").as("ts"))
        .select($"doc", $"source", explode(TextOps.shingles("ts", 5)).as("s"))
        .select($"doc", $"source", TextOps.h64($"s").as("h1"),
          (TextOps.h64b($"s") % 1000000007L).as("h2"))
        .distinct()
      val refSrc = Seq("src0", "src1", "src2")
      val ref = sp.filter($"source".isin(refSrc: _*))
      val cur = sp.filter(!$"source".isin(refSrc: _*))
      val bloom = graft.ops.Sketch.bloomWords(ref.select($"h1", $"h2"), m)
      val perSpan = graft.ops.Sketch
        .bloomProbe(cur.select($"doc", $"h1", $"h2"), bloom, m)
      val inRef = perSpan.join(
        ref.select($"h1", $"h2").distinct().withColumn("__r", lit(1L)),
        Seq("h1", "h2"), "left")
      inRef.groupBy($"doc")
        .agg(count(lit(1)).as("n_spans"),
          sum($"bloom_hit".cast("long")).as("n_bloom_hits"),
          sum(coalesce($"__r", lit(0L))).as("n_true_hits"))
        .withColumn("fp_rate",
          when($"n_spans" > $"n_true_hits",
            ($"n_bloom_hits" - $"n_true_hits").cast("double") /
              ($"n_spans" - $"n_true_hits").cast("double"))
            .otherwise(lit(0.0)))
        .select($"doc", $"n_spans", $"n_bloom_hits", $"n_true_hits", $"fp_rate")
        .orderBy($"doc")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, source,
                   string_split_regex(trim(text), '\\s+') AS ts
                 FROM documents),
      spx AS (
        SELECT doc_id AS doc, source, unnest(list_transform(
          generate_series(1, len(ts) - 4),
          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
               ts[i+3] || ' ' || ts[i+4])) AS s
        FROM t),
      sp AS (
        SELECT DISTINCT doc, source, ${TextOps.h64Sql("s")} AS h1,
          ${TextOps.h64bSql("s")} % 1000000007 AS h2
        FROM spx),
      ref AS (SELECT * FROM sp WHERE source IN ('src0', 'src1', 'src2')),
      cur AS (SELECT * FROM sp WHERE source NOT IN ('src0', 'src1', 'src2')),
      bloom AS (
        SELECT (h1 + j * (2 * h2 + 1)) % 16384 // 32 AS word,
          bit_or(CAST(1 AS BIGINT) << CAST((h1 + j * (2 * h2 + 1)) % 16384 % 32 AS INT))
            AS bits
        FROM ref, (SELECT unnest(generate_series(0, 2)) AS j) js
        GROUP BY 1),
      probes AS (
        SELECT c.doc, c.h1, c.h2,
          CASE WHEN b.bits IS NOT NULL AND
            (b.bits & (CAST(1 AS BIGINT) <<
              CAST((c.h1 + j.j * (2 * c.h2 + 1)) % 16384 % 32 AS INT))) <> 0
            THEN 1 ELSE 0 END AS ok
        FROM cur c
        CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) j
        LEFT JOIN bloom b ON (c.h1 + j.j * (2 * c.h2 + 1)) % 16384 // 32 = b.word),
      per_span AS (
        SELECT doc, h1, h2, (SUM(ok) = 3) AS bloom_hit
        FROM probes GROUP BY doc, h1, h2),
      flagged AS (
        SELECT ps.doc, ps.bloom_hit,
          CASE WHEN r.h1 IS NOT NULL THEN 1 ELSE 0 END AS in_ref
        FROM per_span ps
        LEFT JOIN (SELECT DISTINCT h1, h2 FROM ref) r
          ON ps.h1 = r.h1 AND ps.h2 = r.h2)
      SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_spans,
        CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
          AS n_bloom_hits,
        CAST(SUM(in_ref) AS BIGINT) AS n_true_hits,
        CASE WHEN COUNT(*) > SUM(in_ref)
          THEN CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) - SUM(in_ref)
                 AS DOUBLE) / CAST(COUNT(*) - SUM(in_ref) AS DOUBLE)
          ELSE 0.0e0 END AS fp_rate
      FROM flagged GROUP BY doc ORDER BY doc"""))

  /** Embedding-space drift per label: each label's centroid against
    * the global centroid — cosine alignment and L2 shift. The
    * embedding analog of the q159/q192 scalar drift screens: a
    * re-embedding regression or a poisoned slice moves a centroid long
    * before scalar stats notice. Centroids are decimal-exact component
    * sums over exact counts (means rounded to 6); the cosine/L2 folds
    * run over the d-sized centroid frames, so nothing corpus-sized
    * crosses a second shuffle. */
  private val q198 = Q(
    "q198_embedding_drift",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val comp = emb.select($"vec_id".as("id"), $"label",
          posexplode($"embedding").as(Seq("i", "ef")))
        .select($"id", $"label", $"i", $"ef".cast("double").as("e"))
      val nv = emb.groupBy($"label").agg(count(lit(1)).as("n_vecs"))
      val gmu = comp.groupBy($"i")
        .agg(Exact.dsum($"e").as("sg"), count(lit(1)).as("ng"))
        .select($"i", round($"sg" / $"ng".cast("double"), 6).as("mu"))
      val lmu = comp.groupBy($"label", $"i").agg(Exact.dsum($"e").as("se"))
        .join(broadcast(nv), Seq("label"))
        .select($"label", $"i",
          round($"se" / $"n_vecs".cast("double"), 6).as("mg"))
      val parts = lmu.join(broadcast(gmu), Seq("i"))
        .select($"label", ($"mg" * $"mu").as("p"),
          ($"mg" * $"mg").as("a2"), ($"mu" * $"mu").as("b2"),
          round(($"mg" - $"mu") * ($"mg" - $"mu"), 6).as("d2"))
      parts.groupBy($"label")
        .agg(round(Exact.dsum($"p") /
            (sqrt(Exact.dsum($"a2")) * sqrt(Exact.dsum($"b2"))), 6)
            .as("centroid_cos"),
          round(sqrt(Exact.dsum($"d2")), 6).as("l2_shift"))
        .join(broadcast(nv), Seq("label"))
        .select($"label", $"n_vecs", $"centroid_cos", $"l2_shift")
        .orderBy($"label")
    },
    Some(s"""
      WITH comp AS (
        SELECT vec_id AS id, label, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS e
        FROM embeddings),
      nv AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
             FROM embeddings GROUP BY label),
      gmu AS (
        SELECT i, round(${Exact.sqlSum("e")} / COUNT(*), 6) AS mu
        FROM comp GROUP BY i),
      lmu AS (
        SELECT c.label, c.i,
          round(${Exact.sqlSum("e")} / MAX(nv.n_vecs), 6) AS mg
        FROM comp c JOIN nv ON c.label = nv.label
        GROUP BY c.label, c.i),
      parts AS (
        SELECT l.label, l.mg * g.mu AS p, l.mg * l.mg AS a2,
          g.mu * g.mu AS b2,
          round((l.mg - g.mu) * (l.mg - g.mu), 6) AS d2
        FROM lmu l JOIN gmu g ON l.i = g.i),
      folded AS (
        SELECT label,
          round(${Exact.sqlSum("p")} /
            (sqrt(${Exact.sqlSum("a2")}) * sqrt(${Exact.sqlSum("b2")})), 6)
            AS centroid_cos,
          round(sqrt(${Exact.sqlSum("d2")}), 6) AS l2_shift
        FROM parts GROUP BY label)
      SELECT f.label, nv.n_vecs, f.centroid_cos, f.l2_shift
      FROM folded f JOIN nv ON f.label = nv.label
      ORDER BY f.label"""))

  /** CCNet head/middle/tail perplexity bucketing (Wenzek et al. '19):
    * per-language exact perplexity tertiles (nearest-rank, tie-broken
    * by doc id — the q119 quantile machinery) split the corpus into
    * the three quality strata CCNet publishes; downstream mixing reads
    * the bucket, not the raw score. Thresholds are a lang-sized
    * broadcast; the scoring reuses the q127 bigram LM end to end. */
  private val q199 = Q(
    "q199_ccnet_buckets",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val scored = LmScore.lmScore(d, $"doc_id", $"text",
          vocabK = 50, pplFlag = 32.0)
        .select($"doc".as("doc_id"), $"ppl")
        .join(d.select($"doc_id", $"lang"), Seq("doc_id"))
      val qs = WindowOps.exactQuantiles(scored, Seq(col("lang")), col("ppl"),
        col("doc_id"), Seq(1.0 / 3, 2.0 / 3))
      val th = qs.groupBy($"lang").agg(
        max(when($"q" === 1.0 / 3, $"qvalue")).as("t1"),
        max(when($"q" === 2.0 / 3, $"qvalue")).as("t2"))
      scored.join(broadcast(th), Seq("lang"))
        .select($"doc_id", $"lang", $"ppl",
          when($"ppl" <= $"t1", "head")
            .when($"ppl" <= $"t2", "middle")
            .otherwise("tail").as("bucket"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH ${LmScore.lmScoreSql("doc_id", "text", 50, 32.0)},
      wl AS (
        SELECT l.doc AS doc_id, l.ppl, d.lang
        FROM lmout l JOIN documents d ON l.doc = d.doc_id),
      r AS (
        SELECT lang, ppl, doc_id,
          ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS rn,
          CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
        FROM wl),
      th AS (
        SELECT lang,
          MAX(CASE WHEN rn = GREATEST(1,
            CAST(ceil((1.0e0 / 3) * n) AS BIGINT)) THEN ppl END) AS t1,
          MAX(CASE WHEN rn = GREATEST(1,
            CAST(ceil((2.0e0 / 3) * n) AS BIGINT)) THEN ppl END) AS t2
        FROM r GROUP BY lang)
      SELECT wl.doc_id, wl.lang, wl.ppl,
        CASE WHEN wl.ppl <= th.t1 THEN 'head'
             WHEN wl.ppl <= th.t2 THEN 'middle'
             ELSE 'tail' END AS bucket
      FROM wl JOIN th ON wl.lang = th.lang
      ORDER BY wl.doc_id"""))

  /** Temperature-scaled mixture weights (the multilingual/multi-source
    * sampling knob of Gopher/PaLM-class runs): per source, natural
    * share p, and for each temperature α the sampling weight
    * w ∝ p^α (α = 1 natural, α → 0 uniform) with the effective epoch
    * factor w/p a data loader realizes — the number q78-style epoch
    * mixing consumes. pow is the round-to-6 transcendental; the
    * normalizer is a decimal-exact sum of the rounded terms; every
    * division is double-deterministic. Source-sized frame throughout. */
  private val q200 = Q(
    "q200_temperature_mix",
    (s, dir) => {
      import s.implicits._
      val wAll = Window.partitionBy(lit(1))
      val wA = Window.partitionBy($"alpha")
      docs(s, dir).groupBy($"source").agg(count(lit(1)).as("n_docs"))
        .withColumn("ntot", sum($"n_docs").over(wAll))
        .withColumn("p", $"n_docs".cast("double") / $"ntot".cast("double"))
        .select($"source", $"n_docs", $"p",
          explode(array(lit(0.3), lit(0.7), lit(1.0))).as("alpha"))
        .withColumn("w_raw", round(expr("pow(p, alpha)"), 6))
        .withColumn("wsum",
          sum($"w_raw".cast("decimal(18,6)")).over(wA).cast("double"))
        .withColumn("w", round($"w_raw" / $"wsum", 6))
        .select($"source", $"alpha", $"n_docs", round($"p", 6).as("p_nat"),
          $"w", round($"w" / $"p", 6).as("eff_epochs"))
        .orderBy($"source", $"alpha")
    },
    Some(s"""
      WITH ps AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS ntot FROM ps),
      base AS (
        SELECT source, n_docs,
          CAST(n_docs AS DOUBLE) / CAST(ntot AS DOUBLE) AS p
        FROM ps CROSS JOIN tot),
      e AS (
        SELECT source, n_docs, p, alpha, round(pow(p, alpha), 6) AS w_raw
        FROM base CROSS JOIN (SELECT unnest(ARRAY[CAST(0.3 AS DOUBLE),
          CAST(0.7 AS DOUBLE), CAST(1.0 AS DOUBLE)]) AS alpha) ax),
      sums AS (
        SELECT alpha, ${Exact.sqlSum("w_raw")} AS wsum
        FROM e GROUP BY alpha)
      SELECT e.source, e.alpha, e.n_docs, round(e.p, 6) AS p_nat,
        round(e.w_raw / s.wsum, 6) AS w,
        round(round(e.w_raw / s.wsum, 6) / e.p, 6) AS eff_epochs
      FROM e JOIN sums s ON e.alpha = s.alpha
      ORDER BY e.source, e.alpha"""))

  private val silCosSql =
    "CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) / " +
      "(sqrt(CAST(SUM(CAST(a2 AS DECIMAL(18,6))) AS DOUBLE)) * " +
      "sqrt(CAST(SUM(CAST(b2 AS DECIMAL(18,6))) AS DOUBLE)))"

  /** Simplified silhouette per IVF cell (Vendramin '10 calls this the
    * centroid-based silhouette): for each vector, a = cosine distance
    * to its OWN centroid, b = distance to the nearest OTHER centroid,
    * s = (b − a)/max(a, b) — the clustering-quality audit for the
    * index every ANN ladder serves from. Full silhouette is O(n²)
    * pairwise; the simplified form is the n×K centroid sweep the
    * assignment already pays, so the audit is free at index-build
    * time. Cosines are exact-decimal and rounded per convention;
    * cells aggregate a decimal-exact mean. */
  private val q201 = Q(
    "q201_cell_silhouette",
    (s, dir) => {
      import s.implicits._
      val all = graft.ops.Similarity.withNorms(
        Tables.spread(s, dir, "embeddings"), $"vec_id", $"embedding")
      val cents = all.filter($"id" < 16)
        .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
      val cos = all.crossJoin(broadcast(cents))
        .select($"id", $"cid",
          round(graft.ops.Similarity.dotExact("emb", "cemb") /
            (sqrt($"norm2") * sqrt($"cnorm2")), 6).as("ccos"))
      val own = graft.ops.Relational.topOnePerGroup(cos, Seq($"id"),
          Seq($"ccos".desc, $"cid".asc))
        .select($"id", $"cid".as("own_cid"), $"ccos".as("own_cos"))
      val other = cos.join(own, Seq("id")).filter($"cid" =!= $"own_cid")
        .groupBy($"id").agg(max($"ccos").as("other_cos"))
      val sil = own.join(other, Seq("id"))
        .select($"id", $"own_cid".as("cid"),
          (lit(1.0) - $"own_cos").as("a"), (lit(1.0) - $"other_cos").as("b"))
        .withColumn("sv", when(greatest($"a", $"b") > 0,
          round(($"b" - $"a") / greatest($"a", $"b"), 6)).otherwise(lit(0.0)))
      sil.groupBy($"cid")
        .agg(count(lit(1)).as("n"),
          round(Exact.dsum($"sv") / count(lit(1)), 6).as("mean_silhouette"))
        .orderBy($"cid")
    },
    Some(s"""
      WITH comp AS (
        SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS e
        FROM embeddings),
      parts AS (
        SELECT v.id, c.id AS cid, v.e * c.e AS p,
               v.e * v.e AS a2, c.e * c.e AS b2
        FROM comp v JOIN comp c ON v.i = c.i
        WHERE c.id < 16),
      cosv AS (
        SELECT id, cid, round($silCosSql, 6) AS ccos
        FROM parts GROUP BY id, cid),
      own AS (
        SELECT id, cid AS own_cid, ccos AS own_cos FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
            ORDER BY ccos DESC, cid) AS rn
          FROM cosv) WHERE rn = 1),
      oth AS (
        SELECT c.id, MAX(c.ccos) AS other_cos
        FROM cosv c JOIN own o ON c.id = o.id AND c.cid <> o.own_cid
        GROUP BY c.id),
      sil AS (
        SELECT o.own_cid AS cid, 1.0e0 - o.own_cos AS a,
               1.0e0 - t.other_cos AS b
        FROM own o JOIN oth t ON o.id = t.id),
      sil2 AS (
        SELECT cid, CASE WHEN GREATEST(a, b) > 0
          THEN round((b - a) / GREATEST(a, b), 6) ELSE 0.0e0 END AS sv
        FROM sil)
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n,
        round(${Exact.sqlSum("sv")} / COUNT(*), 6) AS mean_silhouette
      FROM sil2 GROUP BY cid ORDER BY cid"""))

  /** Language-ID calibration (reliability diagram + ECE): the q44
    * lexicon classifier's confidence — Laplace-smoothed posterior
    * (hits_best + 1)/(hits_total + 4) over the 4-language lexicon, so
    * confidence GROWS with evidence instead of saturating at 1.0 on a
    * single hit — bucketed into 5 bins against the ground-truth lang
    * column — per bin the mean confidence vs empirical accuracy, plus
    * the expected calibration error Σ (n_b/N)·|acc_b − conf_b|. A
    * classifier that says 0.9 and is right 60% of the time poisons
    * every downstream lang-keyed decision (splits, mixing, fertility);
    * this is the audit that catches it. Confidence ratios and bin
    * edges are IEEE-identical on both engines; means are decimal-exact
    * over 6-decimal terms. */
  private val q202 = Q(
    "q202_langid_calibration",
    (s, dir) => {
      import s.implicits._
      val lexicon = s.createDataFrame(Seq(
        ("the", "en"), ("a", "en"), ("of", "en"),
        ("le", "fr"), ("la", "fr"), ("et", "fr"),
        ("der", "de"), ("und", "de"), ("die", "de"),
        ("el", "es"), ("los", "es"), ("y", "es"))).toDF("token", "lang_guess")
      val d = docs(s, dir)
      val hits = d.select($"doc_id".as("doc"), $"lang",
          explode(TextOps.tokens($"text")).as("token"))
        .join(broadcast(lexicon), Seq("token"))
        .groupBy($"doc", $"lang", $"lang_guess").agg(count(lit(1)).as("hits"))
      val tot = hits.groupBy($"doc").agg(sum($"hits").as("tot"))
      val best = graft.ops.Relational.topOnePerGroup(hits, Seq($"doc"),
        Seq($"hits".desc, $"lang_guess".asc))
      val conf = best.join(tot, Seq("doc"))
        .select($"doc",
          (($"hits" + 1).cast("double") / ($"tot" + 4).cast("double"))
            .as("conf"),
          ($"lang_guess" === $"lang").cast("long").as("correct"))
        .withColumn("bin", least(lit(5L), ceil($"conf" * 5)).cast("long"))
      val wAll = Window.partitionBy(lit(1))
      conf.groupBy($"bin")
        .agg(count(lit(1)).as("n"),
          round(Exact.dsum(round($"conf", 6)) / count(lit(1)), 6)
            .as("mean_conf"),
          (sum($"correct").cast("double") / count(lit(1)).cast("double"))
            .as("accuracy"))
        .withColumn("__tot", sum($"n").over(wAll))
        .withColumn("ece", round(sum(
            round(($"n".cast("double") / $"__tot".cast("double")) *
              abs($"accuracy" - $"mean_conf"), 6).cast("decimal(18,6)"))
          .over(wAll).cast("double"), 6))
        .select($"bin", $"n", $"mean_conf", $"accuracy", $"ece")
        .orderBy($"bin")
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id AS doc, lang,
          unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents),
      lex(token, lang_guess) AS (VALUES
        ('the','en'), ('a','en'), ('of','en'),
        ('le','fr'), ('la','fr'), ('et','fr'),
        ('der','de'), ('und','de'), ('die','de'),
        ('el','es'), ('los','es'), ('y','es')),
      hits AS (
        SELECT doc, lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS hits
        FROM tok JOIN lex USING (token) GROUP BY doc, lang, lang_guess),
      tot AS (SELECT doc, CAST(SUM(hits) AS BIGINT) AS tot
              FROM hits GROUP BY doc),
      best AS (
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc
            ORDER BY hits DESC, lang_guess) AS rn
          FROM hits) WHERE rn = 1),
      conf AS (
        SELECT b.doc,
          CAST(b.hits + 1 AS DOUBLE) / CAST(t.tot + 4 AS DOUBLE) AS conf,
          CASE WHEN b.lang_guess = b.lang THEN 1 ELSE 0 END AS correct
        FROM best b JOIN tot t ON b.doc = t.doc),
      binned AS (
        SELECT LEAST(5, CAST(ceil(conf * 5) AS BIGINT)) AS bin,
          conf, correct
        FROM conf),
      agg AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
          round(${Exact.sqlSum("round(conf, 6)")} / COUNT(*), 6)
            AS mean_conf,
          CAST(SUM(correct) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS accuracy
        FROM binned GROUP BY bin),
      tots AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM agg),
      terms AS (
        SELECT bin, n, mean_conf, accuracy,
          CAST(round((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) *
            ABS(accuracy - mean_conf), 6) AS DECIMAL(18,6)) AS term
        FROM agg CROSS JOIN tots),
      ecet AS (SELECT round(CAST(SUM(term) AS DOUBLE), 6) AS ece FROM terms)
      SELECT bin, n, mean_conf, accuracy, ece
      FROM terms CROSS JOIN ecet ORDER BY bin"""))

  /** Confident-learning label-noise estimate (Northcutt '21, binary
    * form): the q135 NB quality classifier's scores against its own
    * heuristic labels — per class, the class-mean score is the
    * self-confidence threshold, and an example whose score crosses the
    * OTHER class's threshold is a suspected label error. The
    * off-diagonal mass estimates how noisy the heuristic labels are —
    * the number that decides whether a learned filter can outperform
    * the rules that trained it. Thresholds are decimal-exact means of
    * 6-decimal scores; every comparison is a deterministic double. */
  private val q203 = Q(
    "q203_label_noise_estimate",
    (s, dir) => {
      import s.implicits._
      def ts = TextOps.tokens($"text")
      val isPos = (size(ts) >= 20) and
        (aggregate(transform(ts, t => length(t).cast("double")),
          lit(0.0), (a, x) => a + x) / size(ts).cast("double") >= 3.5)
      // the GIVEN labels are the heuristic that trained the model (the
      // nbScore output's `label` is its PREDICTION, not the given one)
      val given = docs(s, dir).select($"doc_id".as("doc"), isPos.as("given"))
      val scored = LmScore.nbScore(docs(s, dir), $"doc_id", $"text",
          isPos, vocabK = 50)
        .select($"doc", $"score")
        .join(given, Seq("doc"))
      val th = scored.groupBy($"given")
        .agg(round(Exact.dsum(round($"score", 6)) / count(lit(1)), 6)
          .as("t"))
      val tpos = th.filter($"given").select($"t".as("t_pos"))
      val tneg = th.filter(!$"given").select($"t".as("t_neg"))
      scored.crossJoin(broadcast(tpos)).crossJoin(broadcast(tneg))
        .withColumn("suspect",
          when($"given", $"score" <= $"t_neg")
            .otherwise($"score" >= $"t_pos").cast("long"))
        .groupBy($"given".as("given_label"))
        .agg(count(lit(1)).as("n_total"), sum($"suspect").as("n_suspect"))
        .withColumn("suspect_rate",
          $"n_suspect".cast("double") / $"n_total".cast("double"))
        .orderBy($"given_label")
    },
    Some {
      val tsSql = "string_split_regex(trim(text), '\\s+')"
      val labelSql = s"""(len($tsSql) >= 20 AND
        CAST(list_sum(list_transform($tsSql, t -> length(t))) AS DOUBLE)
        / CAST(len($tsSql) AS DOUBLE) >= 3.5e0)"""
      s"""
      WITH ${LmScore.nbScoreSql("doc_id", "text", labelSql, 50)},
      given AS (SELECT doc_id AS doc, $labelSql AS given FROM documents),
      j AS (SELECT g.given, o.score
            FROM nbout o JOIN given g ON o.doc = g.doc),
      th AS (
        SELECT given,
          round(${Exact.sqlSum("round(score, 6)")} / COUNT(*), 6) AS t
        FROM j GROUP BY given),
      flagged AS (
        SELECT j.given AS given_label,
          CASE WHEN j.given THEN
            CASE WHEN j.score <= tn.t THEN 1 ELSE 0 END
          ELSE CASE WHEN j.score >= tp.t THEN 1 ELSE 0 END END AS suspect
        FROM j
        CROSS JOIN (SELECT t FROM th WHERE given) tp
        CROSS JOIN (SELECT t FROM th WHERE NOT given) tn)
      SELECT given_label, CAST(COUNT(*) AS BIGINT) AS n_total,
        CAST(SUM(suspect) AS BIGINT) AS n_suspect,
        CAST(SUM(suspect) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS suspect_rate
      FROM flagged GROUP BY given_label ORDER BY given_label"""
    })

  /** Dedup-threshold sweep: the aggressiveness curve a pipeline owner
    * reads before picking the Jaccard knob — for t ∈ {0.7, 0.8, 0.9},
    * how many near-dup pairs exist, how many docs the keep-first
    * policy would drop, and how much distinct-token mass goes with
    * them. One blocked self-join computes ALL thresholds (the pair
    * frame is built once; each threshold is an integer test
    * 10i ≥ t₁₀(za+zb−i) over it), so the sweep costs one q49, not
    * three. */
  private val q204 = Q(
    "q204_dedup_threshold_sweep",
    (s, dir) => {
      import s.implicits._
      val tr = docs(s, dir)
        .select($"doc_id".as("doc"),
          concat($"source", lit("#"),
            ($"n_chars" / 100).cast("int").cast("string")).as("block"),
          explode(array_distinct(TextOps.tokens($"text"))).as("token"))
      val sizes = tr.groupBy($"doc").agg(count(lit(1)).as("n"))
      val inter = tr.as("a").join(tr.as("b"),
          $"a.block" === $"b.block" && $"a.token" === $"b.token" &&
            $"a.doc" < $"b.doc")
        .groupBy($"a.doc".as("d1"), $"b.doc".as("d2"))
        .agg(count(lit(1)).as("i"))
      val pairs = inter
        .join(sizes.select($"doc".as("d1"), $"n".as("na")), Seq("d1"))
        .join(sizes.select($"doc".as("d2"), $"n".as("nb")), Seq("d2"))
        .select($"d1", $"d2", $"i", $"na", $"nb",
          explode(array(lit(7L), lit(8L), lit(9L))).as("thresh10"))
        .filter(lit(10) * $"i" >= $"thresh10" * ($"na" + $"nb" - $"i"))
      val np = pairs.groupBy($"thresh10").agg(count(lit(1)).as("n_pairs"))
      val dropped = pairs.select($"thresh10", $"d2", $"nb").distinct()
        .groupBy($"thresh10")
        .agg(count(lit(1)).as("n_docs_dropped"),
          sum($"nb").as("n_tokens_dropped"))
      np.join(dropped, Seq("thresh10"))
        .orderBy($"thresh10")
    },
    Some("""
      WITH tr AS (
        SELECT DISTINCT doc_id AS doc,
          source || '#' || CAST(CAST(n_chars // 100 AS INT) AS VARCHAR)
            AS block,
          unnest(list_distinct(string_split_regex(trim(text), '\s+')))
            AS token
        FROM documents),
      sz AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM tr GROUP BY doc),
      inter AS (
        SELECT a.doc AS d1, b.doc AS d2, CAST(COUNT(*) AS BIGINT) AS i
        FROM tr a JOIN tr b ON a.block = b.block AND a.token = b.token
          AND a.doc < b.doc
        GROUP BY 1, 2),
      pairs AS (
        SELECT i.d1, i.d2, i.i, sa.n AS na, sb.n AS nb, t.thresh10
        FROM inter i
        JOIN sz sa ON i.d1 = sa.doc JOIN sz sb ON i.d2 = sb.doc
        CROSS JOIN (SELECT unnest(ARRAY[CAST(7 AS BIGINT),
          CAST(8 AS BIGINT), CAST(9 AS BIGINT)]) AS thresh10) t
        WHERE 10 * i.i >= t.thresh10 * (sa.n + sb.n - i.i)),
      np AS (
        SELECT thresh10, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY thresh10),
      dropped AS (
        SELECT thresh10, CAST(COUNT(*) AS BIGINT) AS n_docs_dropped,
          CAST(SUM(nb) AS BIGINT) AS n_tokens_dropped
        FROM (SELECT DISTINCT thresh10, d2, nb FROM pairs)
        GROUP BY thresh10)
      SELECT np.thresh10, np.n_pairs, d.n_docs_dropped, d.n_tokens_dropped
      FROM np JOIN dropped d ON np.thresh10 = d.thresh10
      ORDER BY np.thresh10"""))

  /** IVF cell-balance audit: the load-factor summary of the inverted
    * file every ANN query fans into — max/mean imbalance is the
    * straggler-task predictor at serving time (a 10× hot cell means
    * nprobe=1 queries into it cost 10× the median), and the CV is the
    * one-number rebalance trigger. cv = √(k·Σn² − (Σn)²)/Σn keeps the
    * radicand an exact integer. */
  private val q205 = Q(
    "q205_ivf_cell_balance",
    (s, dir) => {
      import s.implicits._
      val all = graft.ops.Similarity.withNorms(
        Tables.spread(s, dir, "embeddings"), $"vec_id", $"embedding")
      val cents = all.filter($"id" < 16)
        .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
      val counts = graft.ops.Similarity.ivfAssign(all, cents)
        .groupBy($"cid").agg(count(lit(1)).as("n"))
      counts.agg(
          count(lit(1)).as("n_cells"),
          min($"n").as("n_min"), max($"n").as("n_max"),
          sum($"n").as("__s"), sum($"n" * $"n").as("__s2"))
        .select($"n_cells", $"n_min", $"n_max",
          round($"__s".cast("double") / $"n_cells".cast("double"), 6)
            .as("mean_sz"),
          round($"n_max".cast("double") /
            ($"__s".cast("double") / $"n_cells".cast("double")), 6)
            .as("imbalance"),
          round(sqrt(($"n_cells" * $"__s2" - $"__s" * $"__s")
            .cast("double")) / $"__s".cast("double"), 6).as("cv"))
    },
    Some(s"""
      WITH comp AS (
        SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS e
        FROM embeddings),
      parts AS (
        SELECT v.id, c.id AS cid, v.e * c.e AS p,
               v.e * v.e AS a2, c.e * c.e AS b2
        FROM comp v JOIN comp c ON v.i = c.i
        WHERE c.id < 16),
      cosv AS (
        SELECT id, cid, $silCosSql AS ccos
        FROM parts GROUP BY id, cid),
      own AS (
        SELECT id, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
            ORDER BY ccos DESC, cid) AS rn
          FROM cosv) WHERE rn = 1),
      counts AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n
                 FROM own GROUP BY cid),
      summ AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
          MIN(n) AS n_min, MAX(n) AS n_max,
          CAST(SUM(n) AS BIGINT) AS s, CAST(SUM(n * n) AS BIGINT) AS s2
        FROM counts)
      SELECT n_cells, n_min, n_max,
        round(CAST(s AS DOUBLE) / CAST(n_cells AS DOUBLE), 6) AS mean_sz,
        round(CAST(n_max AS DOUBLE) /
          (CAST(s AS DOUBLE) / CAST(n_cells AS DOUBLE)), 6) AS imbalance,
        round(sqrt(CAST(n_cells * s2 - s * s AS DOUBLE)) /
          CAST(s AS DOUBLE), 6) AS cv
      FROM summ"""))

  /** Cap-constrained mixture realization by water-filling: q200's
    * temperature weights say what share each source SHOULD contribute;
    * this allocates an actual token budget B = 50% of the corpus under
    * the hard per-source caps (a source cannot contribute more tokens
    * than it has — the real constraint every mixing recipe hits when a
    * small source's target share exceeds its size). Water-filling in
    * CLOSED FORM: sort sources by cap/w ascending, prefix-sum caps and
    * weights, λ_k = (B − C_{k−1})/(W − W_{k−1}) for each cutoff k, and
    * the first k with λ_k ≤ r_k is the exact solution — alloc_i =
    * min(cap_i, λ·w_i), saturated sources take their cap, the rest
    * split the remainder ∝ w. No iteration, no driver loop: two
    * source-sized window passes. */
  private val q206 = Q(
    "q206_budget_waterfill",
    (s, dir) => {
      import s.implicits._
      val wAll = Window.partitionBy(lit(1))
      val caps = docs(s, dir)
        .select($"source", size(TextOps.tokens($"text")).cast("long").as("nt"))
        .groupBy($"source").agg(sum($"nt").as("cap"))
      val base = caps
        .withColumn("ctot", sum($"cap").over(wAll))
        .withColumn("w", round(expr(
          "pow(CAST(cap AS DOUBLE) / CAST(ctot AS DOUBLE), " +
            "CAST(0.7 AS DOUBLE))"), 6))
        .withColumn("budget", $"ctot".cast("double") * 0.5)
        .withColumn("r", $"cap".cast("double") / $"w")
      val ord = Window.orderBy($"r".asc, $"source".asc)
      val ordPre = ord.rowsBetween(Window.unboundedPreceding, -1)
      val pre = base
        .withColumn("rk", row_number().over(ord))
        .withColumn("cpre", coalesce(sum($"cap").over(ordPre), lit(0L)))
        .withColumn("wtot",
          sum($"w".cast("decimal(18,6)")).over(wAll).cast("double"))
        .withColumn("wpre", coalesce(
          sum($"w".cast("decimal(18,6)")).over(ordPre).cast("double"),
          lit(0.0)))
        .withColumn("lam_k",
          ($"budget" - $"cpre".cast("double")) / ($"wtot" - $"wpre"))
      // feasibility always holds at k = n when B <= total cap, so the
      // 1-row limit is total (the frame is sources-sized)
      val lam = pre.filter($"lam_k" <= $"r").orderBy($"rk".asc).limit(1)
        .select($"lam_k".as("lam"))
      pre.crossJoin(broadcast(lam))
        .select($"source", $"cap", $"w",
          round(least($"cap".cast("double"), $"lam" * $"w"), 6).as("alloc"),
          ($"r" <= $"lam").as("saturated"))
        .orderBy($"source")
    },
    Some("""
      WITH toks AS (
        SELECT source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
        FROM documents),
      caps AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS cap
               FROM toks GROUP BY source),
      b1 AS (SELECT source, cap, CAST(SUM(cap) OVER () AS BIGINT) AS ctot
             FROM caps),
      b2 AS (
        SELECT *, round(pow(CAST(cap AS DOUBLE) / CAST(ctot AS DOUBLE),
            CAST(0.7 AS DOUBLE)), 6) AS w,
          CAST(ctot AS DOUBLE) * 0.5e0 AS budget
        FROM b1),
      b3 AS (SELECT *, CAST(cap AS DOUBLE) / w AS r FROM b2),
      b4 AS (
        SELECT *,
          ROW_NUMBER() OVER (ORDER BY r, source) AS rk,
          COALESCE(CAST(SUM(cap) OVER (ORDER BY r, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
            0) AS cpre,
          CAST(SUM(CAST(w AS DECIMAL(18,6))) OVER () AS DOUBLE) AS wtot,
          COALESCE(CAST(SUM(CAST(w AS DECIMAL(18,6))) OVER (
            ORDER BY r, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS DOUBLE),
            0.0e0) AS wpre
        FROM b3),
      b5 AS (
        SELECT *, (budget - CAST(cpre AS DOUBLE)) / (wtot - wpre) AS lam_k
        FROM b4),
      lam AS (SELECT lam_k AS lam FROM b5
              WHERE lam_k <= r ORDER BY rk LIMIT 1)
      SELECT source, cap, w,
        round(LEAST(CAST(cap AS DOUBLE), lam * w), 6) AS alloc,
        (r <= lam) AS saturated
      FROM b5 CROSS JOIN lam ORDER BY source"""))

  /** Mergeable histogram quantile sketch with an exact-error audit:
    * per-source P50/P90/P99 of n_chars estimated from a 32-bucket
    * equi-width histogram over the GLOBAL range — the sketch is
    * (source, bucket, count) rows, O(buckets) state, mergeable by
    * count addition across shards/batches (the streaming-quantile
    * shape), with every bucket edge an exact integer. The exact
    * nearest-rank quantile rides along as ground truth, and the bucket
    * width is the PROVEN error bound the estimate must sit inside —
    * the audit a scale pipeline runs before trusting sketched
    * percentiles for SLOs. Estimates are bucket upper edges, so
    * est ≥ exact always; everything is integer arithmetic. */
  private val q207 = Q(
    "q207_histogram_quantiles",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
        .select($"doc_id", $"source", $"n_chars".cast("long").as("x"))
      val g = d.agg(min($"x").as("gmin"), max($"x").as("gmax"))
      val hist = d.crossJoin(broadcast(g))
        .withColumn("span", $"gmax" - $"gmin" + 1)
        .withColumn("bucket", expr("((x - gmin) * 32) div span"))
        .groupBy($"source", $"bucket")
        .agg(count(lit(1)).as("c"), max($"gmin").as("gmin"),
          max($"span").as("span"))
      val wCum = Window.partitionBy($"source").orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wS = Window.partitionBy($"source")
      val cum = hist
        .withColumn("cum", sum($"c").over(wCum))
        .withColumn("n", sum($"c").over(wS))
      val picks = graft.ops.Relational.topOnePerGroup(
        cum.select($"source", $"bucket", $"cum", $"n", $"gmin", $"span",
            explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"))
          .filter($"cum" >= greatest(lit(1L), ceil($"q" * $"n"))),
        Seq($"source", $"q"), Seq($"bucket".asc))
        .withColumn("est", $"gmin" + expr("((bucket + 1) * span) div 32") - 1)
        .withColumn("err_bound", expr("(span + 31) div 32"))
      val exact = WindowOps.exactQuantiles(d, Seq(col("source")), $"x",
          $"doc_id", Seq(0.5, 0.9, 0.99))
        .select($"source", $"q", $"qvalue".as("exact"))
      picks.join(exact, Seq("source", "q"))
        .select($"source", $"q", $"est", $"exact",
          abs($"est" - $"exact").as("abs_err"), $"err_bound")
        .orderBy($"source", $"q")
    },
    Some("""
      WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x
                 FROM documents),
      g AS (SELECT MIN(x) AS gmin, MAX(x) AS gmax FROM d),
      hist AS (
        SELECT source, ((x - gmin) * 32) // (gmax - gmin + 1) AS bucket,
          CAST(COUNT(*) AS BIGINT) AS c,
          MAX(gmin) AS gmin, MAX(gmax - gmin + 1) AS span
        FROM d CROSS JOIN g GROUP BY 1, 2),
      cum AS (
        SELECT *,
          CAST(SUM(c) OVER (PARTITION BY source ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum,
          CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM hist),
      qq AS (SELECT unnest(ARRAY[CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
        CAST(0.99 AS DOUBLE)]) AS q),
      picks AS (
        SELECT source, q, bucket, gmin, span FROM (
          SELECT c.*, qq.q, ROW_NUMBER() OVER (PARTITION BY c.source, qq.q
            ORDER BY c.bucket) AS rn
          FROM cum c CROSS JOIN qq
          WHERE c.cum >= GREATEST(1, CAST(ceil(qq.q * c.n) AS BIGINT)))
        WHERE rn = 1),
      r AS (
        SELECT source, x, doc_id,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id) AS rn,
          CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM d),
      exact AS (
        SELECT source, q, x AS exact
        FROM r CROSS JOIN qq
        WHERE rn = GREATEST(1, CAST(ceil(q * n) AS BIGINT)))
      SELECT p.source, p.q,
        p.gmin + ((p.bucket + 1) * p.span) // 32 - 1 AS est,
        e.exact,
        ABS(p.gmin + ((p.bucket + 1) * p.span) // 32 - 1 - e.exact)
          AS abs_err,
        (p.span + 31) // 32 AS err_bound
      FROM picks p JOIN exact e ON p.source = e.source AND p.q = e.q
      ORDER BY p.source, p.q"""))

  /** Winsorized robust stats per source: clamp n_chars to the exact
    * [P1, P99] nearest-rank band and report raw vs winsorized means —
    * the robust-statistics pass corpus dashboards run so one pathological
    * crawl artifact (a 100 MB "document") cannot move a source's
    * reported average. Thresholds are a source-sized broadcast; sums
    * are exact integers (n_chars is integral), so the means are two
    * deterministic divisions. */
  private val q208 = Q(
    "q208_winsorized_stats",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
        .select($"source", $"doc_id", $"n_chars".cast("long").as("x"))
      val th = WindowOps.exactQuantiles(d, Seq(col("source")), $"x",
          $"doc_id", Seq(0.01, 0.99))
        .groupBy($"source").agg(
          max(when($"q" === 0.01, $"qvalue")).as("lo"),
          max(when($"q" === 0.99, $"qvalue")).as("hi"))
      d.join(broadcast(th), Seq("source"))
        .withColumn("wx", least(greatest($"x", $"lo"), $"hi"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n"),
          round(sum($"x").cast("double") / count(lit(1)).cast("double"), 6)
            .as("mean"),
          round(sum($"wx").cast("double") / count(lit(1)).cast("double"), 6)
            .as("wins_mean"),
          sum(($"x" < $"lo" || $"x" > $"hi").cast("long")).as("n_clamped"))
        .orderBy($"source")
    },
    Some("""
      WITH d AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS x
                 FROM documents),
      r AS (
        SELECT source, x,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id) AS rn,
          CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM d),
      th AS (
        SELECT source,
          MAX(CASE WHEN rn = GREATEST(1,
            CAST(ceil(0.01e0 * n) AS BIGINT)) THEN x END) AS lo,
          MAX(CASE WHEN rn = GREATEST(1,
            CAST(ceil(0.99e0 * n) AS BIGINT)) THEN x END) AS hi
        FROM r GROUP BY source),
      w AS (
        SELECT d.source, d.x, LEAST(GREATEST(d.x, th.lo), th.hi) AS wx,
          CASE WHEN d.x < th.lo OR d.x > th.hi THEN 1 ELSE 0 END AS clamped
        FROM d JOIN th ON d.source = th.source)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        round(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean,
        round(CAST(SUM(wx) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
          AS wins_mean,
        CAST(SUM(clamped) AS BIGINT) AS n_clamped
      FROM w GROUP BY source ORDER BY source"""))

  /** Length-confound audit: Spearman rank correlation between document
    * length and LM perplexity per language — ρ = 1 − 6Σd²/(n(n²−1))
    * over integer ranks (ties broken by doc id, the documented
    * simplification of tie-averaged ranks). A "quality" score that is
    * mostly a length proxy re-implements the length gate with extra
    * steps; a strong |ρ| here says exactly that before anyone mixes on
    * it. Σd² is an exact integer; one double division per language. */
  private val q209 = Q(
    "q209_length_confound",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val scored = LmScore.lmScore(d, $"doc_id", $"text",
          vocabK = 50, pplFlag = 32.0)
        .select($"doc".as("doc_id"), $"ppl")
      val j = d.select($"doc_id", $"lang", $"n_chars")
        .join(scored, Seq("doc_id"))
      val w1 = Window.partitionBy($"lang").orderBy($"n_chars".asc, $"doc_id".asc)
      val w2 = Window.partitionBy($"lang").orderBy($"ppl".asc, $"doc_id".asc)
      j.withColumn("r1", row_number().over(w1).cast("long"))
        .withColumn("r2", row_number().over(w2).cast("long"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n"),
          sum(($"r1" - $"r2") * ($"r1" - $"r2")).as("sd2"))
        .select($"lang", $"n",
          round(lit(1.0) - lit(6.0) * $"sd2".cast("double") /
            ($"n" * ($"n" * $"n" - 1)).cast("double"), 6)
            .as("spearman_rho"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH ${LmScore.lmScoreSql("doc_id", "text", 50, 32.0)},
      j AS (
        SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
          l.ppl
        FROM documents d JOIN lmout l ON d.doc_id = l.doc),
      ranked AS (
        SELECT lang,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY n_chars, doc_id) AS BIGINT) AS r1,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY ppl, doc_id) AS BIGINT) AS r2
        FROM j)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        round(1.0e0 - 6.0e0 * CAST(SUM((r1 - r2) * (r1 - r2)) AS DOUBLE) /
          CAST(COUNT(*) * (COUNT(*) * COUNT(*) - 1) AS DOUBLE), 6)
          AS spearman_rho
      FROM ranked GROUP BY lang ORDER BY lang"""))

  /** Corpus self-redundancy by clipped bigram precision — the micro-
    * averaged Self-BLEU-2 idea (Zhu et al. '18, Texygen): for each
    * document, how many of its bigram OCCURRENCES also occur elsewhere
    * in the corpus (clipped at the elsewhere-count, BLEU's modified
    * precision), aggregated per source as Σclipped/Σbigrams. distinct-n
    * (q170) counts unique n-grams; this weights by occurrence mass, so
    * a source that is one template stamped 1000× scores ~1.0 even when
    * its distinct-2 looks healthy. All-integer until one division per
    * source: two map-side-combined groupBys and one equi-join on the
    * bigram — the corpus-count table is vocab²-bounded, the join is
    * the standard n-gram-keyed shuffle. */
  private val q212 = Q(
    "q212_selfbleu_redundancy",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val bc = d.withColumn("ts", TextOps.tokens($"text"))
        .select($"doc_id", $"source",
          explode(TextOps.shingles("ts", 2)).as("g"))
        .groupBy($"doc_id", $"source", $"g")
        .agg(count(lit(1)).as("c"))
      val cc = bc.groupBy($"g").agg(sum($"c").as("ct"))
      bc.join(cc, Seq("g"))
        .groupBy($"source")
        .agg(countDistinct($"doc_id").as("n_docs"),
          sum(least($"c", $"ct" - $"c")).cast("long").as("n_clipped"),
          sum($"c").cast("long").as("n_bigrams"))
        .withColumn("self_bleu2",
          round($"n_clipped".cast("double") / $"n_bigrams".cast("double"),
            6))
        .orderBy($"source")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, source,
                   string_split_regex(trim(text), '\\s+') AS ts
                 FROM documents),
      bg AS (
        SELECT doc_id, source, unnest(list_transform(
          generate_series(1, len(ts) - 1),
          i -> ts[i] || ' ' || ts[i+1])) AS g
        FROM t),
      bc AS (SELECT doc_id, source, g, CAST(COUNT(*) AS BIGINT) AS c
             FROM bg GROUP BY 1, 2, 3),
      cc AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ct FROM bc GROUP BY g)
      SELECT bc.source,
        CAST(COUNT(DISTINCT bc.doc_id) AS BIGINT) AS n_docs,
        CAST(SUM(LEAST(bc.c, cc.ct - bc.c)) AS BIGINT) AS n_clipped,
        CAST(SUM(bc.c) AS BIGINT) AS n_bigrams,
        round(CAST(SUM(LEAST(bc.c, cc.ct - bc.c)) AS DOUBLE) /
          CAST(SUM(bc.c) AS DOUBLE), 6) AS self_bleu2
      FROM bc JOIN cc ON bc.g = cc.g
      GROUP BY bc.source ORDER BY bc.source"""))

  /** RANK-error mergeable quantile sketch with an exact-error audit
    * (r15 verdict #3 — the production upgrade over q207): per-source
    * P50/P90/P99 of n_chars from [[graft.ops.Sketch.rankSketch]]
    * (GK-shape equi-depth summaries over 32 fixed logical shards,
    * k = 64 points each), with the exact nearest-rank quantile riding
    * as ground truth and the PROVEN rank bound Σ_s(⌈m_s/k⌉−1) ≤ n/64
    * beside the measured rank error. Where q207's equi-width histogram
    * bound is the bucket width — vacuous once one outlier stretches
    * the global range — this bound is a rank: distribution-free, the
    * guarantee an SLO dashboard actually needs on heavy-tailed length
    * distributions. est ≥ exact always (the estimator returns the
    * first sketch point whose summed rmin clears the target rank);
    * rank_err is how many ranks above target the estimate landed,
    * measured against the full data (greatest(0,·): duplicate-heavy
    * sources can land the estimate exactly ON the target). Everything
    * is integer arithmetic over md5-derived shards, so the DuckDB twin
    * is bit-identical. */
  private val q249 = Q(
    "q249_rank_quantile_sketch",
    (s, dir) => {
      import s.implicits._
      import graft.ops.Sketch
      val d = docs(s, dir)
        .select($"doc_id", $"source", $"n_chars".cast("long").as("x"))
      val sk = Sketch.rankSketch(d, $"source", $"x", $"doc_id",
        shards = 32, k = 64)
      val est = Sketch.rankQuantiles(sk, k = 64, Seq(0.5, 0.9, 0.99))
        .withColumnRenamed("key", "source")
      val exact = WindowOps.exactQuantiles(d, Seq(col("source")), $"x",
          $"doc_id", Seq(0.5, 0.9, 0.99))
        .select($"source", $"q", $"qvalue".as("exact"))
      val lt = d
        .join(broadcast(est.select($"source", $"q", $"est")), Seq("source"))
        .filter($"x" < $"est")
        .groupBy($"source", $"q").agg(count(lit(1)).as("cnt_lt"))
      est.join(exact, Seq("source", "q"))
        .join(lt, Seq("source", "q"), "left")
        .select($"source", $"q", $"t_rank", $"n", $"est", $"exact",
          greatest(lit(0L),
            coalesce($"cnt_lt", lit(0L)) + lit(1L) - $"t_rank")
            .as("rank_err"),
          $"err_bound")
        .orderBy($"source", $"q")
    },
    Some(s"""
      WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x
                 FROM documents),
      sh AS (SELECT source, doc_id, x,
               ${TextOps.h64Sql("CAST(doc_id AS VARCHAR)")} % 32 AS shard
             FROM d),
      rn AS (SELECT source, shard, x,
               CAST(ROW_NUMBER() OVER (PARTITION BY source, shard
                 ORDER BY x, doc_id) AS BIGINT) AS r,
               CAST(COUNT(*) OVER (PARTITION BY source, shard) AS BIGINT)
                 AS m
             FROM sh),
      kept AS (SELECT source, shard, x, r, m FROM rn
               WHERE (r * 64) // m > ((r - 1) * 64) // m),
      del AS (SELECT source, shard, x, r,
                r - COALESCE(LAG(r) OVER (PARTITION BY source, shard
                  ORDER BY r), 0) AS delta
              FROM kept),
      cum AS (SELECT *, CAST(SUM(delta) OVER (PARTITION BY source
                ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW) AS BIGINT) AS grank
              FROM del),
      tot AS (SELECT source, CAST(SUM(m) AS BIGINT) AS n,
                CAST(SUM((m + 63) // 64 - 1) AS BIGINT) AS err_bound
              FROM (SELECT source, shard, MAX(r) AS m
                    FROM kept GROUP BY source, shard)
              GROUP BY source),
      qq AS (SELECT unnest(ARRAY[CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
               CAST(0.99 AS DOUBLE)]) AS q),
      cand AS (SELECT c.source, qq.q, c.x, t.n, t.err_bound,
                 GREATEST(1, CAST(ceil(qq.q * t.n) AS BIGINT)) AS t_rank
               FROM cum c JOIN tot t ON c.source = t.source CROSS JOIN qq
               WHERE c.grank >=
                 GREATEST(1, CAST(ceil(qq.q * t.n) AS BIGINT))),
      est AS (SELECT source, q, t_rank, n, x AS est, err_bound FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY source, q
                  ORDER BY x) AS rk
                FROM cand) WHERE rk = 1),
      r2 AS (SELECT source, x,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id)
                 AS rn2,
               CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS nn
             FROM d),
      ex AS (SELECT source, q, x AS exact FROM r2 CROSS JOIN qq
             WHERE rn2 = GREATEST(1, CAST(ceil(q * nn) AS BIGINT))),
      lt AS (SELECT e.source, e.q, CAST(COUNT(*) AS BIGINT) AS cnt_lt
             FROM est e JOIN d ON d.source = e.source AND d.x < e.est
             GROUP BY e.source, e.q)
      SELECT e.source, e.q, e.t_rank, e.n, e.est, x.exact,
        GREATEST(0, COALESCE(l.cnt_lt, 0) + 1 - e.t_rank) AS rank_err,
        e.err_bound
      FROM est e JOIN ex x ON e.source = x.source AND e.q = x.q
      LEFT JOIN lt l ON e.source = l.source AND e.q = l.q
      ORDER BY e.source, e.q"""))

  /** Global quantile ROLLUP from the per-source rank sketches — the
    * mergeable-summary payoff, the q177 '__all__' register-merge
    * pattern applied to quantiles: corpus-wide P50/P90/P99 computed
    * from the UNION of q249's per-(source, shard) summaries, never
    * re-touching the data. Each sub-summary brackets its own ranks
    * within ⌈m/k⌉−1, and global rank = Σ per-summary ranks, so the
    * bounds ADD: the rollup's bound is Σ over every (source, shard)
    * cell — still ≤ n/k + cells. The rollup itself touches only
    * sketch rows (≤ sources·P·k, ~41k here regardless of corpus
    * size): the one unpartitioned ordered window below is over that
    * bounded frame BY CONSTRUCTION (the contract every bounded
    * whole-frame window in this repo states in-code), so a 100 TB
    * corpus's global quantiles cost a sketch-row sort plus the
    * (audit-only) exact rider. */
  private val q250 = Q(
    "q250_rank_sketch_rollup",
    (s, dir) => {
      import s.implicits._
      import graft.ops.Sketch
      val d = docs(s, dir)
        .select($"doc_id", $"source", $"n_chars".cast("long").as("x"))
      val sk = Sketch.rankSketch(d, $"source", $"x", $"doc_id",
        shards = 32, k = 64)
      // 1-row totals: exact n (Σ per-cell m) and the summed bound
      val tot = sk.groupBy($"key", $"shard").agg(max($"r").as("m"))
        .agg(sum($"m").as("n"),
          sum(expr("(m + 63) div 64 - 1")).as("err_bound"))
      val wCum = Window.partitionBy($"g").orderBy($"x")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = sk.withColumn("g", lit(1))
        .withColumn("grank", sum($"delta").over(wCum))
      val cand = cum.crossJoin(broadcast(tot))
        .withColumn("q", explode(array(lit(0.5), lit(0.9), lit(0.99))))
        .withColumn("t_rank", greatest(lit(1L), ceil($"q" * $"n")))
        .filter($"grank" >= $"t_rank")
      val est = graft.ops.Relational.topOnePerGroup(cand,
          Seq(col("q")), Seq(col("x").asc))
        .select($"q", $"t_rank", $"n", $"x".as("est"), $"err_bound")
      val exact = WindowOps.exactQuantiles(d.withColumn("g", lit(1)),
          Seq(col("g")), $"x", $"doc_id", Seq(0.5, 0.9, 0.99))
        .select($"q", $"qvalue".as("exact"))
      val lt = d.crossJoin(broadcast(est.select($"q", $"est")))
        .filter($"x" < $"est")
        .groupBy($"q").agg(count(lit(1)).as("cnt_lt"))
      est.join(exact, Seq("q"))
        .join(lt, Seq("q"), "left")
        .select($"q", $"t_rank", $"n", $"est", $"exact",
          greatest(lit(0L),
            coalesce($"cnt_lt", lit(0L)) + lit(1L) - $"t_rank")
            .as("rank_err"),
          $"err_bound")
        .orderBy($"q")
    },
    Some(s"""
      WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x
                 FROM documents),
      sh AS (SELECT source, doc_id, x,
               ${TextOps.h64Sql("CAST(doc_id AS VARCHAR)")} % 32 AS shard
             FROM d),
      rn AS (SELECT source, shard, x,
               CAST(ROW_NUMBER() OVER (PARTITION BY source, shard
                 ORDER BY x, doc_id) AS BIGINT) AS r,
               CAST(COUNT(*) OVER (PARTITION BY source, shard) AS BIGINT)
                 AS m
             FROM sh),
      kept AS (SELECT source, shard, x, r, m FROM rn
               WHERE (r * 64) // m > ((r - 1) * 64) // m),
      del AS (SELECT source, shard, x, r,
                r - COALESCE(LAG(r) OVER (PARTITION BY source, shard
                  ORDER BY r), 0) AS delta
              FROM kept),
      gcum AS (SELECT x, CAST(SUM(delta) OVER (ORDER BY x
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS grank
               FROM del),
      gtot AS (SELECT CAST(SUM(m) AS BIGINT) AS n,
                 CAST(SUM((m + 63) // 64 - 1) AS BIGINT) AS err_bound
               FROM (SELECT source, shard, MAX(r) AS m
                     FROM kept GROUP BY source, shard)),
      qq AS (SELECT unnest(ARRAY[CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
               CAST(0.99 AS DOUBLE)]) AS q),
      cand AS (SELECT qq.q, c.x, t.n, t.err_bound,
                 GREATEST(1, CAST(ceil(qq.q * t.n) AS BIGINT)) AS t_rank
               FROM gcum c CROSS JOIN gtot t CROSS JOIN qq
               WHERE c.grank >=
                 GREATEST(1, CAST(ceil(qq.q * t.n) AS BIGINT))),
      est AS (SELECT q, t_rank, n, x AS est, err_bound FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY q
                  ORDER BY x) AS rk
                FROM cand) WHERE rk = 1),
      r2 AS (SELECT x,
               ROW_NUMBER() OVER (ORDER BY x, doc_id) AS rn2,
               CAST(COUNT(*) OVER () AS BIGINT) AS nn
             FROM d),
      ex AS (SELECT q, x AS exact FROM r2 CROSS JOIN qq
             WHERE rn2 = GREATEST(1, CAST(ceil(q * nn) AS BIGINT))),
      lt AS (SELECT e.q, CAST(COUNT(*) AS BIGINT) AS cnt_lt
             FROM est e JOIN d ON d.x < e.est
             GROUP BY e.q)
      SELECT e.q, e.t_rank, e.n, e.est, x.exact,
        GREATEST(0, COALESCE(l.cnt_lt, 0) + 1 - e.t_rank) AS rank_err,
        e.err_bound
      FROM est e JOIN ex x ON e.q = x.q
      LEFT JOIN lt l ON e.q = l.q
      ORDER BY e.q"""))

  /** TOKEN-WEIGHTED length quantiles from the weighted rank sketch
    * (r16 verdict #3): "what document length does the median TOKEN sit
    * in?" — the curriculum/packing question, which unit ranks cannot
    * answer (a  handful of giant documents carry most of the training
    * mass). Same q249 anatomy with mass in place of count:
    * rankSketchWeighted keeps first-crossings of cumulative token
    * mass (the stream compressor's rule, so batch and stream remain
    * one logical operator), rankQuantiles reads mass targets
    * t = ⌈q·n⌉ off the UNCHANGED estimator, and the audit rider is
    * the exact weighted nearest-rank quantile — the unique row whose
    * mass interval (cw−w, cw] contains t — plus rank_err = how far
    * the estimate's mass-interval start overshoots the target,
    * measured against full data (≤ err_bound by the weighted bound
    * proof in the scaladoc, asserted in RankSketchSpec). Everything
    * is integer mass arithmetic over md5-derived shards, so the
    * DuckDB twin is bit-identical; the sketch itself is ≤ 32·64 rows
    * per source at ANY corpus size, and the exact rider is the
    * audit-only data-sized pass (q249/q121 pattern). */
  private val q251 = Q(
    "q251_weighted_rank_sketch",
    (s, dir) => {
      import s.implicits._
      import graft.ops.Sketch
      val d = docs(s, dir)
        .select($"doc_id", $"source", $"n_chars".cast("long").as("x"),
          size(TextOps.tokens($"text")).cast("long").as("w"))
      val sk = Sketch.rankSketchWeighted(d, $"source", $"x", $"w",
        $"doc_id", shards = 32, k = 64)
      val est = Sketch.rankQuantiles(sk, k = 64, Seq(0.5, 0.9, 0.99))
        .withColumnRenamed("key", "source")
      // exact weighted nearest-rank: the one row whose cumulative-mass
      // interval contains the target (w >= 1 always: token count of a
      // trimmed text is at least 1 in both engines)
      val wCum = Window.partitionBy($"source").orderBy($"x", $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = d.withColumn("cw", sum($"w").over(wCum))
      val exact = cum
        .join(broadcast(est.select($"source", $"q", $"t_rank")), Seq("source"))
        .filter($"cw" >= $"t_rank" && $"cw" - $"w" < $"t_rank")
        .select($"source", $"q", $"x".as("exact"))
      val lt = d
        .join(broadcast(est.select($"source", $"q", $"est")), Seq("source"))
        .filter($"x" < $"est")
        .groupBy($"source", $"q").agg(sum($"w").as("mass_lt"))
      est.join(exact, Seq("source", "q"))
        .join(lt, Seq("source", "q"), "left")
        .select($"source", $"q", $"t_rank", $"n", $"est", $"exact",
          greatest(lit(0L),
            coalesce($"mass_lt", lit(0L)) + lit(1L) - $"t_rank")
            .as("rank_err"),
          $"err_bound")
        .orderBy($"source", $"q")
    },
    Some(s"""
      WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x,
                   CAST(len(string_split_regex(trim(text), '\\s+'))
                     AS BIGINT) AS w
                 FROM documents),
      sh AS (SELECT source, doc_id, x, w,
               ${TextOps.h64Sql("CAST(doc_id AS VARCHAR)")} % 32 AS shard
             FROM d),
      cwt AS (SELECT source, shard, x, w,
                CAST(SUM(w) OVER (PARTITION BY source, shard
                  ORDER BY x, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS BIGINT) AS cw,
                CAST(SUM(w) OVER (PARTITION BY source, shard)
                  AS BIGINT) AS wtot
              FROM sh),
      kept AS (SELECT source, shard, x, cw AS r FROM cwt
               WHERE (cw * 64) // wtot > ((cw - w) * 64) // wtot),
      del AS (SELECT source, shard, x, r,
                r - COALESCE(LAG(r) OVER (PARTITION BY source, shard
                  ORDER BY r), 0) AS delta
              FROM kept),
      cum AS (SELECT *, CAST(SUM(delta) OVER (PARTITION BY source
                ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW) AS BIGINT) AS grank
              FROM del),
      tot AS (SELECT source, CAST(SUM(m) AS BIGINT) AS n,
                CAST(SUM((m + 63) // 64 - 1) AS BIGINT) AS err_bound
              FROM (SELECT source, shard, MAX(r) AS m
                    FROM kept GROUP BY source, shard)
              GROUP BY source),
      qq AS (SELECT unnest(ARRAY[CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
               CAST(0.99 AS DOUBLE)]) AS q),
      cand AS (SELECT c.source, qq.q, c.x, t.n, t.err_bound,
                 GREATEST(1, CAST(ceil(qq.q * t.n) AS BIGINT)) AS t_rank
               FROM cum c JOIN tot t ON c.source = t.source CROSS JOIN qq
               WHERE c.grank >=
                 GREATEST(1, CAST(ceil(qq.q * t.n) AS BIGINT))),
      est AS (SELECT source, q, t_rank, n, x AS est, err_bound FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY source, q
                  ORDER BY x) AS rk
                FROM cand) WHERE rk = 1),
      cw2 AS (SELECT source, doc_id, x, w,
                CAST(SUM(w) OVER (PARTITION BY source ORDER BY x, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cw
              FROM d),
      ex AS (SELECT c.source, e.q, c.x AS exact
             FROM cw2 c JOIN est e ON c.source = e.source
             WHERE c.cw >= e.t_rank AND c.cw - c.w < e.t_rank),
      lt AS (SELECT e.source, e.q, CAST(SUM(d.w) AS BIGINT) AS mass_lt
             FROM est e JOIN d ON d.source = e.source AND d.x < e.est
             GROUP BY e.source, e.q)
      SELECT e.source, e.q, e.t_rank, e.n, e.est, x.exact,
        GREATEST(0, COALESCE(l.mass_lt, 0) + 1 - e.t_rank) AS rank_err,
        e.err_bound
      FROM est e JOIN ex x ON e.source = x.source AND e.q = x.q
      LEFT JOIN lt l ON e.source = l.source AND e.q = l.q
      ORDER BY e.source, e.q"""))

  def queries: Seq[Q] =
    Seq(q196, q197, q198, q199, q200, q201, q202, q203, q204, q205,
      q206, q207, q208, q209, q212, q249, q250, q251)
}
