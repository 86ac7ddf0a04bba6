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
    * Bloom filter (k = 3 Kirsch–Mitzenmacher probes p_j = h1 + j·h2
    * mod m — one md5 digest feeds the family, as in the minhash
    * machinery) stored in the HLL-style PINNED layout: 512 32-bit
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
      val bloom = ref
        .select(explode(expr("sequence(0, 2)")).as("j"), $"h1", $"h2")
        .select(pmod($"h1" + $"j" * $"h2", lit(m)).as("p"))
        .select(expr("p div 32").as("word"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("mask"))
        .groupBy($"word").agg(expr("bit_or(mask)").as("bits"))
      val probes = cur
        .select($"doc", $"h1", $"h2", explode(expr("sequence(0, 2)")).as("j"))
        .withColumn("p", pmod($"h1" + $"j" * $"h2", lit(m)))
        .select($"doc", $"h1", $"h2", expr("p div 32").as("word"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("mask"))
        .join(broadcast(bloom), Seq("word"), "left")
        .withColumn("__ok",
          when($"bits".isNotNull && ($"bits".bitwiseAND($"mask") =!= 0L), 1L)
            .otherwise(0L))
      val perSpan = probes.groupBy($"doc", $"h1", $"h2")
        .agg((sum($"__ok") === 3L).as("bloom_hit"))
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
        SELECT (h1 + j * h2) % 16384 // 32 AS word,
          bit_or(CAST(1 AS BIGINT) << CAST((h1 + j * h2) % 16384 % 32 AS INT))
            AS bits
        FROM ref, (SELECT unnest(generate_series(0, 2)) AS j) js
        GROUP BY 1),
      probes AS (
        SELECT c.doc, c.h1, c.h2,
          CASE WHEN b.bits IS NOT NULL AND
            (b.bits & (CAST(1 AS BIGINT) <<
              CAST((c.h1 + j.j * c.h2) % 16384 % 32 AS INT))) <> 0
            THEN 1 ELSE 0 END AS ok
        FROM cur c
        CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) j
        LEFT JOIN bloom b ON (c.h1 + j.j * c.h2) % 16384 // 32 = b.word),
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

  def queries: Seq[Q] = Seq(q196, q197, q198, q199, q200)
}
