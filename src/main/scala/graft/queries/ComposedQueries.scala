package graft.queries

import graft.Tables
import graft.ops.{CorpusPipelineV2, Drift, Exact, Sampling, Shard, TextOps}
import org.apache.spark.sql.functions._

/** The composed corpus pipeline's own CORRECTNESS row (r9 verdict,
  * Next #1): every stage of [[graft.ops.CorpusPipelineV2]] is
  * individually oracle-checked elsewhere (q149, q76, q143, q99, q62,
  * q126, q150, q88, q132, q151, q159), but the COMPOSITION — each
  * stage consuming the previous stage's actual output instead of the
  * raw table — only had specs and a bench row. q221 materializes the
  * pipeline's end-state as one deterministic frame and walks the
  * ENTIRE nine-stage DAG plus both audit gates in DuckDB as a single
  * unrolled CTE chain: the q192/q210 oracle pattern at pipeline scale.
  */
object ComposedQueries extends QueryGroup {

  /** Distinct-token rows (doc, block, token) over a CTE `t` carrying
    * (doc_id, <blockExpr>, <textExpr>). */
  private def tokenRowsSql(table: String, blockExpr: String,
      textExpr: String): String = s"""
        SELECT doc_id AS doc, $blockExpr AS block,
          unnest(list_distinct(string_split_regex(trim($textExpr), '\\s+')))
            AS token
        FROM $table"""

  private val psiQs = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)

  private val q221Sql: String = {
    val thCols = psiQs.zipWithIndex.map { case (q, i) =>
      s"MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(${q}e0 * n) AS BIGINT))" +
        s" THEN CAST(n_chars AS DOUBLE) END) AS t${i + 1}"
    }.mkString(",\n          ")
    val binExpr = (1 to psiQs.size)
      .map(i => s"(CASE WHEN CAST(w.n_chars AS DOUBLE) > t$i THEN 1 ELSE 0 END)")
      .mkString("1 + ", "\n            + ", "")
    s"""
      WITH RECURSIVE
      -- stage 1 (q149): normalized exact dedup, keep the min-id canonical
      h AS MATERIALIZED (
        SELECT doc_id, text, source, n_chars,
          md5(${TextOps.normalizeTextSql("text")}) AS norm_hash
        FROM documents),
      canon AS MATERIALIZED (
        SELECT norm_hash, MIN(doc_id) AS doc_id FROM h GROUP BY norm_hash),
      uniq AS MATERIALIZED (
        SELECT h.doc_id, h.text, h.source, h.n_chars
        FROM h JOIN canon
          ON h.norm_hash = canon.norm_hash AND h.doc_id = canon.doc_id),
      -- stage 2 (q76): quality gates + keep-first near-dup suppression
      -- over the UNIQUE docs, then the deterministic 50% hash sample
      ${TextOps.corpusDecisionsSqlFrom("uniq")},
      keptd AS MATERIALIZED (SELECT doc_id FROM decisions WHERE decision = 'kept'),
      sampled AS MATERIALIZED (
        SELECT u.doc_id, u.text, u.source, u.n_chars
        FROM uniq u JOIN keptd k ON u.doc_id = k.doc_id
        WHERE ${Sampling.hashRateSampleSql("CAST(u.doc_id AS VARCHAR)", 500, 1000)}),
      -- stage 3 (q143): source-blocked containment, drop the subsumed side
      ctr AS MATERIALIZED (${tokenRowsSql("sampled", "source", "text")}),
      csz AS MATERIALIZED (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM ctr GROUP BY doc),
      cinter AS MATERIALIZED (
        SELECT a.doc AS d1, b.doc AS d2, CAST(COUNT(*) AS BIGINT) AS i
        FROM ctr a JOIN ctr b ON a.block = b.block AND a.token = b.token
          AND a.doc < b.doc
        GROUP BY 1, 2),
      subsumed AS MATERIALIZED (
        SELECT DISTINCT CASE WHEN sa.n < sb.n THEN d1 ELSE d2 END AS doc_id
        FROM cinter JOIN csz sa ON d1 = sa.doc JOIN csz sb ON d2 = sb.doc
        WHERE CAST(i AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.9e0),
      unquoted AS MATERIALIZED (
        SELECT s.* FROM sampled s
        LEFT JOIN subsumed x ON s.doc_id = x.doc_id
        WHERE x.doc_id IS NULL),
      -- stage 4 (q99): corpus-wide 10-word-line scrub + reassembly
      w AS MATERIALIZED (
        SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS i,
               unnest(string_split(text, ' ')) AS word
        FROM unquoted),
      l AS MATERIALIZED (
        SELECT doc_id, i // 10 AS line_no,
               string_agg(word, ' ' ORDER BY i) AS line
        FROM w GROUP BY doc_id, i // 10),
      boiler AS MATERIALIZED (
        SELECT line FROM l GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2),
      keptl AS MATERIALIZED (
        SELECT l.* FROM l LEFT JOIN boiler b ON l.line = b.line
        WHERE b.line IS NULL),
      cleaned AS MATERIALIZED (
        SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS clean_text
        FROM keptl GROUP BY doc_id),
      cleaned2 AS MATERIALIZED (
        SELECT c.doc_id, u.source, c.clean_text,
               CAST(length(c.clean_text) AS BIGINT) AS n_chars
        FROM cleaned c JOIN unquoted u ON c.doc_id = u.doc_id),
      -- stage 5 (q62): blocked-Jaccard edges over the CLEANED text,
      -- min-label components via the recursive reach
      tr2 AS MATERIALIZED (${tokenRowsSql("cleaned2",
        "source || '#' || CAST(CAST(n_chars // 100 AS INT) AS VARCHAR)",
        "clean_text")}),
      sz2 AS MATERIALIZED (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM tr2 GROUP BY doc),
      inter2 AS MATERIALIZED (
        SELECT a.doc AS d1, b.doc AS d2, CAST(COUNT(*) AS BIGINT) AS i
        FROM tr2 a JOIN tr2 b ON a.block = b.block AND a.token = b.token
          AND a.doc < b.doc
        GROUP BY 1, 2),
      e2 AS MATERIALIZED (
        SELECT d1, d2
        FROM inter2 JOIN sz2 sa ON d1 = sa.doc JOIN sz2 sb ON d2 = sb.doc
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.9),
      sym AS MATERIALIZED (SELECT d1 AS s, d2 AS t FROM e2 UNION SELECT d2, d1 FROM e2),
      reach(node, label) AS (
        SELECT doc_id, doc_id FROM cleaned2
        UNION
        SELECT s.s, r.label FROM reach r JOIN sym s ON r.node = s.t),
      clusters AS MATERIALIZED (
        SELECT node AS doc_id, MIN(label) AS cluster
        FROM reach GROUP BY node),
      -- stage 6 (q126): keep the longest doc per cluster
      sized AS MATERIALIZED (
        SELECT cl.cluster, c2.doc_id, c2.source, c2.clean_text, c2.n_chars
        FROM clusters cl JOIN cleaned2 c2 ON cl.doc_id = c2.doc_id),
      keepers AS MATERIALIZED (
        SELECT doc_id, source, clean_text, n_chars FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
                      ORDER BY n_chars DESC, doc_id) AS rn
          FROM sized) WHERE rn = 1),
      -- stage 7 (q150): leakage-safe grouped split on normalized content
      splitk AS MATERIALIZED (
        SELECT doc_id, source, clean_text, n_chars,
          ${Sampling.hashSplitSql(
            TextOps.normalizeTextSql("clean_text"), 10, 8, 1)} AS split
        FROM keepers),
      -- stages 8-9 (q88 + q132): 32-token/stride-16 chunks, per-split
      -- counting-sort rank, serpentine deal into 8 shards
      t3 AS MATERIALIZED (
        SELECT doc_id, split,
               string_split_regex(trim(clean_text), '\\s+') AS ts
        FROM splitk),
      c3 AS MATERIALIZED (
        SELECT doc_id, split, ts,
               unnest(generate_series(0, (len(ts) - 1) // 16)) AS chunk_id
        FROM t3 WHERE len(ts) >= 1),
      ch3 AS MATERIALIZED (
        SELECT doc_id, split, CAST(chunk_id AS INT) AS chunk_id,
               CAST(len(list_slice(ts, chunk_id * 16 + 1, chunk_id * 16 + 32))
                 AS INT) AS chunk_len
        FROM c3),
      rnk3 AS MATERIALIZED (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY split
                    ORDER BY chunk_len DESC, doc_id, chunk_id) AS rnk
        FROM ch3),
      shards AS MATERIALIZED (
        SELECT split, CAST(${Shard.serpentineShardSql("rnk", 8)} AS INT)
                 AS shard, chunk_len
        FROM rnk3),
      -- audit 1 (q151): MinHash-LSH cross-split leakage over kept text
      lt AS MATERIALIZED (
        SELECT doc_id, string_split_regex(trim(clean_text), '\\s+') AS ts
        FROM splitk),
      lsh AS MATERIALIZED (
        SELECT DISTINCT doc_id, unnest(list_transform(
          generate_series(1, len(ts) - 2),
          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        FROM lt),
      lhashes AS MATERIALIZED (
        SELECT doc_id AS doc, ${TextOps.h64Sql("s")} AS h1,
               ${TextOps.h64bSql("s")} % 1000000007 AS h2
        FROM lsh),
      lmh AS MATERIALIZED (
        SELECT doc, j, MIN(h1 + j * h2) AS h
        FROM lhashes, (SELECT unnest(generate_series(0, 7)) AS j) seeds
        GROUP BY doc, j),
      lbands AS MATERIALIZED (
        SELECT doc, CAST(j // 4 AS INT) AS band, SUM(h) AS sig
        FROM lmh GROUP BY 1, 2),
      lcands AS MATERIALIZED (
        SELECT DISTINCT a.doc AS d1, b.doc AS d2
        FROM lbands a JOIN lbands b
          ON a.band = b.band AND a.sig = b.sig AND a.doc < b.doc),
      lest AS MATERIALIZED (
        SELECT d1, d2, COUNT(*) * 1.0e0 / 8 AS est_jaccard
        FROM lcands
        JOIN lmh ma ON d1 = ma.doc
        JOIN lmh mb ON d2 = mb.doc AND ma.j = mb.j AND ma.h = mb.h
        GROUP BY d1, d2),
      leak AS MATERIALIZED (
        SELECT LEAST(a1.split, a2.split) AS split_a,
               GREATEST(a1.split, a2.split) AS split_b,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lest
        JOIN splitk a1 ON lest.d1 = a1.doc_id
        JOIN splitk a2 ON lest.d2 = a2.doc_id
        WHERE lest.est_jaccard >= 0.5
        GROUP BY 1, 2),
      -- audit 2 (q159): per-source PSI of kept n_chars vs the raw corpus
      -- (reference deciles frozen from the raw side)
      pr AS MATERIALIZED (
        SELECT source, n_chars,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars, doc_id) AS rn,
          COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents),
      th AS MATERIALIZED (
        SELECT source,
          $thCols
        FROM pr GROUP BY source),
      hr AS MATERIALIZED (
        SELECT w.source, $binExpr AS bin, CAST(COUNT(*) AS BIGINT) AS cr
        FROM documents w JOIN th ON w.source = th.source
        GROUP BY 1, 2),
      hc AS MATERIALIZED (
        SELECT w.source, $binExpr AS bin, CAST(COUNT(*) AS BIGINT) AS cc
        FROM splitk w JOIN th ON w.source = th.source
        GROUP BY 1, 2),
      ${Drift.psiSql("source", 1.0e-4)},
      psifinal AS MATERIALIZED (
        SELECT source, ${Exact.sqlSum("term")} AS psi
        FROM terms GROUP BY source)
      SELECT * FROM (
        SELECT 'stage1_norm_dedup' AS "check", 'n_unique' AS "key",
               CAST((SELECT COUNT(*) FROM uniq) AS DOUBLE) AS "value",
               TRUE AS pass
        UNION ALL
        SELECT 'stage2_quality_sample', 'n_sampled',
               CAST((SELECT COUNT(*) FROM sampled) AS DOUBLE), TRUE
        UNION ALL
        SELECT 'stage3_containment', 'n_unquoted',
               CAST((SELECT COUNT(*) FROM unquoted) AS DOUBLE), TRUE
        UNION ALL
        SELECT 'stage4_line_dedup', 'n_docs',
               CAST((SELECT COUNT(*) FROM cleaned2) AS DOUBLE), TRUE
        UNION ALL
        SELECT 'stage5_cluster', 'n_dup_members',
               CAST((SELECT COUNT(*) FROM cleaned2)
                 - (SELECT COUNT(*) FROM keepers) AS DOUBLE), TRUE
        UNION ALL
        SELECT 'stage6_keep', 'n_keepers',
               CAST((SELECT COUNT(*) FROM keepers) AS DOUBLE), TRUE
        UNION ALL
        SELECT 'stage7_split', split, CAST(COUNT(*) AS DOUBLE), TRUE
        FROM splitk GROUP BY split
        UNION ALL
        SELECT 'stage8_chunk', split, CAST(SUM(chunk_len) AS DOUBLE), TRUE
        FROM shards GROUP BY split
        UNION ALL
        SELECT 'stage9_shard', k, v, TRUE FROM (
          SELECT split || '#' || CAST(shard AS VARCHAR) AS k,
                 CAST(COUNT(*) AS DOUBLE) AS v
          FROM shards GROUP BY split, shard)
        UNION ALL
        SELECT 'split_leakage', split_a || '->' || split_b,
               CAST(n AS DOUBLE), split_a = split_b
        FROM leak
        UNION ALL
        SELECT 'psi_drift', source, psi, psi < 0.2e0
        FROM psifinal)
      ORDER BY "check", "key""""
  }

  /** End-state summary of the nine-stage composed pipeline + its two
    * audit gates as ONE oracle-checked frame (check, key, value, pass):
    * per-stage survivor counts, per-split and per-(split, shard) chunk
    * totals, every leakage cell, every per-source PSI. The Spark side
    * runs the production DAG (CorpusPipelineV2.summary — stage
    * barriers, one materialization of the document-level pipeline
    * feeding build and audits); the oracle recomputes all of it from
    * the raw table in one unrolled CTE chain, so a wrong hand-off
    * BETWEEN stages (the one thing the per-stage oracles cannot see)
    * breaks the hash. */
  private val q221 = Q(
    "q221_pipeline_summary",
    (s, dir) => {
      import s.implicits._
      CorpusPipelineV2.summary(Tables(s, dir, "documents"))
        .orderBy($"check", $"key")
    },
    Some(q221Sql))

  /** The v4 graph gates' verdict frame as its own oracle row: per
    * source, the PageRank authority over the shared-line affinity
    * graph, the rank-gate verdict (≥ the exact median — the
    * Exact.dsum/count double division replayed verbatim), and the
    * propagated quality tier (label propagation from the extreme
    * mean-length seeds, 'none' where the diffusion never arrived or
    * the source is off-graph). v3's rank gate shipped with specs and
    * a bench section only; this row makes the ENTIRE gate layer —
    * line shingling, hot-line cap, pair join, 3 PageRank iterations,
    * median, seed ranking, 3 propagation rounds — hash-checked
    * against DuckDB end to end. */
  private val q239 = Q(
    "q239_gate_verdicts",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val edges = CorpusPipelineV2.sourceAffinityEdges(docs)
        .transform(graft.ops.Iterate.cut)
      val pr = graft.ops.Graph.pageRank(edges, iters = 3)
        .transform(graft.ops.Iterate.cut)
      val med = graft.ops.WindowOps.exactMedian(pr, Seq(lit(1)),
        $"pagerank", $"node").select($"median")
      val rankV = pr.crossJoin(broadcast(med))
        .select($"node".as("source"), $"pagerank",
          ($"pagerank" >= $"median").as("keep_all"))
      val tiers = CorpusPipelineV2.qualityTiers(edges, docs)
      docs.select($"source").distinct()
        .join(rankV, Seq("source"), "left")
        .join(tiers, Seq("source"), "left")
        .select($"source", $"pagerank",
          coalesce($"keep_all", lit(false)).as("keep_all"),
          coalesce($"tier", lit("none")).as("tier"))
        .orderBy($"source")
    },
    Some(s"""
      WITH dwords AS (
        SELECT source, string_split(text, ' ') AS ws FROM documents),
      dlines AS (
        SELECT DISTINCT source, ${TextOps.h64Sql("ln")} AS lh FROM (
          SELECT source, unnest(list_transform(
            generate_series(0, (len(ws) - 1) // 10),
            n -> array_to_string(ws[n*10+1 : n*10+10], ' '))) AS ln
          FROM dwords)),
      dcap AS (
        SELECT lh FROM dlines GROUP BY lh
        HAVING COUNT(*) BETWEEN 2 AND 100),
      dkept AS (
        SELECT l.source, l.lh FROM dlines l JOIN dcap c ON l.lh = c.lh),
      dpairs AS MATERIALIZED (
        SELECT DISTINCT a.source AS sa, b.source AS sb
        FROM dkept a JOIN dkept b
          ON a.lh = b.lh AND a.source < b.source),
      ed AS MATERIALIZED (
        SELECT sa AS src, sb AS dst FROM dpairs
        UNION ALL SELECT sb, sa FROM dpairs),
      ${graft.ops.Graph.pageRankSql(3)},
      gmed AS (
        SELECT CAST(SUM(CAST(pagerank AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*) AS median
        FROM (SELECT pagerank,
                ROW_NUMBER() OVER (ORDER BY pagerank, node) AS rn,
                COUNT(*) OVER () AS nn
              FROM prout)
        WHERE rn = (nn + 1) // 2 OR rn = (nn + 2) // 2),
      gstat AS (
        SELECT source,
          CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_len
        FROM documents GROUP BY source),
      grk AS (
        SELECT source,
          ROW_NUMBER() OVER (ORDER BY avg_len DESC, source) AS hi_rk,
          ROW_NUMBER() OVER (ORDER BY avg_len ASC, source) AS lo_rk
        FROM gstat),
      seeds AS (
        SELECT source AS node,
          CASE WHEN hi_rk <= 3 THEN 'hi' ELSE 'lo' END AS label
        FROM grk WHERE hi_rk <= 3 OR lo_rk <= 3),
      ${graft.ops.Graph.labelPropagateSql(3)}
      SELECT s.source, v.pagerank,
        COALESCE(v.pagerank >= m.median, FALSE) AS keep_all,
        COALESCE(t.label, 'none') AS tier
      FROM (SELECT DISTINCT source FROM documents) s
      LEFT JOIN prout v ON s.source = v.node
      LEFT JOIN lpout t ON s.source = t.node
      CROSS JOIN gmed m
      ORDER BY s.source"""))

  /** The v4 audit's per-tier conductance as its own oracle row (r11
    * verdict #5, upgraded from spec-only to hash-checked): φ of each
    * propagated quality tier over the SAME affinity graph both gates
    * run on — q239 checks the LABELS, this row checks the BOUNDARY
    * QUALITY the audit frame reports about them (φ = 1: the tier has
    * zero internal edges, i.e. the gate halves documents on diffusion
    * noise). Walks line shingling → hot-line cap → pair join → seed
    * ranking → 3 clamped propagation rounds → the conductance join
    * pair in DuckDB end to end. Off-graph/unreached sources fold into
    * 'none' exactly as the audit does. */
  private val q245 = Q(
    "q245_tier_conductance",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val edges = CorpusPipelineV2.sourceAffinityEdges(docs)
        .transform(graft.ops.Iterate.cut)
      val tiers = CorpusPipelineV2.qualityTiers(edges, docs)
      graft.ops.Graph.conductance(edges,
          tiers.select($"source".as("node"),
            coalesce($"tier", lit("none")).as("label")))
        .orderBy($"label")
    },
    Some(s"""
      WITH dwords AS (
        SELECT source, string_split(text, ' ') AS ws FROM documents),
      dlines AS (
        SELECT DISTINCT source, ${TextOps.h64Sql("ln")} AS lh FROM (
          SELECT source, unnest(list_transform(
            generate_series(0, (len(ws) - 1) // 10),
            n -> array_to_string(ws[n*10+1 : n*10+10], ' '))) AS ln
          FROM dwords)),
      dcap AS (
        SELECT lh FROM dlines GROUP BY lh
        HAVING COUNT(*) BETWEEN 2 AND 100),
      dkept AS (
        SELECT l.source, l.lh FROM dlines l JOIN dcap c ON l.lh = c.lh),
      dpairs AS MATERIALIZED (
        SELECT DISTINCT a.source AS sa, b.source AS sb
        FROM dkept a JOIN dkept b
          ON a.lh = b.lh AND a.source < b.source),
      ed AS MATERIALIZED (
        SELECT sa AS src, sb AS dst FROM dpairs
        UNION ALL SELECT sb, sa FROM dpairs),
      gstat AS (
        SELECT source,
          CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_len
        FROM documents GROUP BY source),
      grk AS (
        SELECT source,
          ROW_NUMBER() OVER (ORDER BY avg_len DESC, source) AS hi_rk,
          ROW_NUMBER() OVER (ORDER BY avg_len ASC, source) AS lo_rk
        FROM gstat),
      seeds AS (
        SELECT source AS node,
          CASE WHEN hi_rk <= 3 THEN 'hi' ELSE 'lo' END AS label
        FROM grk WHERE hi_rk <= 3 OR lo_rk <= 3),
      ${graft.ops.Graph.labelPropagateSql(3)},
      comm AS (
        SELECT node, COALESCE(label, 'none') AS label FROM lpout),
      ${graft.ops.Graph.conductanceSql}
      SELECT label, vol, cut, phi FROM condout ORDER BY label"""))

  def queries: Seq[Q] = Seq(q221, q239, q245)
}
