package graft.queries

import graft.Tables
import graft.ops.{Relational, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Pipeline-depth batch: IVF approximate-nearest-neighbor search and
  * near-duplicate clustering (connected components) — the two stages
  * that turn pairwise similarity into an actual dedup/retrieval
  * pipeline.
  */
object ClusterQueries extends QueryGroup {

  private val compSql = """
    comp AS (
      SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS e
      FROM embeddings)"""

  private val cosSql =
    "CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) / " +
      "(sqrt(CAST(SUM(CAST(a2 AS DECIMAL(18,6))) AS DOUBLE)) * " +
      "sqrt(CAST(SUM(CAST(b2 AS DECIMAL(18,6))) AS DOUBLE)))"

  /** IVF ANN: coarse-quantize every vector to its nearest of 16 fixed
    * centroids (the codebook = vectors 0..15), then answer each query by
    * scanning only its cell — the inverted-file scale path beside the
    * LSH one (q52). */
  private val q61 = Q(
    "q61_ann_ivf",
    (s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val all = Similarity.withNorms(Tables.spread(s, dir, "embeddings"),
        $"vec_id", $"embedding")
      val cents = all.filter($"id" < 16)
        .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
      val assign = Similarity.ivfAssign(all, cents).select($"id", $"cid")
      val qcells = assign.filter($"id" < 10).select($"id".as("qid"), $"cid")
      val cands = qcells
        .join(assign.select($"id".as("nid"), $"cid"), Seq("cid"))
        .filter($"nid" =!= $"qid")
      val withVecs = cands
        .join(all.select($"id".as("qid"), $"emb".as("qemb"), $"norm2".as("qn")), Seq("qid"))
        .join(all.select($"id".as("nid"), $"emb".as("nemb"), $"norm2".as("nn")), Seq("nid"))
        .select($"qid", $"cid", $"nid",
          (Similarity.dotExact("qemb", "nemb") / (sqrt($"qn") * sqrt($"nn")))
            .as("cosine"))
      Relational.topKPerGroup(withVecs, Seq($"qid"),
          Seq($"cosine".desc, $"nid".asc), 3)
        .select($"qid", $"cid", $"nid", $"cosine", $"rank")
        .orderBy($"qid", $"rank")
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
          FROM ccos) WHERE rn = 1),
      cands AS (
        SELECT q.id AS qid, q.cid, n.id AS nid
        FROM assign q JOIN assign n ON q.cid = n.cid AND n.id <> q.id
        WHERE q.id < 10),
      nparts AS (
        SELECT cd.qid, cd.cid, cd.nid, a.e * b.e AS p,
               a.e * a.e AS a2, b.e * b.e AS b2
        FROM cands cd
        JOIN comp a ON a.id = cd.qid
        JOIN comp b ON b.id = cd.nid AND a.i = b.i),
      cos AS (SELECT qid, cid, nid, $cosSql AS cosine
              FROM nparts GROUP BY qid, cid, nid),
      ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY cosine DESC, nid) AS INT) AS rank
        FROM cos)
      SELECT qid, cid, nid, cosine, rank FROM ranked
      WHERE rank <= 3 ORDER BY qid, rank"""))

  /** Near-duplicate clustering: token-Jaccard ≥ 0.9 edges within blocks,
    * connected components by min-label propagation (Spark driver loop)
    * vs a recursive-CTE oracle — each document labeled with its
    * component's minimum id (the canonical representative). */
  private val q62 = Q(
    "q62_dedup_clusters",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val tr = docs.select($"doc_id".as("doc"),
        concat($"source", lit("#"), ($"n_chars" / 100).cast("int").cast("string"))
          .as("block"),
        explode(array_distinct(TextOps.tokens($"text"))).as("token"))
      val edges = TextOps.blockedJaccard(tr)
        .filter($"jaccard" >= 0.9)
        .select($"d1", $"d2")
      val nodes = docs.select($"doc_id".as("node"))
      // edges are block-local by construction -> one-shuffle union-find
      // (the iterative connectedComponents stays for cross-block graphs)
      val docBlocks = docs.select($"doc_id".as("doc"),
        concat($"source", lit("#"), ($"n_chars" / 100).cast("int").cast("string"))
          .as("block"))
      TextOps.blockLocalComponents(edges, docBlocks, nodes)
        .select($"node".as("doc_id"), $"cluster")
        .orderBy($"doc_id")
    },
    Some("""
      WITH RECURSIVE tr AS (
        SELECT doc_id AS doc,
          source || '#' || CAST(CAST(n_chars // 100 AS INT) AS VARCHAR) AS block,
          unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS token
        FROM documents),
      sz AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM tr GROUP BY doc),
      inter AS (
        SELECT a.doc AS d1, b.doc AS d2, CAST(COUNT(*) AS BIGINT) AS i
        FROM tr a JOIN tr b ON a.block = b.block AND a.token = b.token
          AND a.doc < b.doc
        GROUP BY 1, 2),
      e AS (
        SELECT d1, d2
        FROM inter JOIN sz sa ON d1 = sa.doc JOIN sz sb ON d2 = sb.doc
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.9),
      sym AS (SELECT d1 AS s, d2 AS t FROM e
              UNION SELECT d2, d1 FROM e),
      reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT s.s, r.label FROM reach r JOIN sym s ON r.node = s.t)
      SELECT node AS doc_id, MIN(label) AS cluster
      FROM reach GROUP BY node ORDER BY doc_id"""))

  /** Global near-duplicate components over MULTI-PASS blocking — the
    * cross-block graph q62's one-shuffle union-find cannot close.
    * Two independent blocking passes (entity-resolution "meta-blocking":
    * pass A bands by source × 200-char length bucket, pass B by lang ×
    * offset 100-char bucket — for a pair sharing a SOURCE or a LANG,
    * the shifted bands guarantee co-blocking in at least one pass when
    * the lengths are within 50 chars; a near-dup pair differing in
    * BOTH source and lang is out of scope by design, the standard
    * blocking recall/cost trade — cross-attribute recall needs an
    * attribute-independent pass, which is q47's LSH family's job) each
    * emit
    * token-Jaccard ≥ 0.85 edges; their UNION spans blocks, so components
    * are closed by alternating large-star/small-star contraction
    * ([[graft.ops.TextOps.connectedComponentsStars]] — O(log²) rounds;
    * the shifted-band graph is chain-shaped, exactly where min-label's
    * O(diameter) rounds lose: 7.6 s → the stars cut measured at sf0.1,
    * equivalence with min-label pinned in TextOpsSpec). Output
    * adds the component size, the dedup-policy fan-out knob.
    * Mirrors the reference's duplicate-grouping intent
    * (mopdb_utils.py:495-538 catalog dedup) at corpus scale. */
  private val q174 = Q(
    "q174_global_components",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      // Candidate generation uses the q182 prefix filter INSIDE each
      // blocking pass (lossless: a pair at J >= 0.85 must share a
      // rarest-first prefix token), so a near-dup clique of m docs
      // costs m^2 x |prefix| join rows instead of m^2 x |tokens| —
      // and verification intersects broadcast token ARRAYS once per
      // candidate instead of shuffling pair x token rows. J >= 0.85
      // is the integer rule 20i >= 17(za+zb-i) on both engines.
      val tsets = docs.select($"doc_id".as("doc"),
        array_sort(array_distinct(TextOps.tokens($"text"))).as("tset"))
        .withColumn("sz", size($"tset").cast("long"))
        .transform(graft.ops.Iterate.cut)
      val tok = tsets.select($"doc", $"sz", explode($"tset").as("token"))
      val dfreq = tok.groupBy($"token").agg(count(lit(1)).as("df"))
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc").orderBy($"df".asc, $"token".asc)
      val pref = tok.join(dfreq, Seq("token"))
        .withColumn("rn", row_number().over(wOrd))
        .filter($"rn" <= $"sz" - expr("(17 * sz + 19) div 20") + 1)
        .select($"doc", $"sz", $"token")
        .transform(graft.ops.Iterate.cut)
      val blocks = docs.select($"doc_id".as("doc"),
          concat($"source", lit("#"),
            ($"n_chars" / 200).cast("int").cast("string")).as("block"))
        .unionByName(docs.select($"doc_id".as("doc"),
          concat($"lang", lit("#"),
            (($"n_chars" + 50) / 100).cast("int").cast("string")).as("block")))
      val bpref = pref.join(blocks, Seq("doc"))
      val cands = bpref.as("a").join(bpref.as("b"),
          $"a.block" === $"b.block" && $"a.token" === $"b.token" &&
            $"a.doc" < $"b.doc" &&
            lit(17) * greatest($"a.sz", $"b.sz") <=
              lit(20) * least($"a.sz", $"b.sz"))
        .select($"a.doc".as("d1"), $"b.doc".as("d2"),
          $"a.sz".as("za"), $"b.sz".as("zb"))
        .distinct()
      val edges = cands
        .join(broadcast(tsets.select($"doc".as("d1"), $"tset".as("ta"))),
          Seq("d1"))
        .join(broadcast(tsets.select($"doc".as("d2"), $"tset".as("tb"))),
          Seq("d2"))
        .select($"d1", $"d2", $"za", $"zb",
          size(array_intersect($"ta", $"tb")).cast("long").as("i"))
        .filter(lit(20) * $"i" >= lit(17) * ($"za" + $"zb" - $"i"))
        .select($"d1", $"d2")
      val labeled = TextOps.connectedComponentsStars(
        edges, docs.select($"doc_id".as("node")))
      labeled.join(
          labeled.groupBy($"cluster").agg(count(lit(1)).as("cluster_size")),
          Seq("cluster"))
        .select($"node".as("doc_id"), $"cluster", $"cluster_size")
        .orderBy($"doc_id")
    },
    Some("""
      WITH RECURSIVE toks AS (
        SELECT doc_id AS doc,
          unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS token
        FROM documents),
      blk AS (
        SELECT doc_id AS doc,
          source || '#' || CAST(CAST(n_chars // 200 AS INT) AS VARCHAR) AS block
        FROM documents
        UNION ALL
        SELECT doc_id,
          lang || '#' || CAST(CAST((n_chars + 50) // 100 AS INT) AS VARCHAR)
        FROM documents),
      tr AS (SELECT b.doc, b.block, t.token
             FROM blk b JOIN toks t ON b.doc = t.doc),
      sz AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY doc),
      inter AS (
        SELECT a.doc AS d1, b.doc AS d2, a.block,
               CAST(COUNT(*) AS BIGINT) AS i
        FROM tr a JOIN tr b ON a.block = b.block AND a.token = b.token
          AND a.doc < b.doc
        GROUP BY 1, 2, 3),
      e AS (
        SELECT DISTINCT d1, d2
        FROM inter JOIN sz sa ON d1 = sa.doc JOIN sz sb ON d2 = sb.doc
        WHERE 20 * i >= 17 * (sa.n + sb.n - i)),
      sym AS (SELECT d1 AS s, d2 AS t FROM e
              UNION SELECT d2, d1 FROM e),
      reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT s.s, r.label FROM reach r JOIN sym s ON r.node = s.t),
      comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
      csz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM comp GROUP BY cluster)
      SELECT node AS doc_id, comp.cluster, cluster_size
      FROM comp JOIN csz ON comp.cluster = csz.cluster
      ORDER BY doc_id"""))

  /** Corpus-curation capstone: compose quality scoring, token counts and
    * keep-first near-dup suppression into a keep/drop decision per
    * document — the actual filtering pass of a training-data pipeline.
    * Drop reasons are ranked (short > low_quality > duplicate > kept) so
    * the decision is deterministic. */
  private val q63 = Q(
    "q63_corpus_filter",
    (s, dir) => {
      import s.implicits._
      TextOps.corpusDecisions(Tables(s, dir, "documents"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH ${TextOps.corpusDecisionsSql}
      SELECT doc_id, decision FROM decisions ORDER BY doc_id"""))

  /** IVF with nprobe=2: each query consults its two nearest cells —
    * the recall knob of the inverted-file index (q61 is nprobe=1). The
    * query-side cell ranking is an exact broadcast sweep; the corpus
    * side is still touched only through the probed inverted lists. */
  private val q77 = Q(
    "q77_ann_ivf_nprobe",
    (s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val all = Similarity.withNorms(Tables.spread(s, dir, "embeddings"),
        $"vec_id", $"embedding")
      val cents = all.filter($"id" < 16)
        .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
      Similarity.ivfTopK(all, cents, all.filter($"id" < 10), nprobe = 2, k = 3)
        .orderBy($"qid", $"rank")
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
          FROM ccos) WHERE rn = 1),
      qcells AS (
        SELECT id AS qid, cid FROM (
          SELECT id, cid, ROW_NUMBER() OVER (PARTITION BY id
                      ORDER BY ccos DESC, cid) AS rn
          FROM ccos WHERE id < 10) WHERE rn <= 2),
      cands AS (
        SELECT qc.qid, a.id AS nid
        FROM qcells qc JOIN assign a ON a.cid = qc.cid AND a.id <> qc.qid),
      nparts AS (
        SELECT cd.qid, cd.nid, a.e * b.e AS p,
               a.e * a.e AS a2, b.e * b.e AS b2
        FROM cands cd
        JOIN comp a ON a.id = cd.qid
        JOIN comp b ON b.id = cd.nid AND a.i = b.i),
      cos AS (SELECT qid, nid, $cosSql AS cosine
              FROM nparts GROUP BY qid, nid),
      ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY cosine DESC, nid) AS INT) AS rank
        FROM cos)
      SELECT qid, nid, cosine, rank FROM ranked
      WHERE rank <= 3 ORDER BY qid, rank"""))

  /** Quality-priority dedup (the policy refinement over q62's
    * keep-lowest-id): within each near-dup cluster keep the LONGEST
    * document (n_chars desc, doc_id tiebreak) — the "keep the best
    * version" rule real corpus builds use instead of keep-first.
    * Cluster labels come from the same one-shuffle block-local
    * union-find as q62; the keeper is one keyed top-1 window, and the
    * verdict joins back on the cluster id. */
  private val q126 = Q(
    "q126_quality_dedup",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val tr = docs.select($"doc_id".as("doc"),
        concat($"source", lit("#"), ($"n_chars" / 100).cast("int").cast("string"))
          .as("block"),
        explode(array_distinct(TextOps.tokens($"text"))).as("token"))
      val edges = TextOps.blockedJaccard(tr)
        .filter($"jaccard" >= 0.9)
        .select($"d1", $"d2")
      val nodes = docs.select($"doc_id".as("node"))
      val docBlocks = docs.select($"doc_id".as("doc"),
        concat($"source", lit("#"), ($"n_chars" / 100).cast("int").cast("string"))
          .as("block"))
      val clustered = TextOps.blockLocalComponents(edges, docBlocks, nodes)
        .select($"node".as("doc_id"), $"cluster")
      val sized = clustered
        .join(docs.select($"doc_id", $"n_chars"), Seq("doc_id"))
      val keeper = graft.ops.Relational.topOnePerGroup(sized,
          Seq($"cluster"), Seq($"n_chars".desc, $"doc_id".asc))
        .select($"cluster", $"doc_id".as("keep_id"))
      sized.join(keeper, Seq("cluster"))
        .select($"doc_id", $"cluster", ($"doc_id" === $"keep_id").as("kept"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH RECURSIVE tr AS (
        SELECT doc_id AS doc,
          source || '#' || CAST(CAST(n_chars // 100 AS INT) AS VARCHAR) AS block,
          unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS token
        FROM documents),
      sz AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM tr GROUP BY doc),
      inter AS (
        SELECT a.doc AS d1, b.doc AS d2, CAST(COUNT(*) AS BIGINT) AS i
        FROM tr a JOIN tr b ON a.block = b.block AND a.token = b.token
          AND a.doc < b.doc
        GROUP BY 1, 2),
      e AS (
        SELECT d1, d2
        FROM inter JOIN sz sa ON d1 = sa.doc JOIN sz sb ON d2 = sb.doc
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.9),
      sym AS (SELECT d1 AS s, d2 AS t FROM e
              UNION SELECT d2, d1 FROM e),
      reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT s.s, r.label FROM reach r JOIN sym s ON r.node = s.t),
      cl AS (SELECT node AS doc_id, MIN(label) AS cluster
             FROM reach GROUP BY node),
      sized AS (
        SELECT cl.doc_id, cl.cluster, d.n_chars
        FROM cl JOIN documents d USING (doc_id)),
      keep AS (
        SELECT cluster, doc_id AS keep_id FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
            ORDER BY n_chars DESC, doc_id) AS rn
          FROM sized) WHERE rn = 1)
      SELECT s.doc_id, s.cluster, (s.doc_id = k.keep_id) AS kept
      FROM sized s JOIN keep k ON s.cluster = k.cluster
      ORDER BY s.doc_id"""))

  /** Trained coarse quantizer (Similarity.lloydCentroids): one full
    * Lloyd round refines the seed centroids (exact assignment +
    * decimal-exact component means, empty clusters carry forward), and
    * the output is the SECOND round's assignment statistics — i.e. two
    * distributed k-means rounds end to end, the training the untrained
    * seed-centroid IVF of q61/q77/q104/q109 would get before serving.
    * The oracle unrolls both rounds as CTEs; every arithmetic step is
    * decimal-exact or totally ordered, so the trained centroids match
    * across engines bit-for-bit. */
  private val q146 = Q(
    "q146_kmeans_ivf",
    (s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val all = Similarity.withNorms(Tables.spread(s, dir, "embeddings"),
        $"vec_id", $"embedding")
      val seeds = all.filter($"id" < 16)
        .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
      val cents1 = Similarity.lloydCentroids(all, seeds, iters = 1)
      val assign2 = Similarity.ivfAssign(all, cents1).select($"id", $"cid")
      val comp = all
        .select($"id", posexplode($"emb").as(Seq("i", "e")))
        .withColumn("e", $"e".cast("double"))
      assign2.join(comp, Seq("id"))
        .groupBy($"cid", $"i")
        .agg(count(lit(1)).as("n_members"), graft.ops.Exact.davg($"e").as("mean_e"))
        .orderBy($"cid", $"i")
    },
    Some(s"""
      WITH $compSql,
      c1parts AS (
        SELECT v.id AS id, c.id AS cid, v.e * c.e AS p,
               v.e * v.e AS a2, c.e * c.e AS b2
        FROM comp v JOIN comp c ON v.i = c.i
        WHERE c.id < 16),
      ccos1 AS (SELECT id, cid, $cosSql AS ccos
                FROM c1parts GROUP BY id, cid),
      assign1 AS (
        SELECT id, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                      ORDER BY ccos DESC, cid) AS rn
          FROM ccos1) WHERE rn = 1),
      m1 AS (
        SELECT a.cid, m.i, ${graft.ops.Exact.sqlAvg("m.e")} AS m
        FROM assign1 a JOIN comp m ON a.id = m.id
        GROUP BY a.cid, m.i),
      seeds0 AS (SELECT id AS cid, i, e FROM comp WHERE id < 16),
      cents1 AS (
        SELECT s.cid, s.i, COALESCE(m1.m, s.e) AS m
        FROM seeds0 s LEFT JOIN m1 ON s.cid = m1.cid AND s.i = m1.i),
      c2parts AS (
        SELECT v.id AS id, c.cid AS cid, v.e * c.m AS p,
               v.e * v.e AS a2, c.m * c.m AS b2
        FROM comp v JOIN cents1 c ON v.i = c.i),
      ccos2 AS (SELECT id, cid, $cosSql AS ccos
                FROM c2parts GROUP BY id, cid),
      assign2 AS (
        SELECT id, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                      ORDER BY ccos DESC, cid) AS rn
          FROM ccos2) WHERE rn = 1)
      SELECT a.cid, m.i, CAST(COUNT(*) AS BIGINT) AS n_members,
        ${graft.ops.Exact.sqlAvg("m.e")} AS mean_e
      FROM assign2 a JOIN comp m ON a.id = m.id
      GROUP BY a.cid, m.i ORDER BY a.cid, m.i"""))

  /** ANN search served from the TRAINED quantizer: one Lloyd round
    * refines the seed centroids (q146's training), then the standard
    * nprobe=2 inverted-file search (q77's serving path) runs against
    * the refined cells — train-then-serve end to end. Better-centered
    * cells change which inverted lists exist, not the search plan:
    * the corpus is still touched only through the probed lists. */
  private val q147 = Q(
    "q147_trained_ivf_search",
    (s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val all = Similarity.withNorms(Tables.spread(s, dir, "embeddings"),
        $"vec_id", $"embedding")
      val seeds = all.filter($"id" < 16)
        .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
      val trained = Similarity.lloydCentroids(all, seeds, iters = 1)
      Similarity.ivfTopK(all, trained, all.filter($"id" < 10),
          nprobe = 2, k = 3)
        .orderBy($"qid", $"rank")
    },
    Some(s"""
      WITH $compSql,
      c1parts AS (
        SELECT v.id AS id, c.id AS cid, v.e * c.e AS p,
               v.e * v.e AS a2, c.e * c.e AS b2
        FROM comp v JOIN comp c ON v.i = c.i
        WHERE c.id < 16),
      ccos1 AS (SELECT id, cid, $cosSql AS ccos
                FROM c1parts GROUP BY id, cid),
      assign1 AS (
        SELECT id, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                      ORDER BY ccos DESC, cid) AS rn
          FROM ccos1) WHERE rn = 1),
      m1 AS (
        SELECT a.cid, m.i, ${graft.ops.Exact.sqlAvg("m.e")} AS m
        FROM assign1 a JOIN comp m ON a.id = m.id
        GROUP BY a.cid, m.i),
      seeds0 AS (SELECT id AS cid, i, e FROM comp WHERE id < 16),
      cents1 AS (
        SELECT s.cid, s.i, COALESCE(m1.m, s.e) AS m
        FROM seeds0 s LEFT JOIN m1 ON s.cid = m1.cid AND s.i = m1.i),
      c2parts AS (
        SELECT v.id AS id, c.cid AS cid, v.e * c.m AS p,
               v.e * v.e AS a2, c.m * c.m AS b2
        FROM comp v JOIN cents1 c ON v.i = c.i),
      ccos2 AS (SELECT id, cid, $cosSql AS ccos
                FROM c2parts GROUP BY id, cid),
      assign2 AS (
        SELECT id, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                      ORDER BY ccos DESC, cid) AS rn
          FROM ccos2) WHERE rn = 1),
      qcells AS (
        SELECT id AS qid, cid FROM (
          SELECT id, cid, ROW_NUMBER() OVER (PARTITION BY id
                      ORDER BY ccos DESC, cid) AS rn
          FROM ccos2 WHERE id < 10) WHERE rn <= 2),
      cands AS (
        SELECT qc.qid, a.id AS nid
        FROM qcells qc JOIN assign2 a ON a.cid = qc.cid AND a.id <> qc.qid),
      nparts AS (
        SELECT cd.qid, cd.nid, a.e * b.e AS p,
               a.e * a.e AS a2, b.e * b.e AS b2
        FROM cands cd
        JOIN comp a ON a.id = cd.qid
        JOIN comp b ON b.id = cd.nid AND a.i = b.i),
      cos AS (SELECT qid, nid, $cosSql AS cosine
              FROM nparts GROUP BY qid, nid),
      ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY cosine DESC, nid) AS INT) AS rank
        FROM cos)
      SELECT qid, nid, cosine, rank FROM ranked
      WHERE rank <= 3 ORDER BY qid, rank"""))

  /** Nearest-centroid classifier evaluation (the Rocchio / prototype
    * probe): per-label centroids are decimal-exact component means (the
    * q146 Lloyd machinery keyed on the LABEL instead of the learned
    * cell), every vector is assigned to its nearest centroid by exact
    * cosine, and the output is the confusion matrix — the standard
    * embedding-quality probe run over a labeled eval slice. One corpus
    * pass for the means (label-count × dim rows broadcast back), one
    * for the assignment; the confusion groupBy is label² rows. */
  private val q153 = Q(
    "q153_centroid_classifier",
    (s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val emb = Tables.spread(s, dir, "embeddings")
      val all = Similarity.withNorms(emb, $"vec_id", $"embedding")
      val lab = emb.select($"vec_id".as("id"), $"label")
      val comp = all
        .select($"id", posexplode($"emb").as(Seq("i", "e")))
        .withColumn("e", $"e".cast("double"))
      val cents = comp.join(lab, Seq("id"))
        .groupBy($"label", $"i")
        .agg(graft.ops.Exact.davg($"e").as("m"))
        .groupBy($"label")
        .agg(expr("transform(array_sort(collect_list(struct(i, m))), x -> x.m)")
          .as("cemb"))
        .select($"label".as("cid"), $"cemb")
        .withColumn("cnorm2", Similarity.sqNormExact("cemb"))
      val pred = Similarity.ivfAssign(all, cents)
        .select($"id", $"cid".as("pred"))
      pred.join(lab, Seq("id"))
        .groupBy($"label", $"pred")
        .agg(count(lit(1)).as("n"))
        .orderBy($"label", $"pred")
    },
    Some(s"""
      WITH $compSql,
      lab AS (SELECT vec_id AS id, label FROM embeddings),
      cents AS (
        SELECT l.label AS cid, c.i, ${graft.ops.Exact.sqlAvg("c.e")} AS m
        FROM comp c JOIN lab l USING (id)
        GROUP BY l.label, c.i),
      parts AS (
        SELECT v.id AS id, cn.cid AS cid, v.e * cn.m AS p,
               v.e * v.e AS a2, cn.m * cn.m AS b2
        FROM comp v JOIN cents cn ON v.i = cn.i),
      ccos AS (SELECT id, cid, $cosSql AS ccos
               FROM parts GROUP BY id, cid),
      pred AS (
        SELECT id, cid AS pred FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                      ORDER BY ccos DESC, cid) AS rn
          FROM ccos) WHERE rn = 1)
      SELECT l.label, p.pred, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred p JOIN lab l USING (id)
      GROUP BY l.label, p.pred ORDER BY l.label, p.pred"""))

  /** Consensus multi-signal dedup: the exact-hash, MinHash-LSH, and
    * embedding-cosine detectors vote on every candidate pair (full
    * outer fusion keyed on the pair), with per-method attribution
    * flags and a ≥2-votes "dup" verdict — the production pattern where
    * no single dedup signal is trusted alone (lexical twins with
    * different embeddings, paraphrases with different hashes). Each
    * detector keeps its own scale shape (hash equi-join, banded LSH,
    * label-blocked pairs); the fusion operates on pair-sized frames. */
  private val q165 = Q(
    "q165_consensus_dedup",
    (s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val d = Tables(s, dir, "documents")
      val withH = d.select($"doc_id",
        md5(lower(trim($"text")).cast("binary")).as("h"))
      val exactP = withH.as("a").join(withH.as("b"),
          $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
          lit(1).as("m_exact"))
      val sh = d.withColumn("ts", TextOps.tokens($"text"))
        .select($"doc_id", explode(TextOps.shingles("ts", 3)).as("s"))
        .distinct()
      val mh = TextOps.minhash(sh, $"doc_id", $"s", k = 8)
      val lshP = TextOps.estJaccard(TextOps.lshCandidates(mh, r = 4), mh, k = 8)
        .filter($"est_jaccard" >= 0.5)
        .select($"d1", $"d2", lit(1).as("m_lsh"))
      val emb = Similarity.withNorms(Tables(s, dir, "embeddings"),
        $"vec_id", $"embedding")
      val blocks = Tables(s, dir, "embeddings")
        .select($"vec_id".as("id"), $"label".as("block"))
      val cosP = Similarity.blockedCosinePairs(emb, blocks,
          prefilterAbove = Some(0.4))
        .filter($"cosine" >= 0.4)
        .select($"id1".as("d1"), $"id2".as("d2"), lit(1).as("m_cos"))
      exactP.join(lshP, Seq("d1", "d2"), "full_outer")
        .join(cosP, Seq("d1", "d2"), "full_outer")
        .select($"d1", $"d2",
          coalesce($"m_exact", lit(0)).as("m_exact"),
          coalesce($"m_lsh", lit(0)).as("m_lsh"),
          coalesce($"m_cos", lit(0)).as("m_cos"))
        .withColumn("n_methods", $"m_exact" + $"m_lsh" + $"m_cos")
        .withColumn("verdict",
          when($"n_methods" >= 2, "dup").otherwise("candidate"))
        .orderBy($"d1", $"d2")
    },
    Some(s"""
      WITH $compSql,
      eh AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM documents),
      exactp AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, 1 AS m_exact
        FROM eh a JOIN eh b ON a.h = b.h AND a.doc_id < b.doc_id),
      t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
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
      lshp AS (
        SELECT d1, d2, 1 AS m_lsh FROM (
          SELECT d1, d2, COUNT(*) * 1.0e0 / 8 AS est_jaccard
          FROM cands
          JOIN mh ma ON d1 = ma.doc
          JOIN mh mb ON d2 = mb.doc AND ma.j = mb.j AND ma.h = mb.h
          GROUP BY d1, d2)
        WHERE est_jaccard >= 0.5),
      cblk AS (SELECT comp.*, e2.label AS block
               FROM comp JOIN embeddings e2 ON comp.id = e2.vec_id),
      cparts AS (
        SELECT a.id AS id1, b.id AS id2, a.e * b.e AS p,
               a.e * a.e AS a2, b.e * b.e AS b2
        FROM cblk a JOIN cblk b
          ON a.block = b.block AND a.i = b.i AND a.id < b.id),
      cosp AS (
        SELECT id1 AS d1, id2 AS d2, 1 AS m_cos FROM (
          SELECT id1, id2, $cosSql AS cosine
          FROM cparts GROUP BY id1, id2)
        WHERE cosine >= 0.4e0),
      fused AS (
        SELECT COALESCE(e.d1, l.d1, c.d1) AS d1,
               COALESCE(e.d2, l.d2, c.d2) AS d2,
               COALESCE(e.m_exact, 0) AS m_exact,
               COALESCE(l.m_lsh, 0) AS m_lsh,
               COALESCE(c.m_cos, 0) AS m_cos
        FROM exactp e
        FULL OUTER JOIN lshp l ON e.d1 = l.d1 AND e.d2 = l.d2
        FULL OUTER JOIN cosp c
          ON COALESCE(e.d1, l.d1) = c.d1 AND COALESCE(e.d2, l.d2) = c.d2)
      SELECT d1, d2, m_exact, m_lsh, m_cos,
        m_exact + m_lsh + m_cos AS n_methods,
        CASE WHEN m_exact + m_lsh + m_cos >= 2 THEN 'dup'
             ELSE 'candidate' END AS verdict
      FROM fused ORDER BY d1, d2"""))

  /** Prototype-distance data pruning (Sorscher et al. '22 "Beyond
    * neural scaling laws" SSL-prototypes; the pruning half of D4 next
    * to q107's SemDeDup): train prototypes (one Lloyd round over the
    * q146 machinery), assign every vector to its nearest prototype,
    * and within each cell KEEP THE HARDEST examples — lowest prototype
    * cosine, the ones dense regions over-represent — dropping the
    * easy near-prototype redundancy. Keep rule: hardness rank ≤
    * ⌈cell/2⌉ (rank by exact cosine asc, id asc — totally ordered, so
    * the kept set is deterministic). One extra window over the q147
    * assignment — the pruning signal costs nothing beyond the trained
    * index itself. */
  private val q178 = Q(
    "q178_prototype_prune",
    (s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val all = Similarity.withNorms(Tables.spread(s, dir, "embeddings"),
        $"vec_id", $"embedding")
      val seeds = all.filter($"id" < 16)
        .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
      val trained = Similarity.lloydCentroids(all, seeds, iters = 1)
      val assign = Similarity.ivfAssign(all, trained)
      val wh = org.apache.spark.sql.expressions.Window
        .partitionBy($"cid").orderBy($"ccos".asc, $"id".asc)
      val wc = org.apache.spark.sql.expressions.Window.partitionBy($"cid")
      assign
        .withColumn("rank_hard", row_number().over(wh).cast("long"))
        .withColumn("cell_n", count(lit(1)).over(wc))
        .select($"id".as("vec_id"), $"cid", round($"ccos", 6).as("proto_cos"),
          $"rank_hard", $"cell_n",
          ($"rank_hard" <= expr("(cell_n + 1) div 2")).as("kept"))
        .orderBy($"vec_id")
    },
    Some(s"""
      WITH $compSql,
      c1parts AS (
        SELECT v.id AS id, c.id AS cid, v.e * c.e AS p,
               v.e * v.e AS a2, c.e * c.e AS b2
        FROM comp v JOIN comp c ON v.i = c.i
        WHERE c.id < 16),
      ccos1 AS (SELECT id, cid, $cosSql AS ccos
                FROM c1parts GROUP BY id, cid),
      assign1 AS (
        SELECT id, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                      ORDER BY ccos DESC, cid) AS rn
          FROM ccos1) WHERE rn = 1),
      m1 AS (
        SELECT a.cid, m.i, ${graft.ops.Exact.sqlAvg("m.e")} AS m
        FROM assign1 a JOIN comp m ON a.id = m.id
        GROUP BY a.cid, m.i),
      seeds0 AS (SELECT id AS cid, i, e FROM comp WHERE id < 16),
      cents1 AS (
        SELECT s.cid, s.i, COALESCE(m1.m, s.e) AS m
        FROM seeds0 s LEFT JOIN m1 ON s.cid = m1.cid AND s.i = m1.i),
      c2parts AS (
        SELECT v.id AS id, c.cid AS cid, v.e * c.m AS p,
               v.e * v.e AS a2, c.m * c.m AS b2
        FROM comp v JOIN cents1 c ON v.i = c.i),
      ccos2 AS (SELECT id, cid, $cosSql AS ccos
                FROM c2parts GROUP BY id, cid),
      assign2 AS (
        SELECT id, cid, ccos FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                      ORDER BY ccos DESC, cid) AS rn
          FROM ccos2) WHERE rn = 1),
      ranked AS (
        SELECT id, cid, ccos,
          ROW_NUMBER() OVER (PARTITION BY cid
            ORDER BY ccos ASC, id) AS rank_hard,
          CAST(COUNT(*) OVER (PARTITION BY cid) AS BIGINT) AS cell_n
        FROM assign2)
      SELECT id AS vec_id, cid, round(ccos, 6) AS proto_cos,
        CAST(rank_hard AS BIGINT) AS rank_hard, cell_n,
        rank_hard <= (cell_n + 1) // 2 AS kept
      FROM ranked ORDER BY vec_id"""))

  /** Incremental connected components
    * (TextOps.connectedComponentsIncremental): yesterday's corpus
    * (doc_id % 10 ≠ 0) is labeled and FROZEN; today's delivery
    * (doc_id % 10 = 0) contributes every near-dup edge touching it.
    * The merge contracts touched components to super-nodes, solves the
    * delivery-sized contracted graph, and relabels through one
    * broadcast map — per-batch cost follows the DELIVERY, the q139
    * contract. The oracle recomputes BOTH labelings from scratch
    * (recursive reach over the old graph for the frozen column, over
    * the full graph for the merged column), so a green row IS the
    * batch-equivalence proof: incremental merge ≡ from-scratch q62 on
    * the union graph. */
  private val q223 = Q(
    "q223_incremental_components",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      def blockOf = concat($"source", lit("#"),
        ($"n_chars" / 100).cast("int").cast("string"))
      val tr = docs.select($"doc_id".as("doc"), blockOf.as("block"),
        explode(array_distinct(TextOps.tokens($"text"))).as("token"))
      val edges = TextOps.blockedJaccard(tr)
        .filter($"jaccard" >= 0.9)
        .select($"d1", $"d2")
        .transform(graft.ops.Iterate.cut)
      val oldEdges = edges.filter($"d1" % 10 =!= 0 && $"d2" % 10 =!= 0)
      val newEdges = edges.filter($"d1" % 10 === 0 || $"d2" % 10 === 0)
      val oldDocs = docs.filter($"doc_id" % 10 =!= 0)
      // yesterday's labeling: the same one-shuffle union-find q62 uses
      val frozen = TextOps.blockLocalComponents(oldEdges,
          oldDocs.select($"doc_id".as("doc"), blockOf.as("block")),
          oldDocs.select($"doc_id".as("node")))
        .transform(graft.ops.Iterate.cut)
      val merged = TextOps.connectedComponentsIncremental(frozen, newEdges)
      docs.select($"doc_id".as("node"))
        .join(frozen.select($"node", $"cluster".as("__f")), Seq("node"), "left")
        .join(merged.select($"node", $"cluster".as("__m")), Seq("node"), "left")
        .select($"node".as("doc_id"),
          coalesce($"__f", $"node").as("frozen_cluster"),
          coalesce($"__m", $"node").as("cluster"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH RECURSIVE tr AS MATERIALIZED (
        SELECT doc_id AS doc,
          source || '#' || CAST(CAST(n_chars // 100 AS INT) AS VARCHAR) AS block,
          unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS token
        FROM documents),
      sz AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM tr GROUP BY doc),
      inter AS (
        SELECT a.doc AS d1, b.doc AS d2, CAST(COUNT(*) AS BIGINT) AS i
        FROM tr a JOIN tr b ON a.block = b.block AND a.token = b.token
          AND a.doc < b.doc
        GROUP BY 1, 2),
      e AS MATERIALIZED (
        SELECT d1, d2
        FROM inter JOIN sz sa ON d1 = sa.doc JOIN sz sb ON d2 = sb.doc
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.9),
      sym AS MATERIALIZED (SELECT d1 AS s, d2 AS t FROM e
                           UNION SELECT d2, d1 FROM e),
      reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT s.s, r.label FROM reach r JOIN sym s ON r.node = s.t),
      full_c AS MATERIALIZED (
        SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
      symo AS MATERIALIZED (
        SELECT s, t FROM sym WHERE s % 10 <> 0 AND t % 10 <> 0),
      reacho(node, label) AS (
        SELECT doc_id, doc_id FROM documents WHERE doc_id % 10 <> 0
        UNION
        SELECT s.s, r.label FROM reacho r JOIN symo s ON r.node = s.t),
      old_c AS MATERIALIZED (
        SELECT node, MIN(label) AS cluster FROM reacho GROUP BY node)
      SELECT d.doc_id,
        COALESCE(o.cluster, d.doc_id) AS frozen_cluster,
        f.cluster
      FROM documents d
      JOIN full_c f ON d.doc_id = f.node
      LEFT JOIN old_c o ON d.doc_id = o.node
      ORDER BY d.doc_id"""))

  def queries: Seq[Q] =
    Seq(q61, q62, q63, q77, q126, q146, q147, q153, q165, q174, q178, q223)
}
