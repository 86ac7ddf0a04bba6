package graft.queries

import graft.Tables
import graft.ops.{Exact, Relational, Shard, Sketch, Skew, TextOps}
import org.apache.spark.sql.functions._

/** Scale-path batch: the rewrites that keep hot keys and distinct
  * counting tractable at 100 TB — salted two-phase aggregation and the
  * KMV distinct sketch — each verified bit-exact against the oracle
  * (the salted plan against the plain one, the sketch against its own
  * deterministic estimator).
  */
object ScaleQueries extends QueryGroup {

  /** Per-source corpus stats via salted two-phase aggregation: the hot
    * 'source' keys (a handful of crawls own most of a real corpus) are
    * spread over 8 reducers in phase 1; phase 2 merges 8 rows per key.
    * Decimal sums are associative, so the result is bit-identical to
    * the oracle's plain GROUP BY — the point of the query. */
  private val q73 = Q(
    "q73_salted_agg",
    (s, dir) => {
      import s.implicits._
      Skew.saltedStats(Tables(s, dir, "documents"),
          $"source", $"n_chars", $"doc_id".cast("string"), buckets = 8)
        .orderBy($"key")
    },
    Some(s"""
      SELECT source AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
        ${Exact.sqlSum("n_chars")} AS sum_value
      FROM documents GROUP BY source ORDER BY key"""))

  /** Distinct tokens per source by KMV bottom-64 sketch: k hashes per
    * group answer the distinct count within ~1/√k, deterministically —
    * the DuckDB oracle runs the identical estimator and matches
    * bit-for-bit, which no RNG-seeded or implementation-defined HLL
    * built-in allows (q177 gets the same guarantee from HLL by pinning
    * the register layout itself). */
  private val q74 = Q(
    "q74_kmv_distinct",
    (s, dir) => {
      import s.implicits._
      val tok = Tables(s, dir, "documents")
        .select($"source", explode(TextOps.tokens($"text")).as("token"))
      Sketch.kmvDistinct(tok, $"source", $"token", k = 64)
        .orderBy($"key")
    },
    Some {
      val from = """(SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents) tok"""
      s"""SELECT * FROM (${Sketch.kmvSql(from, "source", "token", 64)}) q
        ORDER BY key"""
    })

  /** Bloom-prefiltered semi join (ops/Bloom): the small side (orders
    * above a price threshold) compiles to a broadcast bitset that
    * drops non-matching lineitem rows before the shuffle; the exact
    * semi join over survivors removes the false positives, so the
    * oracle is the plain IN-subquery — the runtime-filter pattern with
    * a correctness guarantee instead of a statistics threshold. */
  private val q91 = Q(
    "q91_bloom_semi_join",
    (s, dir) => {
      import s.implicits._
      val hot = Tables(s, dir, "orders")
        .filter($"o_totalprice" > 400000.0).select($"o_orderkey")
      graft.ops.Bloom.semiJoin(
          Tables(s, dir, "lineitem")
            .select($"l_orderkey", $"l_linenumber", $"l_quantity"),
          hot, "l_orderkey", "o_orderkey") // sized from the small side
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                           WHERE o_totalprice > 400000.0e0)
      ORDER BY l_orderkey, l_linenumber"""))

  /** Count-Min occurrence estimates: a 4×1024 counter table summarizes
    * every word occurrence in the corpus; point estimates for a probe
    * set are the min of each word's 4 counters — overestimates only,
    * zero for the absent word, deterministic via the md5-derived
    * Kirsch-Mitzenmacher family so the oracle replicates the sketch
    * bit-for-bit. At 100 TB the sketch stays ≤ d·w rows (one narrow
    * groupBy), and probing is a broadcast join — frequency monitoring
    * without a vocabulary-sized shuffle. */
  private val q115 = Q(
    "q115_count_min",
    (s, dir) => {
      import s.implicits._
      val words = Tables(s, dir, "documents")
        .select(explode(TextOps.tokens($"text")).as("word"))
      val cms = Sketch.cmsBuild(words, $"word", d = 4, w = 1024)
      val probes = Seq("spark", "table", "query", "value", "scan",
        "window", "vector", "zzz_absent").toDF("word")
      Sketch.cmsEstimate(cms, probes, $"word", d = 4, w = 1024)
        .orderBy($"word")
    },
    Some(s"""
      WITH w AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents),
      h AS (
        SELECT ${TextOps.h64Sql("word")} AS h1,
               ${TextOps.h64bSql("word")} % 1000000007 AS h2
        FROM w),
      jc AS (
        SELECT j, (h1 + j * h2) % 1024 AS c
        FROM h, (SELECT unnest(generate_series(0, 3)) AS j) seeds),
      cms AS (
        SELECT j, c, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM jc GROUP BY j, c),
      probes(word) AS (VALUES ('spark'), ('table'), ('query'), ('value'),
        ('scan'), ('window'), ('vector'), ('zzz_absent')),
      ph AS (
        SELECT word, j,
          (${TextOps.h64Sql("word")} +
           j * (${TextOps.h64bSql("word")} % 1000000007)) % 1024 AS c
        FROM probes, (SELECT unnest(generate_series(0, 3)) AS j) seeds)
      SELECT ph.word, MIN(COALESCE(cms.cnt, CAST(0 AS BIGINT))) AS est
      FROM ph LEFT JOIN cms ON cms.j = ph.j AND cms.c = ph.c
      GROUP BY ph.word ORDER BY ph.word"""))

  /** Balanced training shards (ops/Shard): rank documents by token
    * count descending via the counting-sort histogramRank — never a
    * whole-frame window — and deal them serpentine over 8 shards. The
    * output proves the balance (shard token totals within one doc of
    * each other) and pins exact membership with a hash checksum, so
    * the oracle's textbook row_number() formulation must place every
    * doc identically. */
  private val q132 = Q(
    "q132_balanced_shards",
    (s, dir) => {
      import s.implicits._
      val sized = Tables(s, dir, "documents")
        .select($"doc_id",
          size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
      Shard.histogramRank(sized, $"n_tokens", bucketAsc = false,
          Seq($"doc_id".asc), "rnk")
        .withColumn("shard", Shard.serpentineShard($"rnk", 8))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("sum_tokens"),
          sum(pmod(TextOps.h64(concat_ws(":", $"doc_id", $"rnk")),
            lit(1000000007L))).as("membership"))
        .orderBy($"shard")
    },
    Some(s"""
      WITH sized AS (
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
            AS n_tokens
        FROM documents),
      ranked AS (
        SELECT doc_id, n_tokens,
               row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rnk
        FROM sized)
      SELECT ${Shard.serpentineShardSql("rnk", 8)} AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
             CAST(SUM(${TextOps.h64Sql("doc_id || ':' || rnk")}
               % 1000000007) AS BIGINT) AS membership
      FROM ranked GROUP BY 1 ORDER BY shard"""))

  /** Distinct tokens per source by pinned-layout HyperLogLog (the
    * fixed-state sibling of q74's KMV), PLUS the rollup KMV cannot do
    * without re-touching data: the '__all__' row is the elementwise
    * MAX-merge of the per-source registers — the whole-corpus estimate
    * from 64 bytes per source. Registers, estimator and linear-counting
    * correction are all specified (ops/Sketch), so the DuckDB oracle
    * reproduces the estimate bit-for-bit; each row also carries the
    * exact distinct count and the sketch's relative error — at m = 64
    * the theoretical RSE is 1.04/√64 ≈ 13%. Counted values are TRIGRAM
    * shingles: the synthetic corpus's word vocabulary (~31 types) never
    * leaves the linear-counting regime, while its thousands of distinct
    * trigrams exercise the raw harmonic-mean estimator as well. */
  private val q177 = Q(
    "q177_hll_distinct",
    (s, dir) => {
      import s.implicits._
      val tok = Tables(s, dir, "documents")
        .select($"source", TextOps.tokens($"text").as("ts"))
        .select($"source", explode(TextOps.shingles("ts", 3)).as("token"))
      val reg = Sketch.hllRegisters(tok, $"source", $"token")
      val regs = reg.unionByName(
        reg.groupBy($"b").agg(max($"mreg").as("mreg"))
          .select(lit("__all__").as("key"), $"b", $"mreg"))
      val exact = tok.groupBy($"source".as("key"))
        .agg(countDistinct($"token").as("exact_distinct"))
        .unionByName(tok.agg(countDistinct($"token").as("exact_distinct"))
          .select(lit("__all__").as("key"), $"exact_distinct"))
      Sketch.hllEstimate(regs).join(exact, Seq("key"))
        .select($"key", $"est_distinct", $"exact_distinct",
          round(($"est_distinct" - $"exact_distinct".cast("double")) /
            $"exact_distinct".cast("double"), 6).as("rel_err"))
        .orderBy($"key")
    },
    Some {
      val from = """(
        SELECT source, array_to_string(ts[i:i+2], ' ') AS token
        FROM (SELECT source, string_split_regex(trim(text), '\s+') AS ts
              FROM documents), LATERAL (
          SELECT unnest(generate_series(1, len(ts) - 2)) AS i) s
        WHERE len(ts) >= 3) tok"""
      s"""WITH ${Sketch.hllSql(from, "source", "token")},
        ex AS (
          SELECT source AS key, CAST(COUNT(DISTINCT token) AS BIGINT)
            AS exact_distinct
          FROM $from GROUP BY source
          UNION ALL
          SELECT '__all__', CAST(COUNT(DISTINCT token) AS BIGINT)
          FROM $from)
        SELECT e.key, e.est_distinct, x.exact_distinct,
          round((e.est_distinct - CAST(x.exact_distinct AS DOUBLE)) /
            CAST(x.exact_distinct AS DOUBLE), 6) AS rel_err
        FROM hll_est e JOIN ex x ON e.key = x.key ORDER BY e.key"""
    })

  /** Sketch algebra: every PAIRWISE source-vocabulary overlap answered
    * from per-source sketches alone — the corpus is touched ONCE, all
    * 190 pair questions are sketch arithmetic ("sketch once, answer n²
    * questions"). TWO estimators side by side, because the choice is
    * the textbook lesson of intersection sketching:
    *
    *  - HLL inclusion–exclusion est(A)+est(B)−est(A∪B) (union via the
    *    q177 register-MAX merge): the union estimates are fine, but
    *    the subtraction inherits BOTH unions' absolute error — for
    *    intersections ≪ union (this corpus: ~70 of ~2500) the relative
    *    error explodes. Kept as the audit column showing exactly that.
    *  - KMV bottom-k: the k smallest union hashes are a uniform sample
    *    of A∪B, each testable for membership in BOTH sides' sketches
    *    (h ∈ bottomk(A∪B) ∧ h ∈ A ⟹ h ∈ bottomk(A)), so
    *    Ĵ = |bku ∩ bka ∩ bkb| / |bku| and |A∩B| ≈ Ĵ·est(A∪B) — the
    *    MinHash-family answer, with error proportional to J itself.
    *
    * The exact intersection (a token self-join PER PAIR — the cost the
    * sketches avoid) rides along as ground truth for both rel-errs. */
  private val q189 = Q(
    "q189_hll_overlap",
    (s, dir) => {
      import s.implicits._
      val tok = Tables(s, dir, "documents")
        .select($"source", TextOps.tokens($"text").as("ts"))
        .select($"source", explode(TextOps.shingles("ts", 3)).as("token"))
      val reg = Sketch.hllRegisters(tok, $"source", $"token")
        .transform(graft.ops.Iterate.cut)
      val est1 = Sketch.hllEstimate(reg)
      val keys = reg.select($"key").distinct()
      val pairs = keys.select($"key".as("s1")).crossJoin(
          keys.select($"key".as("s2")))
        .filter($"s1" < $"s2")
      val merged = pairs
        .join(reg.select($"key".as("s1"), $"b", $"mreg"), Seq("s1"))
        .select($"s1", $"s2", $"b", $"mreg")
        .unionByName(pairs
          .join(reg.select($"key".as("s2"), $"b", $"mreg"), Seq("s2"))
          .select($"s1", $"s2", $"b", $"mreg"))
        .groupBy($"s1", $"s2", $"b").agg(max($"mreg").as("mreg"))
        .select(concat($"s1", lit("|"), $"s2").as("key"), $"b", $"mreg")
      val estU = Sketch.hllEstimate(merged)
        .select(split($"key", "\\|").getItem(0).as("s1"),
          split($"key", "\\|").getItem(1).as("s2"),
          $"est_distinct".as("est_union"))
      // KMV bottom-64 sketches and the pairwise Jaccard-based estimate
      val k = 64
      val hv = tok.select($"source".as("key"), TextOps.h64($"token").as("h"))
        .distinct()
      val bk = Relational.topKPerGroup(hv, Seq($"key"), Seq($"h".asc), k)
        .select($"key", $"h").transform(graft.ops.Iterate.cut)
      val pu = pairs
        .join(bk.select($"key".as("s1"), $"h"), Seq("s1"))
        .select($"s1", $"s2", $"h")
        .unionByName(pairs
          .join(bk.select($"key".as("s2"), $"h"), Seq("s2"))
          .select($"s1", $"s2", $"h"))
        .distinct()
      val bku = Relational.topKPerGroup(pu, Seq($"s1", $"s2"),
        Seq($"h".asc), k)
      val marked = bku
        .join(bk.select($"key".as("s1"), $"h", lit(1L).as("ina")),
          Seq("s1", "h"), "left")
        .join(bk.select($"key".as("s2"), $"h", lit(1L).as("inb")),
          Seq("s2", "h"), "left")
      val kmv = marked.groupBy($"s1", $"s2")
        .agg(count(lit(1)).as("nu"), max($"h").as("kth"),
          sum(when($"ina".isNotNull && $"inb".isNotNull, 1L).otherwise(0L))
            .as("c"))
        .select($"s1", $"s2",
          round($"c".cast("double") / $"nu".cast("double") *
            when($"nu" < k, $"nu".cast("double"))
              .otherwise(lit((k - 1).toDouble) * lit(Sketch.HashSpace) /
                $"kth".cast("double")), 6).as("est_inter_kmv"))
      val exact = tok.select($"source", $"token").distinct()
      val exactInter = exact.select($"source".as("s1"), $"token")
        .join(exact.select($"source".as("s2"), $"token"), Seq("token"))
        .filter($"s1" < $"s2")
        .groupBy($"s1", $"s2").agg(count(lit(1)).as("exact_inter"))
      estU
        .join(est1.select($"key".as("s1"), $"est_distinct".as("ea")), Seq("s1"))
        .join(est1.select($"key".as("s2"), $"est_distinct".as("eb")), Seq("s2"))
        .join(kmv, Seq("s1", "s2"))
        .join(exactInter, Seq("s1", "s2"))
        .select($"s1", $"s2",
          round($"ea" + $"eb" - $"est_union", 6).as("est_inter_hll"),
          $"est_inter_kmv", $"exact_inter",
          round(($"ea" + $"eb" - $"est_union" -
            $"exact_inter".cast("double")) /
            $"exact_inter".cast("double"), 6).as("rel_err_hll"),
          round(($"est_inter_kmv" - $"exact_inter".cast("double")) /
            $"exact_inter".cast("double"), 6).as("rel_err_kmv"))
        .orderBy($"s1", $"s2")
    },
    Some {
      val from = """(
        SELECT source, array_to_string(ts[i:i+2], ' ') AS token
        FROM (SELECT source, string_split_regex(trim(text), '\s+') AS ts
              FROM documents), LATERAL (
          SELECT unnest(generate_series(1, len(ts) - 2)) AS i) s
        WHERE len(ts) >= 3) tok"""
      val est = "CASE WHEN CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE)" +
        " * CAST(36028797018963968.0 AS DOUBLE) / CAST(s AS DOUBLE)" +
        " <= 160.0 AND v > 0" +
        " THEN round(CAST(64.0 AS DOUBLE) * ln(CAST(64.0 AS DOUBLE) /" +
        " CAST(v AS DOUBLE)), 6)" +
        " ELSE round(CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE)" +
        " * CAST(36028797018963968.0 AS DOUBLE) / CAST(s AS DOUBLE), 6) END"
      s"""
      WITH hv AS (
        SELECT DISTINCT source AS key, ${TextOps.h64Sql("token")} AS h
        FROM $from),
      reg AS (
        SELECT key, h % 64 AS b,
          MAX(CASE WHEN h // 64 = 0 THEN 55
                   ELSE 55 - length(bin(h // 64)) END) AS mreg
        FROM hv GROUP BY key, h % 64),
      spine AS (
        SELECT k.key, gs.b
        FROM (SELECT DISTINCT key FROM reg) k
        CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) gs),
      dense AS (
        SELECT s.key, s.b, COALESCE(r.mreg, 0) AS mreg
        FROM spine s LEFT JOIN reg r ON s.key = r.key AND s.b = r.b),
      single AS (
        SELECT key, $est AS e FROM (
          SELECT key, SUM(CAST(1 AS BIGINT) << (55 - mreg)) AS s,
            SUM(CASE WHEN mreg = 0 THEN 1 ELSE 0 END) AS v
          FROM dense GROUP BY key)),
      pairs AS (
        SELECT a.key AS s1, b.key AS s2
        FROM (SELECT DISTINCT key FROM reg) a
        JOIN (SELECT DISTINCT key FROM reg) b ON a.key < b.key),
      pdense AS (
        SELECT p.s1, p.s2, da.b, GREATEST(da.mreg, db.mreg) AS mreg
        FROM pairs p
        JOIN dense da ON da.key = p.s1
        JOIN dense db ON db.key = p.s2 AND da.b = db.b),
      punion AS (
        SELECT s1, s2, $est AS eu FROM (
          SELECT s1, s2, SUM(CAST(1 AS BIGINT) << (55 - mreg)) AS s,
            SUM(CASE WHEN mreg = 0 THEN 1 ELSE 0 END) AS v
          FROM pdense GROUP BY s1, s2)),
      bk AS (
        SELECT key, h FROM (
          SELECT key, h, ROW_NUMBER() OVER (PARTITION BY key
            ORDER BY h) AS rn
          FROM hv) WHERE rn <= 64),
      pu AS (
        SELECT DISTINCT s1, s2, h FROM (
          SELECT p.s1, p.s2, x.h FROM pairs p JOIN bk x ON x.key = p.s1
          UNION ALL
          SELECT p.s1, p.s2, x.h FROM pairs p JOIN bk x ON x.key = p.s2)),
      bku AS (
        SELECT s1, s2, h FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY s1, s2
            ORDER BY h) AS rn
          FROM pu) WHERE rn <= 64),
      kmv AS (
        SELECT u.s1, u.s2, CAST(COUNT(*) AS BIGINT) AS nu,
          MAX(u.h) AS kth,
          CAST(SUM(CASE WHEN a.h IS NOT NULL AND b2.h IS NOT NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM bku u
        LEFT JOIN bk a ON a.key = u.s1 AND a.h = u.h
        LEFT JOIN bk b2 ON b2.key = u.s2 AND b2.h = u.h
        GROUP BY u.s1, u.s2),
      kest AS (
        SELECT s1, s2,
          round(CAST(c AS DOUBLE) / CAST(nu AS DOUBLE) *
            CASE WHEN nu < 64 THEN CAST(nu AS DOUBLE)
                 ELSE 63.0e0 * 1.152921504606846976e18 /
                   CAST(kth AS DOUBLE) END, 6) AS est_inter_kmv
        FROM kmv),
      exd AS (SELECT DISTINCT source AS key, token FROM $from),
      ex AS (
        SELECT a.key AS s1, b.key AS s2, CAST(COUNT(*) AS BIGINT)
          AS exact_inter
        FROM exd a JOIN exd b ON a.token = b.token AND a.key < b.key
        GROUP BY a.key, b.key)
      SELECT p.s1, p.s2,
        round(sa.e + sb.e - p.eu, 6) AS est_inter_hll,
        ke.est_inter_kmv,
        ex.exact_inter,
        round((sa.e + sb.e - p.eu - CAST(ex.exact_inter AS DOUBLE)) /
          CAST(ex.exact_inter AS DOUBLE), 6) AS rel_err_hll,
        round((ke.est_inter_kmv - CAST(ex.exact_inter AS DOUBLE)) /
          CAST(ex.exact_inter AS DOUBLE), 6) AS rel_err_kmv
      FROM punion p
      JOIN single sa ON sa.key = p.s1
      JOIN single sb ON sb.key = p.s2
      JOIN kest ke ON ke.s1 = p.s1 AND ke.s2 = p.s2
      JOIN ex ON ex.s1 = p.s1 AND ex.s2 = p.s2
      ORDER BY p.s1, p.s2"""
    })

  /** Pre-flight join-size estimation by Count-Min inner product
    * (Cormode & Muthukrishnan '05 §4.3): |A ⋈ B| = Σ_k a(k)·b(k) is
    * estimated by min_j Σ_c cmsA[j][c]·cmsB[j][c] — collisions only
    * ADD mass, so the estimate never underestimates and each row j is
    * an independent upper bound. This is the planner's question ("can
    * this join's output fit?") answered from two d×w counter tables
    * without touching either side again — at 100 TB the sketches ride
    * the ingest pass and the decision is sketch arithmetic. Everything
    * is exact integer arithmetic (Kirsch–Mitzenmacher hashes, counter
    * products), so the estimate is bit-identical across engines; the
    * true join count rides along as ground truth. */
  private val q190 = Q(
    "q190_cms_join_estimate",
    (s, dir) => {
      import s.implicits._
      val d = 4
      val w = 65536
      val a = Tables(s, dir, "orders").select($"o_orderkey".as("k"))
      val b = Tables(s, dir, "lineitem").select($"l_orderkey".as("k"))
      val cmsA = Sketch.cmsBuild(a, $"k".cast("string"), d, w)
        .select($"j", $"c", $"cnt".as("ca"))
      val cmsB = Sketch.cmsBuild(b, $"k".cast("string"), d, w)
        .select($"j", $"c", $"cnt".as("cb"))
      val est = cmsA.join(cmsB, Seq("j", "c"))
        .groupBy($"j").agg(sum($"ca" * $"cb").as("ip"))
        .agg(min($"ip").as("est_join_rows"))
      val exact = a.join(b, Seq("k"))
        .agg(count(lit(1)).as("exact_join_rows"))
      val sizes = a.agg(count(lit(1)).as("n_orders"))
        .crossJoin(b.agg(count(lit(1)).as("n_lineitem")))
      est.crossJoin(exact).crossJoin(sizes)
        .select($"n_orders", $"n_lineitem", $"est_join_rows",
          $"exact_join_rows",
          round(($"est_join_rows" - $"exact_join_rows").cast("double") /
            $"exact_join_rows".cast("double"), 6).as("rel_overshoot"))
    },
    Some(s"""
      WITH ah AS (
        SELECT ${TextOps.h64Sql("CAST(o_orderkey AS VARCHAR)")} AS h1,
          ${TextOps.h64bSql("CAST(o_orderkey AS VARCHAR)")} % ${Sketch.CmsP}
            AS h2
        FROM orders),
      bh AS (
        SELECT ${TextOps.h64Sql("CAST(l_orderkey AS VARCHAR)")} AS h1,
          ${TextOps.h64bSql("CAST(l_orderkey AS VARCHAR)")} % ${Sketch.CmsP}
            AS h2
        FROM lineitem),
      cmsa AS (
        SELECT j, CAST((h1 + j * h2) % 65536 AS INT) AS c,
          CAST(COUNT(*) AS BIGINT) AS ca
        FROM ah, (SELECT unnest(generate_series(0, 3)) AS j) js
        GROUP BY 1, 2),
      cmsb AS (
        SELECT j, CAST((h1 + j * h2) % 65536 AS INT) AS c,
          CAST(COUNT(*) AS BIGINT) AS cb
        FROM bh, (SELECT unnest(generate_series(0, 3)) AS j) js
        GROUP BY 1, 2),
      ip AS (
        SELECT a.j, CAST(SUM(a.ca * b.cb) AS BIGINT) AS ip
        FROM cmsa a JOIN cmsb b ON a.j = b.j AND a.c = b.c
        GROUP BY a.j),
      est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_join_rows FROM ip),
      ex AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_rows
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      sz AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_lineitem)
      SELECT n_orders, n_lineitem, est_join_rows, exact_join_rows,
        round(CAST(est_join_rows - exact_join_rows AS DOUBLE) /
          CAST(exact_join_rows AS DOUBLE), 6) AS rel_overshoot
      FROM sz, est, ex"""))

  def queries: Seq[Q] = Seq(q73, q74, q91, q115, q132, q177, q189, q190)
}
