package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketch: KMV (k minimum values).
  *
  * At 100 TB, `COUNT(DISTINCT token)` per group is a full shuffle of
  * every distinct (group, token) pair; a sketch answers the same
  * question from k values per group. KMV keeps the k smallest hashes of
  * the distinct values ("k-minimum-values" / bottom-k, the classic
  * distinct-value estimator of Bar-Yossef et al. 2002): if the k-th
  * smallest of n uniform hashes in [0, H) sits at height h, then
  * n ≈ (k−1)·H/h.
  *
  * Two properties make this the right sketch here rather than HLL:
  *
  *  - **Deterministic & cross-engine checkable.** The hash is
  *    [[TextOps.h64]] (md5-derived, H = 2^60) — no RNG, no
  *    implementation-defined HLL register layout, so a DuckDB oracle
  *    computes the bit-identical estimate ([[kmvSql]] is the twin; q74
  *    verifies it end-to-end) and reruns at any partition count agree.
  *  - **Mergeable.** The union of two value sets' bottom-k is the
  *    bottom-k of the merged multiset: partial sketches combine by
  *    "concat, sort, take k", so partition-local sketches reduce
  *    tree-wise without ever moving raw values. The formulation below
  *    (distinct → per-group rank ≤ k) lets Spark's WindowGroupLimit
  *    keep only k candidates per group per partition — the map-side
  *    combine of that merge.
  *
  * Exactness guard: a group with fewer than k distinct hashes reports
  * its exact count (the sketch degrades to exact below its resolution).
  */
object Sketch {
  /** Hash space of [[TextOps.h64]]: 2^60, as the double it rounds to. */
  private[graft] val HashSpace = 1.152921504606846976e18

  /** The KMV estimator on a materialized bottom-k: exact below k,
    * (k−1)·H/kth at k. Shared by the batch Column path and the
    * streaming state path so the two agree bit-for-bit. */
  private[graft] def estimateFromBottomK(n: Int, kth: Long, k: Int): Double =
    if (n < k) n.toDouble else (k - 1).toDouble * HashSpace / kth.toDouble

  /** Per-`key` estimated distinct count of `value` with a bottom-`k`
    * sketch. Output: (key, est_distinct: double). */
  def kmvDistinct(df: DataFrame, key: Column, value: Column, k: Int): DataFrame = {
    val hashes = df.select(key.as("key"), TextOps.h64(value).as("h")).distinct()
    Relational.topKPerGroup(hashes, Seq(col("key")), Seq(col("h").asc), k)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_h"), max(col("h")).as("kth"))
      .select(col("key"),
        when(col("n_h") < k, col("n_h").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / col("kth").cast("double"))
          .as("est_distinct"))
  }

  /** DuckDB twin of [[kmvDistinct]]: SQL producing (key, est_distinct)
    * from `table`, distinct-hashing `valueExpr` per `keyExpr`. */
  def kmvSql(fromClause: String, keyExpr: String, valueExpr: String, k: Int): String = s"""
    WITH hv AS (
      SELECT DISTINCT $keyExpr AS key, ${TextOps.h64Sql(valueExpr)} AS h
      FROM $fromClause),
    ranked AS (
      SELECT key, h, ROW_NUMBER() OVER (PARTITION BY key ORDER BY h) AS rn
      FROM hv),
    bk AS (
      SELECT key, CAST(COUNT(*) AS BIGINT) AS n_h, MAX(h) AS kth
      FROM ranked WHERE rn <= $k GROUP BY key)
    SELECT key,
      CASE WHEN n_h < $k THEN CAST(n_h AS DOUBLE)
           ELSE ${(k - 1).toDouble}e0 * 1.152921504606846976e18 / CAST(kth AS DOUBLE)
      END AS est_distinct
    FROM bk"""

  /** Count-Min sketch (Cormode & Muthukrishnan '05): `d` hash rows ×
    * `w` counters; occurrence counts of `value` fold into counter
    * (j, g_j(value) mod w) for each row j, and a point estimate is the
    * minimum of a value's d counters — an overestimate by at most the
    * collision mass, never an underestimate. The g_j family is
    * Kirsch-Mitzenmacher over the same md5 digest as minhash
    * (g_j = h1 + j·(h2 mod p)), so the sketch is deterministic,
    * cross-engine checkable, and MERGEABLE (counters add) — the same
    * properties that picked KMV over HLL. The sketch itself is at most
    * d·w rows regardless of input size: one narrow groupBy shuffle to
    * build, a broadcast to query. */
  val CmsP = 1000000007L

  /** Build: (j, c, cnt) counter table, at most d·w rows. */
  def cmsBuild(df: DataFrame, value: Column, d: Int, w: Int): DataFrame = {
    val hashed = df.select(TextOps.h64(value).as("h1"),
      (TextOps.h64b(value) % CmsP).as("h2"))
    hashed
      .select(explode(expr(s"transform(sequence(0, ${d - 1}), j ->" +
        s" named_struct('j', j, 'c', CAST((h1 + j * h2) % $w AS INT)))"))
        .as("jc"))
      .groupBy(col("jc.j").as("j"), col("jc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` (any frame with the value column):
    * min over the d counters. The counter table is ≤ d·w rows and
    * broadcast; probes never shuffle. Missing counters mean zero
    * occurrences. Output: probes' columns + est: long.
    *
    * Row multiplicity is preserved — duplicate probe rows each get
    * their estimate (a per-row id rides the explode/groupBy, then
    * drops). Internals are `__cms_`-prefixed and the counter table's
    * columns are renamed before the join, so probe frames may freely
    * carry columns named j, c or cnt; only `est` (the output column)
    * and the `__cms_` prefix are reserved. */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, value: Column,
      d: Int, w: Int): DataFrame = {
    val p = probes
      .withColumn("__cms_rid", monotonically_increasing_id())
      .withColumn("__cms_h1", TextOps.h64(value))
      .withColumn("__cms_h2", TextOps.h64b(value) % CmsP)
      .withColumn("__cms_j", explode(expr(s"sequence(0, ${d - 1})")))
      .withColumn("__cms_c",
        expr(s"CAST((__cms_h1 + __cms_j * __cms_h2) % $w AS INT)"))
    val counters = cms.select(col("j").as("__cms_j"),
      col("c").as("__cms_c"), col("cnt").as("__cms_cnt"))
    p.join(broadcast(counters), Seq("__cms_j", "__cms_c"), "left")
      .groupBy((col("__cms_rid") +: probes.columns.toIndexedSeq.map(col)): _*)
      .agg(min(coalesce(col("__cms_cnt"), lit(0L))).as("est"))
      .drop("__cms_rid")
  }
}
