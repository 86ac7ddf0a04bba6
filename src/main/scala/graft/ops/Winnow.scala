package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken SIGMOD
  * '03 — the MOSS local fingerprinting algorithm). Hash every k-token
  * shingle, slide a window of `w` consecutive shingle hashes over each
  * document, and in every window select the minimum hash, breaking
  * ties by the RIGHTMOST position. Consecutive windows usually
  * re-select the same (hash, position), so the distinct selections form
  * a sparse fingerprint set with expected density 2/(w+1) — and, unlike
  * `h % p == 0` sampling (the 0-mod-p scheme [[Cdc]] uses for chunk
  * boundaries), winnowing carries a COVERAGE GUARANTEE: any match of
  * length ≥ k + w − 1 tokens between two documents shares at least one
  * fingerprint, so the pair join cannot miss a long clone.
  *
  * Relation to neighbors: [[TextOps.dupSpans]] keeps EVERY span hash
  * (exact but dense — |tokens| rows shuffled per doc); MinHash (q47)
  * keeps k hashes per doc (sparse but probabilistic — no guarantee).
  * Winnowing sits between: ~2n/(w+1) fingerprints per doc, exact
  * guarantee for long matches. That density knob is what makes
  * passage-level clone detection feasible at 100 TB.
  *
  * Scale shape: shingling and hashing are map-side; the only
  * per-document ordered pass is a window over shingle positions —
  * partitioned by doc, so parallelism is #docs and the frame never
  * crosses a document. The fingerprint table (the only thing shuffled
  * further) is the winnowed ~2/(w+1) sample, and the pair join is an
  * equi-join on the fingerprint hash with a hot-fingerprint cap
  * (boilerplate shared by thousands of docs adds quadratic pairs but
  * no signal — same skew bomb as [[TextOps.capHotBands]]).
  */
object Winnow {

  /** Selection key: lexicographic order = (hash asc, position desc).
    * 15 hex digits of the 60-bit hash, then the position complement
    * zero-padded — string min in any engine picks the winnowing
    * winner (min hash, rightmost on ties). */
  private def selKey(h: Column, pos: Column): Column =
    concat(format_string("%015x", h),
      lpad((lit(999999) - pos).cast("string"), 6, "0"))

  /** Winnowed fingerprints of each document: (doc, fp, fp_pos) — the
    * selected shingle hash and the 0-based token position it starts at.
    * `k` = shingle width in tokens, `w` = winnowing window in shingles.
    * Documents shorter than k + w − 1 tokens (no full window) emit
    * nothing. */
  def fingerprints(docs: DataFrame, doc: Column, text: Column,
      k: Int, w: Int): DataFrame = {
    val hashed = docs
      .select(doc.as("doc"), TextOps.tokens(text).as("ts"))
      .select(col("doc"), posexplode(TextOps.shingles("ts", k)).as(Seq("pos", "s")))
      .select(col("doc"), col("pos"), TextOps.h64(col("s")).as("h"))
    val frame = Window.partitionBy(col("doc")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    hashed
      .withColumn("__key", selKey(col("h"), col("pos")))
      .withColumn("__n", count(lit(1)).over(frame))
      .withColumn("__sel", min(col("__key")).over(frame))
      .filter(col("__n") === w) // full windows only: coverage needs w hashes
      .select(col("doc"),
        conv(substring(col("__sel"), 1, 15), 16, 10).cast("long").as("fp"),
        (lit(999999) - substring(col("__sel"), 16, 6).cast("int")).as("fp_pos"))
      .distinct()
  }

  /** Clone-candidate pairs: documents sharing ≥ `minShared` winnowed
    * fingerprints, with the shared count (the MOSS ranking signal).
    * Fingerprints selected in more than `maxDocs` documents are
    * dropped before the self-join — boilerplate carries no clone
    * signal and would make its bucket quadratic. */
  def clonePairs(fps: DataFrame, minShared: Long, maxDocs: Long): DataFrame = {
    val perFp = fps.select(col("doc"), col("fp")).distinct()
    val hot = perFp.groupBy(col("fp")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxDocs).select(col("fp"))
    val cool = perFp.join(hot, Seq("fp"), "left_anti")
    cool.select(col("fp"), col("doc").as("d1"))
      .join(cool.select(col("fp"), col("doc").as("d2")), Seq("fp"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** DuckDB twin of [[fingerprints]], as a CTE chain ending in
    * `fps(doc, fp, fp_pos)`. `docExpr`/`textExpr` name the id and text
    * columns of `table`. */
  def fingerprintsSql(table: String, docExpr: String, textExpr: String,
      k: Int, w: Int): String = s"""
    wtok AS (SELECT $docExpr AS doc,
               string_split_regex(trim($textExpr), '\\s+') AS ts
             FROM $table),
    wsh AS (
      SELECT doc, i - 1 AS pos,
        ${TextOps.h64Sql(s"array_to_string(ts[i:i+${k - 1}], ' ')")} AS h
      FROM wtok, LATERAL (
        SELECT unnest(generate_series(1, len(ts) - ${k - 1})) AS i) g
      WHERE len(ts) >= $k),
    wsel AS (
      SELECT doc,
        min(printf('%015x', h) || lpad(CAST(999999 - pos AS VARCHAR), 6, '0'))
          OVER (PARTITION BY doc ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS sel,
        count(*) OVER (PARTITION BY doc ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS n
      FROM wsh),
    fps AS (
      SELECT DISTINCT doc,
        CAST(('0x' || substr(sel, 1, 15)) AS BIGINT) AS fp,
        999999 - CAST(substr(sel, 16, 6) AS INT) AS fp_pos
      FROM wsel WHERE n = $w)"""
}
