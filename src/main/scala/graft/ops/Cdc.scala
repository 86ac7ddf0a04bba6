package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (the LBFS scheme — Muthitacharoen et al.
  * SOSP '01, the rolling-hash cut rule behind rsync and every CDC
  * storage deduplicator), lifted to token streams: cut AFTER token p
  * whenever the hash of the k-token gram ENDING at p satisfies
  * h ≡ 0 (mod m). Chunk boundaries depend only on local content, so an
  * insertion or deletion re-chunks O(1) chunks instead of shifting
  * every boundary the way fixed-size chunking does — which is what
  * makes chunk-level dedup robust to the small edits that dominate
  * near-duplicate web text (same article, different byline).
  *
  * Complements the dedup ladder: document-level (q46–q49) scores whole
  * docs, winnowing (q166) finds clone PAIRS, dupSpans (q110) counts
  * fixed-w span overlap; CDC measures how much of each document is
  * REUSED CONTENT at variable-sized chunk granularity — the unit an
  * incremental corpus store would actually dedup on disk.
  *
  * Scale shape: gram hashing and the boundary rule are map-side; the
  * per-document cumulative boundary count is a window partitioned by
  * doc (parallelism = #docs, frame never crosses one); chunk assembly
  * is one groupBy(doc, chunk) and the cross-doc frequency table keys
  * on the 60-bit chunk hash — text never rides that shuffle.
  */
object Cdc {

  /** Chunk rows: (doc, chunk, n_tokens, h) — variable-sized chunks of
    * each document under the k-gram/mod-m cut rule, h = h64 of the
    * space-joined chunk text. Expected chunk length ≈ m tokens. */
  def chunks(docs: DataFrame, doc: Column, text: Column,
      k: Int, m: Int): DataFrame = {
    val toks = docs
      .select(doc.as("doc"), TextOps.tokens(text).as("ts"))
      .select(col("doc"), posexplode(col("ts")).as(Seq("pos", "tok")))
    val grams = docs
      .select(doc.as("doc"), TextOps.tokens(text).as("ts"))
      .select(col("doc"), posexplode(TextOps.shingles("ts", k)).as(Seq("gp", "g")))
      // the gram starting at gp ends at gp + k - 1; cut after that token
      .select(col("doc"), (col("gp") + (k - 1)).as("pos"),
        when(TextOps.h64(col("g")) % m === 0, 1L).otherwise(0L).as("cut"))
      .filter(col("cut") === 1L)
    val wCum = Window.partitionBy(col("doc")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(grams, Seq("doc", "pos"), "left")
      .withColumn("__f", coalesce(col("cut"), lit(0L)))
      .withColumn("chunk", sum(col("__f")).over(wCum) - col("__f"))
      .groupBy(col("doc"), col("chunk"))
      .agg(count(lit(1)).as("n_tokens"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"))
          .as("__text"))
      .select(col("doc"), col("chunk"), col("n_tokens"),
        TextOps.h64(col("__text")).as("h"))
  }

  /** Per-document chunk-reuse profile: chunk count, chunks whose hash
    * occurs in >1 document, and the fraction of the document's tokens
    * inside such shared chunks. */
  def chunkDedupProfile(chunkRows: DataFrame): DataFrame = {
    val freq = chunkRows.groupBy(col("h"))
      .agg(countDistinct(col("doc")).as("ndocs"))
    chunkRows.join(freq, Seq("h"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_shared"),
        sum(col("n_tokens")).as("__tot"),
        sum(when(col("ndocs") > 1, col("n_tokens")).otherwise(0L)).as("__shtok"))
      .select(col("doc"), col("n_chunks"), col("n_shared"),
        (col("__shtok").cast("double") / col("__tot").cast("double"))
          .as("shared_token_frac"))
  }

  /** DuckDB twin of [[chunks]]: CTE chain ending in
    * `chunks(doc, chunk, n_tokens, h)`. */
  def chunksSql(table: String, docExpr: String, textExpr: String,
      k: Int, m: Int): String = s"""
    ctok0 AS (SELECT $docExpr AS doc,
                string_split_regex(trim($textExpr), '\\s+') AS ts
              FROM $table),
    ctoks AS (
      SELECT doc, i - 1 AS pos, ts[i] AS tok
      FROM ctok0, LATERAL (
        SELECT unnest(generate_series(1, len(ts))) AS i) g),
    ccuts AS (
      SELECT doc, (i - 1) + ${k - 1} AS pos, 1 AS cut
      FROM ctok0, LATERAL (
        SELECT unnest(generate_series(1, len(ts) - ${k - 1})) AS i) g
      WHERE len(ts) >= $k
        AND ${TextOps.h64Sql(s"array_to_string(ts[i:i+${k - 1}], ' ')")}
              % $m = 0),
    cflag AS (
      SELECT t.doc, t.pos, t.tok, COALESCE(c.cut, 0) AS f
      FROM ctoks t LEFT JOIN ccuts c ON t.doc = c.doc AND t.pos = c.pos),
    cassign AS (
      SELECT doc, pos, tok,
        SUM(f) OVER (PARTITION BY doc ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - f AS chunk
      FROM cflag),
    chunks AS (
      SELECT doc, chunk, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        ${TextOps.h64Sql("string_agg(tok, ' ' ORDER BY pos)")} AS h
      FROM cassign GROUP BY doc, chunk)"""
}
