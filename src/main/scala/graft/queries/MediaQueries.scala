package graft.queries

import graft.Tables
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (opaque-binary) payload deduplication — the stage a real
  * pipeline runs BEFORE the expensive decode/embed steps (decoding a
  * duplicate image is pure waste): exact content-hash dedup of the
  * payload bytes, and a blocked perceptual-style signature for
  * near-duplicate payloads (truncated/appended/re-muxed media that an
  * exact hash misses).
  *
  * Payloads follow the q53 convention: the documents table's text
  * bytes stand in for the opaque media column (`text.cast("binary")`)
  * — this environment ships no codecs, and the dedup operators treat
  * the bytes as opaque anyway, which is exactly the point: NOTHING
  * here decodes. The Spark surface (binary columns, map-side
  * signatures, banded equi-join) is the real, tested contract.
  */
object MediaQueries extends QueryGroup {

  /** Exact binary dedup: md5 over the raw payload BYTES (no
    * normalization — media bytes are opaque), hash-groupBy, canonical =
    * min id. The join back to the group table reuses the groupBy's own
    * hash partitioning (one shuffle); at 100 TB only the 16-byte hash
    * and the ids shuffle, never the payloads. */
  private val q193 = Q(
    "q193_media_exact_dedup",
    (s, dir) => {
      import s.implicits._
      val withH = Tables(s, dir, "documents").select($"doc_id",
        octet_length($"text".cast("binary")).as("n_bytes"),
        md5($"text".cast("binary")).as("ph"))
      val groups = withH.groupBy($"ph")
        .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      withH.join(groups, Seq("ph"))
        .select($"doc_id", $"n_bytes", $"canonical_id", $"n_copies",
          ($"doc_id" =!= $"canonical_id").as("is_dup"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH h AS (
        SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
          md5(text) AS ph
        FROM documents),
      g AS (
        SELECT ph, MIN(doc_id) AS canonical_id,
          CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM h GROUP BY ph)
      SELECT h.doc_id, h.n_bytes, g.canonical_id, g.n_copies,
        (h.doc_id <> g.canonical_id) AS is_dup
      FROM h JOIN g USING (ph) ORDER BY h.doc_id"""))

  /** Near-duplicate payloads by BLOCK-SIGNATURE SimHash: the payload is
    * cut into fixed 64-byte blocks, each block content-hashed, and the
    * q48 SimHash machinery runs over the block-hash set — two payloads
    * sharing most blocks (a truncation, an append, a metadata patch)
    * land at small Hamming distance, unrelated payloads at ~16/32. A
    * char-frequency histogram would NOT discriminate here (all text-like
    * payloads share one byte distribution, and SimHash over proportional
    * histograms is scale-invariant — every signature would collide);
    * block hashes carry content STRUCTURE, the perceptual-hash analog
    * for opaque bytes.
    *
    * Scale shape: exact-duplicate groups collapse first (q182's
    * representative pattern — a dup clique must not explode the pair
    * output; multiplicity returns as n_pairs = n₁·n₂); signatures are
    * one map-side-partial groupBy (64-bit row per rep); candidates come
    * from a BANDED equi-join on 4×8-bit signature bands — lossless for
    * the emitted Hamming ≤ 3 radius (4 bands, ≤3 differing bits →
    * pigeonhole leaves one band intact), so the oracle's all-pairs
    * formulation returns the identical set while Spark never goes
    * O(n²). */
  private val q194 = Q(
    "q194_media_block_simhash",
    (s, dir) => {
      import s.implicits._
      val hashed = Tables(s, dir, "documents")
        .select($"doc_id", $"text", md5($"text".cast("binary")).as("ph"))
      val reps = hashed.groupBy($"ph")
        .agg(min($"doc_id").as("doc"), count(lit(1)).as("n_copies"))
      val rdocs = hashed
        .join(reps.select($"doc", $"n_copies"), hashed("doc_id") === $"doc")
        .select($"doc", $"text")
      val blocks = rdocs
        .withColumn("n", length($"text"))
        .filter($"n" >= 1)
        .select($"doc",
          explode(expr("sequence(0, (n - 1) div 64)")).as("i"), $"text")
        .select($"doc",
          expr("substring(text, CAST(i * 64 + 1 AS INT), 64)").as("blk"))
      val fp = TextOps.simhash(blocks, $"doc", $"blk", bits = 32)
      val bands = fp.select($"doc", $"simhash",
          explode(expr("sequence(0, 3)")).as("b"))
        .withColumn("bs", expr("(simhash >> (b * 8)) & 255"))
      val cands = bands.as("a").join(bands.as("b"),
          $"a.b" === $"b.b" && $"a.bs" === $"b.bs" && $"a.doc" < $"b.doc")
        .select($"a.doc".as("d1"), $"b.doc".as("d2"),
          $"a.simhash".as("s1"), $"b.simhash".as("s2"))
        .distinct()
      val copies = reps.select($"doc", $"n_copies")
      cands
        .withColumn("hamming", expr("CAST(bit_count(s1 ^ s2) AS INT)"))
        .filter($"hamming" <= 3)
        .join(copies.select($"doc".as("d1"), $"n_copies".as("n1")), Seq("d1"))
        .join(copies.select($"doc".as("d2"), $"n_copies".as("n2")), Seq("d2"))
        .select($"d1", $"d2", $"hamming", ($"n1" * $"n2").as("n_pairs"))
        .orderBy($"d1", $"d2")
    },
    Some(s"""
      WITH reps AS (
        SELECT MIN(doc_id) AS doc, CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY md5(text)),
      rdocs AS (
        SELECT r.doc, d.text FROM reps r JOIN documents d ON d.doc_id = r.doc
        WHERE length(d.text) >= 1),
      blk AS (
        SELECT doc, unnest(list_transform(
          generate_series(0, (length(text) - 1) // 64),
          i -> substring(text, i * 64 + 1, 64))) AS blk
        FROM rdocs),
      th AS (SELECT doc, ${TextOps.h64Sql("blk")} AS th FROM blk),
      bitsum AS (
        SELECT doc, b, SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS bs
        FROM th, (SELECT unnest(generate_series(0, 31)) AS b) bits
        GROUP BY doc, b),
      fp AS (
        SELECT doc, SUM(CASE WHEN bs > 0 THEN (CAST(1 AS BIGINT) << b)
                             ELSE 0 END) AS simhash
        FROM bitsum GROUP BY doc)
      SELECT a.doc AS d1, b.doc AS d2,
        CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming,
        r1.n_copies * r2.n_copies AS n_pairs
      FROM fp a JOIN fp b ON a.doc < b.doc
      JOIN reps r1 ON r1.doc = a.doc
      JOIN reps r2 ON r2.doc = b.doc
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY d1, d2"""))

  def queries: Seq[Q] = Seq(q193, q194)
}
