package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** One band row of an arriving document: its band signature (the join
  * key into the corpus store) plus the full minhash vector and all
  * band signatures, carried so the match can be verified and deduped
  * without any further lookup. */
final case class StreamBandRow(doc: Long, band: Int, sig: Long,
    mhs: Seq[Long], sigs: Seq[Long])

/** Streaming incremental near-dup detection — the streaming sibling of
  * q139: documents arrive, minhash/band signatures are computed per
  * row (bit-identical to the batch [[graft.ops.TextOps.minhash]]
  * chain — StreamIncDedupSpec pins it), and candidates come from a
  * STREAM-STATIC equi-join against the frozen corpus band store. No
  * state store, no watermark: every arriving doc is checked against
  * the corpus within its own micro-batch.
  *
  * Pair dedup is stateless: a pair joins once per agreeing band, and
  * both sides carry ALL their band signatures, so a filter keeps only
  * the row where the joined band is the FIRST agreeing one — exactly
  * one row per (new, old) pair survives without `distinct()` state.
  *
  * Scope: new-vs-corpus only. New-vs-new pairs within one delivery
  * are the batch job's half ([[graft.ops.Retrieval
  * .incrementalLshCandidates]] covers both sides); at 100 TB the
  * corpus store is a static parquet table the join shuffles against,
  * refreshed by the nightly batch that folds the day's arrivals in.
  */
object StreamIncDedup {

  /** k-minhash signature over w-shingles — bit-identical to the batch
    * `minhash(shingles(tokens(text)))` chain: same whitespace split,
    * same md5-prefix hash pair (chars 0-14 and 15-29 of the digest),
    * same Kirsch-Mitzenmacher g_j = h1 + j·(h2 mod p). Duplicate
    * shingles don't affect a min, so no distinct set is kept. Empty
    * (< w tokens) docs return an empty signature. */
  def signature(text: String, k: Int = 8, w: Int = 3): Array[Long] = {
    val ts = text.trim.split("\\s+")
    if (ts.length < w) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(k)(Long.MaxValue)
    ts.sliding(w).foreach { sh =>
      val hex = md.digest(sh.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16) % 1000000007L
      var j = 0
      while (j < k) {
        val v = h1 + j * h2
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    mins
  }

  /** Stream side: one row per (doc, band), carrying the doc's full
    * minhash vector and band-signature list. */
  def bandRows(stream: Dataset[DocEvent], k: Int = 8,
      r: Int = 4): Dataset[StreamBandRow] = {
    implicit val enc = Encoders.product[StreamBandRow]
    stream.flatMap { e =>
      val m = signature(e.text, k, w = 3)
      if (m.isEmpty) Iterator.empty
      else {
        val sigs = Array.tabulate(k / r)(b =>
          (b * r until (b + 1) * r).map(m(_)).sum)
        sigs.indices.iterator.map(b =>
          StreamBandRow(e.doc, b, sigs(b), m.toSeq, sigs.toSeq))
      }
    }
  }

  /** The frozen corpus store, built batch-side from a minhash table
    * (doc, j, h): one row per (doc, band) with the same carried
    * vectors as the stream side. Persist this as the static join
    * table; the nightly batch refresh folds new arrivals in. */
  def corpusStore(mh: DataFrame, k: Int = 8, r: Int = 4): DataFrame =
    mh.groupBy(col("doc"))
      .agg(expr("transform(array_sort(collect_list(struct(j, h))), x -> x.h)")
        .as("mhs"))
      .withColumn("sigs", expr(
        s"transform(sequence(0, ${k / r - 1}), " +
          s"b -> aggregate(slice(mhs, b * $r + 1, $r), 0L, (a, x) -> a + x))"))
      .withColumn("band", explode(sequence(lit(0), lit(k / r - 1))))
      .withColumn("sig", expr("sigs[band]"))
      .select(col("doc"), col("band").cast("int").as("band"), col("sig"),
        col("mhs"), col("sigs"))

  /** Stream-static candidate join + estimate: emits (d1 = arriving doc,
    * d2 = corpus doc, est_jaccard) for pairs at or above `threshold`.
    * Works on streaming and static band frames alike (the parity
    * spec's contract). */
  def matches(streamBands: DataFrame, store: DataFrame,
      threshold: Double, k: Int = 8): DataFrame =
    streamBands.as("n")
      .join(store.as("o"),
        col("n.band") === col("o.band") && col("n.sig") === col("o.sig") &&
          col("n.doc") =!= col("o.doc"))
      // keep only the first agreeing band — one row per pair, no state
      .filter(expr("n.band = CAST(array_position(" +
        "zip_with(n.sigs, o.sigs, (a, b) -> a = b), true) AS INT) - 1"))
      .select(col("n.doc").as("d1"), col("o.doc").as("d2"),
        (expr("aggregate(zip_with(n.mhs, o.mhs, (a, b) -> IF(a = b, 1, 0)), " +
          "0, (acc, x) -> acc + x)").cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
}
