package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.Sketch

/** Streaming Bloom membership gate — the q197 filter as a standing
  * query: arriving span/doc hashes probe the FROZEN reference word
  * table ([[Sketch.bloomWords]], a ≤ m/32-row broadcast) and each row
  * emits with its `bloom_hit` flag. Completely STATELESS: the probe is
  * three broadcast joins at row grain ([[Sketch.bloomProbe]] — the
  * same function the batch gate runs, so batch parity holds by
  * construction), append-mode safe, no watermark, no aggregation.
  * This is the production crawl-ingest shape: drop (or route) rows
  * that are probably already in the reference BEFORE the expensive
  * stages, paying one 2 KB broadcast instead of a corpus join; the
  * Bloom contract (no false negatives) means nothing genuinely new is
  * ever dropped by a "seen" gate, and the FP audit stays a batch fold
  * over the emissions (q197), exactly as the novelty/drift siblings
  * split probe-vs-fold. */
object StreamBloom {

  /** (…, h1, h2) stream → same rows + `bloom_hit` against the frozen
    * word table. */
  def gate(stream: DataFrame, bloom: DataFrame, m: Long): DataFrame =
    Sketch.bloomProbe(stream, bloom, m)
}
