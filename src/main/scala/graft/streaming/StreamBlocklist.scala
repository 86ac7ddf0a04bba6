package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Streaming blocklist gate — the streaming sibling of q148
  * ([[graft.ops.TextOps.blocklistStats]]): arriving documents are
  * scored against the badword lexicon one row at a time. Completely
  * stateless: the lexicon is a literal array folded into the plan
  * (no state store, no watermark, no join — not even a stream-static
  * one), so a document is admitted or dropped within its own
  * micro-batch at per-row cost. The per-row scorer
  * ([[TextOps.blocklistStatsRow]]) is value-identical to the batch
  * aggregation (StreamBlocklistSpec pins the parity).
  */
object StreamBlocklist {

  /** (doc, text) stream → (doc, n_tokens, n_hits, n_distinct_hits,
    * hit_ratio, keep) — the exact q148 row for each arriving doc. */
  def score(docs: DataFrame, words: Seq[String]): DataFrame =
    TextOps.blocklistStatsRow(docs, col("doc"), col("text"), words)
}
