package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Streaming Gopher quality gate — the streaming sibling of q169
  * ([[graft.ops.TextOps.gopherRules]]): arriving documents are scored
  * against the published hard-threshold rule table one row at a time.
  * Completely stateless (the stopword lexicon is a literal array in
  * the plan), so each doc's per-rule flags and first-failing-rule
  * decision are emitted within its own micro-batch. The per-row scorer
  * ([[TextOps.gopherRulesRow]]) is value-identical to the batch
  * aggregation (StreamGopherSpec pins the parity).
  */
object StreamGopher {

  /** (doc, text) stream → the exact q169 row for each arriving doc. */
  def score(docs: DataFrame, minWords: Long = 50): DataFrame =
    TextOps.gopherRulesRow(docs, col("doc"), col("text"),
      minWords = minWords)
}
