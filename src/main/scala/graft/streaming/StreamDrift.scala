package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import graft.ops.Drift

/** Streaming drift-bin assignment — the streaming sibling of q159
  * ([[graft.ops.Drift]]): each arriving metric row is bucketed against
  * the FROZEN reference quantile edges (the same broadcast `__th`
  * table the batch PSI uses), emitted at row grain with its `bin` —
  * completely stateless, append-mode safe, no watermark. The PSI fold
  * itself stays a batch job over the binned emissions (or any sink
  * that can count), exactly as the novelty/containment siblings leave
  * the per-doc fold downstream; StreamDriftSpec pins that the fold
  * over any delivery split equals the single-batch histogram, which is
  * what stateless-map emission guarantees by construction.
  */
object StreamDrift {

  /** (keys..., x, ...) stream → same rows + `bin` against the frozen
    * edge table from [[Drift.referenceEdges]]. */
  def assignBins(stream: DataFrame, edges: DataFrame, keys: Seq[String],
      x: Column): DataFrame =
    Drift.assignBins(stream, edges, keys, x)
}
