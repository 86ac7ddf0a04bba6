package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Drift

/** Streaming drift SCREEN — the standing-query form of q192 (slice
  * monitoring is continuous in production: "which sources drifted this
  * hour" is asked of a stream, not a nightly batch).
  *
  * Decomposition (the same shape every streaming sibling here uses —
  * keep the stateful part minimal, share the fold with batch):
  *
  *  1. [[binnedCounts]] — stateless frozen-edge bin assignment
  *     ([[StreamDrift.assignBins]]: a broadcast join against the
  *     reference quantile-edge table) followed by ONE streaming
  *     groupBy((countKeys, bin)).count(). State is the running
  *     histogram: O(#keys × #bins) counters with #bins fixed by the
  *     edge table — the "O(sources) state" contract; the raw rows are
  *     never retained.
  *  2. [[Drift.ksScreenFold]] — the leave-one-out binned KS sup
  *     (integer-exact), fixed-chain Kolmogorov Q p-value, and
  *     Benjamini–Hochberg step-up over the histogram, BIT-IDENTICAL to
  *     the batch q192 fold because it IS the same function. Run it on
  *     the aggregation's current result (the memory/complete sink
  *     table, or any store the histogram lands in); Spark disallows a
  *     second stateful aggregation in the same streaming query, and
  *     the screen is a sources-sized fold anyway.
  *
  * Parity by construction: binning is a stateless map, counting is
  * associative, and the fold is shared — so screening the streamed
  * histogram after ANY micro-batch split equals the batch screen over
  * the same prefix of rows (StreamDriftScreenSpec pins it). Unlike the
  * exact-ECDF batch q192 (bin = raw value), the streaming screen bins
  * against FROZEN reference edges — the standard trade that keeps
  * state finite on an unbounded value domain. */
object StreamDriftScreen {

  /** Stream → running per-(countKeys, bin) histogram. `edgeKeys` joins
    * the frozen edge table (use a constant column for one global edge
    * set — bins must be shared across the screened keys for the
    * rest-of-corpus comparison to be meaningful); `countKeys` are the
    * screened slices (e.g. source). Exactly one stateful operator. */
  def binnedCounts(stream: DataFrame, edges: DataFrame,
      edgeKeys: Seq[String], countKeys: Seq[String], x: Column): DataFrame =
    StreamDrift.assignBins(stream, edges, edgeKeys, x)
      .groupBy(countKeys.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("c"))

  /** The screen over a histogram frame (key, bin, c) — batch and
    * stream call the same fold. */
  def screen(hist: DataFrame, key: String, alpha: Double = 0.05): DataFrame =
    Drift.ksScreenFold(hist, key, alpha)
}
