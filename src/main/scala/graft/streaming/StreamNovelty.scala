package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Streaming span-novelty check — the streaming sibling of q152
  * ([[graft.ops.TextOps.noveltyVsReference]]): each arriving document's
  * w-token spans are checked against the FROZEN reference-hash store
  * via a stream-static left join, the same contract as
  * [[StreamContainment]]/[[StreamIncDedup]]. Emission is at SPAN grain
  * (doc, h, novel) — append-mode safe with no state store, watermark,
  * or aggregation; the consumer (or the nightly batch) folds spans to
  * the per-doc novelty fraction, and the parity spec pins that fold to
  * the batch operator bit-for-bit.
  *
  * At 100 TB the reference store is the same distinct-hash table the
  * batch q152 joins — static parquet, refreshed by the nightly fold of
  * accepted arrivals; Bloom-prefiltering the join key is the standard
  * shrink when the store dwarfs a delivery.
  */
object StreamNovelty {

  /** (doc, text) → (doc, h) distinct span-hash rows, bit-identical to
    * the batch span extraction (works on streaming & static frames). */
  def spans(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc"), TextOps.tokens(col("text")).as("ts"))
      .select(col("doc"), explode(TextOps.shingles("ts", w)).as("s"))
      .select(col("doc"), TextOps.h64(col("s")).as("h"))
      .dropDuplicates("doc", "h")

  /** Stream-static left join against the frozen store: emits
    * (doc, h, novel) per distinct arriving span. `store`: a static
    * frame with a distinct `h` column. */
  def checks(arriving: DataFrame, store: DataFrame): DataFrame =
    arriving.join(
        store.select(col("h")).distinct().withColumn("__inref", lit(1L)),
        Seq("h"), "left")
      .select(col("doc"), col("h"), col("__inref").isNull.as("novel"))
}
