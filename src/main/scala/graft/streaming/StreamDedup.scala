package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming first-occurrence dedup: the incremental twin of the batch
  * exact dedup (graft.ops.TextOps.exactDupGroups). Each document's
  * normalized content hash is checked against watermark-bounded state;
  * only the first occurrence flows downstream.
  *
  * `dropDuplicatesWithinWatermark` keeps one state row per distinct hash
  * and evicts it once the watermark passes, so state is bounded by the
  * number of distinct documents inside the watermark horizon — the only
  * formulation that survives an unbounded stream (plain dropDuplicates
  * state grows forever).
  */
object StreamDedup {

  /** Normalized content hash — identical to the batch exact-dedup key. */
  def contentHash(text: Column): Column =
    md5(lower(trim(text)).cast("binary"))

  /** `df` must carry an event-time column `tsCol`; duplicates of a hash
    * arriving within `watermark` of the first occurrence are dropped. */
  def firstOccurrence(df: DataFrame, tsCol: String, text: Column,
      watermark: String): DataFrame =
    df.withColumn("content_hash", contentHash(text))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
