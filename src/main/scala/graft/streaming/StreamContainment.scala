package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming incremental containment check — the streaming sibling of
  * q143 ([[graft.ops.TextOps.blockedContainment]]): arriving documents
  * are checked for subset-duplication against the FROZEN corpus token
  * store via a stream-static join, the same contract as
  * [[StreamIncDedup]]. No state store, no watermark, no aggregation:
  * each joined (new, old) pair carries both distinct-token arrays, so
  * the intersection is a per-row `array_intersect` — the whole check is
  * a stateless map over the join, and an arriving doc is vetted within
  * its own micro-batch.
  *
  * Scope: new-vs-corpus only (new-vs-new pairs inside one delivery are
  * the batch job's half, exactly as StreamIncDedup). At 100 TB the
  * store is a static parquet table partitioned by the block key; the
  * nightly batch refresh folds the day's arrivals in. The block key
  * must not band by length — containment pairs docs of very different
  * lengths by construction (see the batch operator's note).
  */
object StreamContainment {

  /** (doc, block, text) → (doc, block, toks, sz) with the sorted
    * distinct-token array — bit-identical to the batch tokenization
    * (trim + whitespace split + distinct). Works on streaming and
    * static frames alike; used for both the corpus store and the
    * arriving side. */
  def prep(docs: DataFrame): DataFrame =
    docs.select(col("doc"), col("block"),
      array_sort(array_distinct(split(trim(col("text")), "\\s+"))).as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))

  /** Stream-static containment join: emits (d1 = arriving doc, d2 =
    * corpus doc, i, containment, subsumed) for pairs at or above
    * `threshold`. Same containment and subsumed rules as the batch
    * operator: C = |A∩B| / min(|A|,|B|), subsumed = the smaller set,
    * ties → the greater doc id (the batch rule stated without the
    * d1 < d2 orientation the batch join imposes). */
  def matches(arriving: DataFrame, store: DataFrame,
      threshold: Double): DataFrame =
    arriving.as("n")
      .join(store.as("o"),
        col("n.block") === col("o.block") && col("n.doc") =!= col("o.doc"))
      .select(col("n.doc").as("d1"), col("o.doc").as("d2"),
        size(array_intersect(col("n.toks"), col("o.toks"))).cast("long").as("i"),
        col("n.sz").as("nsz"), col("o.sz").as("osz"))
      .select(col("d1"), col("d2"), col("i"),
        (col("i").cast("double") / least(col("nsz"), col("osz")))
          .as("containment"),
        when(col("nsz") < col("osz"), col("d1"))
          .when(col("osz") < col("nsz"), col("d2"))
          .otherwise(greatest(col("d1"), col("d2"))).as("subsumed"))
      .filter(col("containment") >= threshold)
}
