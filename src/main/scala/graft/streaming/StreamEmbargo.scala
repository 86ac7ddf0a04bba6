package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast
import graft.ops.Sampling

/** Streaming purged/embargo gate — q214's temporal split as a standing
  * query: arriving events are flagged train / purged / test against a
  * FROZEN cutoff (the nearest-rank quantile the batch split computed,
  * carried as a 1-row broadcast). Completely STATELESS — the flag is
  * [[Sampling.embargoPart]], the same Column the batch query evaluates,
  * so batch parity holds by construction; append-mode safe, no
  * watermark, no aggregation. The production shape: once an eval
  * cutoff is frozen, every newly-ingested event routes itself to the
  * correct side at arrival time — rows landing inside the embargo band
  * are quarantined BEFORE any training shard sees them, instead of by
  * a retroactive sweep. (Re-deriving the cutoff from the stream would
  * be a different operator — a quantile over an unbounded history;
  * freezing it is the point of an embargo.) */
object StreamEmbargo {

  /** Event stream with a `ts` column → same rows + `part` against the
    * frozen 1-row `cutoff(cutoff)` frame. */
  def gate(stream: DataFrame, cutoff: DataFrame, gapDays: Int): DataFrame = {
    val flagged = stream.crossJoin(broadcast(cutoff))
    flagged.withColumn("part",
        Sampling.embargoPart(flagged("ts"), flagged("cutoff"), gapDays))
      .drop("cutoff")
  }
}
