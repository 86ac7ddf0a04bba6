package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Capacity-bounded counter table for one hash bucket. */
final case class HHState(counters: Map[String, Long])

/** One refreshed counter after a micro-batch. */
final case class HeavyHit(bucket: Int, word: String, n: Long)

/** Streaming heavy hitters: the Space-Saving sketch (Metwally et al.
  * '05) sharded over hash buckets — the incremental twin of the batch
  * vocabulary top-k (q72) for monitoring token/term frequencies on a
  * document stream.
  *
  * Each bucket holds at most `capacity` (word, count) counters in
  * `mapGroupsWithState` state: a seen word increments its counter, an
  * unseen word either occupies a free slot or evicts the minimum
  * counter and inherits its count + 1 (the Space-Saving rule, so every
  * count is an overestimate by at most the evicted minimum and the
  * counter SUM equals the exact stream length). Sharding by the
  * cross-engine word hash keeps state per group bounded and the
  * shuffle keyed — no global single-group bottleneck; a final top-k
  * over the emitted snapshot (tiny: buckets × capacity rows) is
  * batch-side.
  *
  * Whenever a bucket's distinct words fit `capacity`, no eviction ever
  * fires and the counts are EXACT — equal to the batch groupBy count
  * of the same prefix (StreamHeavyHittersSpec pins it). Within a
  * micro-batch, words fold in sorted order so replays are
  * deterministic; cross-batch order is the stream's own.
  */
object StreamHeavyHitters {

  /** (bucket, word) stream → refreshed (bucket, word, n) snapshot per
    * micro-batch (Update output mode). */
  def heavyHitters(words: Dataset[(Int, String)],
      capacity: Int): Dataset[HeavyHit] = {
    implicit val stEnc = Encoders.product[HHState]
    implicit val outEnc = Encoders.product[HeavyHit]

    def fn(bucket: Int, rows: Iterator[(Int, String)],
        state: org.apache.spark.sql.streaming.GroupState[HHState]): Iterator[HeavyHit] = {
      var m = state.getOption.map(_.counters).getOrElse(Map.empty[String, Long])
      rows.map(_._2).toSeq.sorted.foreach { w =>
        m.get(w) match {
          case Some(n) => m = m.updated(w, n + 1)
          case None if m.size < capacity => m = m.updated(w, 1L)
          case None =>
            // evict the minimum counter (deterministic tie on word)
            val (mw, mn) = m.minBy { case (k, v) => (v, k) }
            m = (m - mw).updated(w, mn + 1)
        }
      }
      state.update(HHState(m))
      m.toSeq.sortBy { case (w, n) => (-n, w) }
        .map { case (w, n) => HeavyHit(bucket, w, n) }.iterator
    }

    words.groupByKey(_._1)(Encoders.scalaInt)
      .flatMapGroupsWithState[HHState, HeavyHit](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(fn)
  }

  /** Column-level helper: (bucket, word) pairs from any word column,
    * bucketed by the cross-engine hash so batch and stream shard
    * identically. */
  def pairs(df: DataFrame, word: Column, buckets: Int): Dataset[(Int, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    df.select(pmod(graft.ops.TextOps.h64(word), lit(buckets.toLong))
        .cast("int"), word.cast("string"))
      .as[(Int, String)]
  }
}
