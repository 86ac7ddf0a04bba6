package graft.streaming

import graft.ops.Sketch
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Per-key bottom-k state for the streaming KMV sketch: ascending,
  * length <= k. */
final case class KmvState(bottom: Seq[Long])

/** Streaming distinct-count per key: the incremental twin of the batch
  * KMV sketch (graft.ops.Sketch.kmvDistinct).
  *
  * State per key is the bottom-k hash set — bounded at k longs no
  * matter how many values stream past, and merged by "concat, sort,
  * take k" (the KMV merge law), so the estimate after any prefix of
  * the stream equals the batch sketch of that prefix exactly
  * (StreamKmvSpec asserts it — same hash column, same estimator
  * arithmetic via Sketch.estimateFromBottomK).
  *
  * `mapGroupsWithState` emits each key's refreshed estimate per
  * micro-batch (Update output mode). The same code path runs on a
  * static Dataset (state starts empty per group), so batch and stream
  * share one logical operator.
  */
object StreamKmv {

  /** (key, hashed value) → per-key estimate stream. `hashed` must be
    * the cross-engine TextOps.h64 of the value column, computed before
    * groupByKey so batch and stream hash identically. */
  def distinctPerKey(pairs: Dataset[(String, Long)], k: Int): Dataset[(String, Double)] = {
    implicit val stEnc = Encoders.product[KmvState]
    implicit val outEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaDouble)

    def fn(key: String, rows: Iterator[(String, Long)],
        state: GroupState[KmvState]): (String, Double) = {
      val prev = state.getOption.map(_.bottom).getOrElse(Seq.empty)
      val merged = (prev ++ rows.map(_._2)).distinct.sorted.take(k)
      state.update(KmvState(merged))
      (key, Sketch.estimateFromBottomK(merged.size, merged.lastOption.getOrElse(0L), k))
    }

    pairs.groupByKey(_._1)(Encoders.STRING)
      .mapGroupsWithState[KmvState, (String, Double)](
        GroupStateTimeout.NoTimeout())(fn)
  }

  /** Column-level helper: build the (key, h64(value)) pair Dataset from
    * any DataFrame. */
  def pairs(df: DataFrame, key: Column, value: Column): Dataset[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string"), graft.ops.TextOps.h64(value)).as[(String, Long)]
  }
}
