package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One sample of a keyed series (the [[graft.ops.Ewma]] input shape:
  * `tie` breaks equal timestamps uniquely within a key). */
final case class EwmaEvent(key: Long, t: Long, tie: Long, v: Double)

/** The smoothed sample; `ema` is None for a late row that cannot be
  * folded without rewriting history (see [[StreamEwma.smooth]]). */
final case class EwmaOut(key: Long, t: Long, tie: Long, v: Double,
    ema: Option[Double])

/** Fold state: the last folded position and smoothed value — O(1) per
  * key, independent of series length, rate or watermark. */
final case class EwmaState(t: Long, tie: Long, s: Double)

/** Streaming EWMA — the incremental twin of the batch [[graft.ops.Ewma]]
  * secondary-sort fold: s_t = α·x_t + (1−α)·s_{t−1}, seeded with the
  * first value, folded per key in (t, tie) order.
  *
  * An EWMA is an order-sensitive recurrence, so state is exactly the
  * fold's frontier: the last (t, tie) folded and its smoothed value —
  * three longs/doubles per key. Within a micro-batch events sort by
  * (t, tie) and fold in order, continuing from the frontier, so a
  * stream delivered in order is BIT-IDENTICAL to the batch operator
  * (the same IEEE chain, same order — StreamEwmaSpec pins it,
  * cross-batch state included).
  *
  * Late data cannot be folded without rewriting every later smoothed
  * value, so it degrades explicitly rather than wrongly: a row at or
  * before the frontier emits `ema = None` and leaves state untouched —
  * the same "degrade, never lie" contract as [[StreamAsOf]]. */
object StreamEwma {

  def smooth(events: Dataset[EwmaEvent], alpha: Double): Dataset[EwmaOut] = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0, 1], got $alpha")
    implicit val outEnc = Encoders.product[EwmaOut]
    implicit val stEnc = Encoders.product[EwmaState]
    implicit val keyEnc = Encoders.scalaLong

    def fn(key: Long, evs: Iterator[EwmaEvent],
        state: GroupState[EwmaState]): Iterator[EwmaOut] = {
      val sorted = evs.toSeq.sortBy(e => (e.t, e.tie))
      val out = Seq.newBuilder[EwmaOut]
      var st = state.getOption
      sorted.foreach { e =>
        val late = st.exists(f =>
          e.t < f.t || (e.t == f.t && e.tie <= f.tie))
        if (late) out += EwmaOut(key, e.t, e.tie, e.v, None)
        else {
          val s = st match {
            case None    => e.v
            case Some(f) => alpha * e.v + (1 - alpha) * f.s
          }
          st = Some(EwmaState(e.t, e.tie, s))
          out += EwmaOut(key, e.t, e.tie, e.v, Some(s))
        }
      }
      st.foreach(state.update)
      out.result().iterator
    }

    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
