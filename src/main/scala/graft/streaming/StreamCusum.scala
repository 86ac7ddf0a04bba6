package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One sample of a keyed monitored series; `mu`/`sigma` are the frozen
  * reference parameters (constant per key). */
final case class CusumEvent(key: String, t: Long, tie: Long, v: Double,
    mu: Double, sigma: Double)

/** The scored sample; None statistics mark a late row (see below). */
final case class CusumOut(key: String, t: Long, tie: Long, v: Double,
    sHi: Option[Double], sLo: Option[Double], alarm: Option[Boolean])

/** Fold frontier: last folded (t, tie) and both statistics — O(1). */
final case class CusumState(t: Long, tie: Long, sHi: Double, sLo: Double)

/** Streaming CUSUM — the incremental twin of the batch
  * [[graft.ops.Cusum]] fold, and the detector's natural habitat: the
  * whole point of a sequential alarm is raising it WHILE the stream
  * runs, not in the nightly batch. State per key is the fold frontier
  * (two statistics + position); in-order delivery is bit-identical to
  * the batch operator (same standardized IEEE chain in (t, tie)
  * order — StreamCusumSpec pins it across micro-batch splits). Late
  * rows degrade explicitly (None, state untouched) — the
  * [[StreamEwma]] "degrade, never lie" contract. */
object StreamCusum {

  def detect(events: Dataset[CusumEvent], k: Double, h: Double): Dataset[CusumOut] = {
    implicit val outEnc = Encoders.product[CusumOut]
    implicit val stEnc = Encoders.product[CusumState]
    implicit val keyEnc = Encoders.STRING

    def fn(key: String, evs: Iterator[CusumEvent],
        state: GroupState[CusumState]): Iterator[CusumOut] = {
      val sorted = evs.toSeq.sortBy(e => (e.t, e.tie))
      val out = Seq.newBuilder[CusumOut]
      var st = state.getOption
      sorted.foreach { e =>
        val late = st.exists(f =>
          e.t < f.t || (e.t == f.t && e.tie <= f.tie))
        if (late) out += CusumOut(key, e.t, e.tie, e.v, None, None, None)
        else {
          val z = (e.v - e.mu) / e.sigma
          val prevHi = st.fold(0.0)(_.sHi)
          val prevLo = st.fold(0.0)(_.sLo)
          val sHi = math.max(0.0, prevHi + (z - k))
          val sLo = math.max(0.0, prevLo + (-z - k))
          st = Some(CusumState(e.t, e.tie, sHi, sLo))
          out += CusumOut(key, e.t, e.tie, e.v, Some(sHi), Some(sLo),
            Some(sHi > h || sLo > h))
        }
      }
      st.foreach(state.update)
      out.result().iterator
    }

    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
