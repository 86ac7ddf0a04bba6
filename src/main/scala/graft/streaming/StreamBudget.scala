package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One candidate document arriving on the ingest stream: `key` is the
  * budgeted stratum (domain/source), `(t, tie)` its arrival order
  * within the key, `n` its token count. */
final case class BudgetEvent(key: Long, t: Long, tie: Long, doc: Long, n: Long)

/** The admission decision; `spentAfter` is the stratum's consumed
  * budget after this event (unchanged when rejected). */
final case class BudgetOut(key: Long, t: Long, tie: Long, doc: Long,
    n: Long, admitted: Boolean, spentAfter: Long)

/** O(1)-per-key state: tokens admitted so far. */
final case class BudgetState(spent: Long)

/** Streaming token-budget admission — the ingest-time sibling of the
  * batch token-budget selection (q142). The batch operator chooses the
  * BEST documents under a corpus-wide budget (it can sort by quality
  * because it sees everything); an ingest pipeline cannot, so the
  * streaming contract is greedy arrival-order admission per stratum:
  * admit a document iff the stratum's remaining budget covers its
  * token count, otherwise reject WITHOUT consuming budget — a later,
  * smaller document may still fit (greedy utilization, not a
  * prefix cutoff).
  *
  * State is one long per stratum — independent of stream length, the
  * same bounded-state discipline as every streaming op here. Within a
  * micro-batch events fold in (t, tie) order so a replayed stream
  * reproduces the identical admission sequence; across batches the
  * fold continues from state (StreamBudgetSpec pins both against a
  * reference fold).
  *
  * At 100 TB-scale ingest this is the backpressure-free form of
  * "stop crawling domain X once we have enough of it": the decision
  * is a broadcast-free stateful map keyed by the stratum, so it scales
  * with #strata, not corpus size. */
object StreamBudget {

  def admit(events: Dataset[BudgetEvent], budget: Long): Dataset[BudgetOut] = {
    require(budget >= 0, s"budget >= 0, got $budget")
    implicit val outEnc = Encoders.product[BudgetOut]
    implicit val stEnc = Encoders.product[BudgetState]
    implicit val keyEnc = Encoders.scalaLong

    def fn(key: Long, evs: Iterator[BudgetEvent],
        state: GroupState[BudgetState]): Iterator[BudgetOut] = {
      var spent = state.getOption.map(_.spent).getOrElse(0L)
      val out = evs.toSeq.sortBy(e => (e.t, e.tie)).map { e =>
        val ok = spent + e.n <= budget
        if (ok) spent += e.n
        BudgetOut(key, e.t, e.tie, e.doc, e.n, ok, spent)
      }
      state.update(BudgetState(spent))
      out.iterator
    }

    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[BudgetState, BudgetOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
