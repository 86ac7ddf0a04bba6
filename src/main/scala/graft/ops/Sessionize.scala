package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch): a new session starts after a gap
  * greater than `gapSeconds`; the session id is the running count of
  * session starts per user — the lag + cumulative-flag formulation over
  * a deterministic total order (ts, id).
  *
  * This is the batch twin of
  * [[graft.streaming.StreamSessionize]] — the two produce identical
  * session rows for in-order input (StreamSessionizeSpec asserts the
  * parity), so a pipeline can switch between a backfill and a live
  * stream without changing downstream consumers.
  *
  * Scale: one shuffle on user_id (the window partition); the groupBy
  * reuses the same partitioning, so sessionizing 100 TB of events is a
  * single repartition + per-partition sort.
  */
object Sessionize {

  /** Per-event session assignment: the input rows plus a `session_id`
    * column (running count of gap-opened sessions per user). The
    * shared first stage of [[sessions]] and of any analysis that needs
    * the events themselves (q179 mines paths from them). */
  def withSessionIds(df: DataFrame, user: Column, ts: Column, id: Column,
      gapSeconds: Long): DataFrame = {
    val wOrd = Window.partitionBy(user).orderBy(ts, id)
    df.withColumn("__prev_us", lag(TimeEnc.usOf(ts), 1).over(wOrd))
      .withColumn("__new",
        when(col("__prev_us").isNull ||
          TimeEnc.usOf(ts) - col("__prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_us", "__new")
  }

  /** Input columns: `user` id, `ts` event timestamp, `id` unique
    * tie-break, `value` payload to sum. Output: one row per (user_id,
    * session_id) with n_events, t0/t1 timestamps and the decimal-exact
    * session_value. */
  def sessions(df: DataFrame, user: Column, ts: Column, id: Column,
      value: Column, gapSeconds: Long): DataFrame =
    withSessionIds(df, user, ts, id, gapSeconds)
      .groupBy(user.as("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(ts).as("t0"), max(ts).as("t1"),
        Exact.dsum(value).as("session_value"))
}
