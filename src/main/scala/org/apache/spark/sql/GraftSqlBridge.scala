package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor — the standard
  * escape hatch extension libraries use to turn a custom LogicalPlan
  * into a DataFrame (graft.plans.AsOf builds its plan programmatically;
  * there is no public API for that yet).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Digit bound for checkpoint size estimates: far above every
    * broadcast/skew threshold (≈4.6 EB), far below compounding
    * BigInteger territory. */
  private val MaxCheckpointSizeEstimate = BigInt(Long.MaxValue >> 1)

  /** Clamp a checkpointed frame's origin-statistics size estimate —
    * the iterative-loop guard behind `Iterate.cut`.
    *
    * `Dataset.localCheckpoint` copies the source plan's estimated
    * `Statistics` onto the `LogicalRDD` it returns, and Catalyst's
    * size-only estimator MULTIPLIES child `sizeInBytes` through every
    * join (`SizeInBytesOnlyStatsPlanVisitor.visitJoin`). In a loop
    * where round k's plan joins round k−1's checkpoint several times,
    * the estimate's DIGIT COUNT therefore doubles per round, and by
    * round ~12 the driver spends its whole sweep budget doing
    * Toom-Cook BigInteger multiplication inside stats estimation
    * (r13 probe: sweeps over a constant 1,585-node frame went 2.5 s
    * → 7 s → 27 s → 115 s; jstack showed 100% of main in
    * `BigInteger.multiplyToomCook3` under `visitJoin`). Clamping the
    * estimate at an over-every-threshold bound stops the compounding
    * (bounded digits at every leaf ⇒ bounded digits in every product)
    * while leaving SANE estimates — and therefore every auto
    * -broadcast decision on genuinely small frames — bit-identical.
    * Same RDD, same attributes: the release discipline still sees the
    * checkpointed blocks. ONLY sizeInBytes changes on the clamped path
    * (r13 advice): rowCount / attributeStats / isRuntime carry over
    * from the origin Statistics, and the origin CONSTRAINT set rides
    * through via the rebuilt node's originConstraints (LogicalRDD's
    * `constraints` override reads it; `lr.constraints` is exactly the
    * effective origin set, already filtered to the node's output, so
    * re-wrapping it is idempotent) — a clamped checkpoint keeps every
    * notNull/isNotNull fact an unclamped one would propagate. */
  def clampCheckpointStats(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if lr.computeStats().sizeInBytes > MaxCheckpointSizeEstimate =>
        rebuildWithSize(df, lr, MaxCheckpointSizeEstimate)
      case _ => df
    }

  /** Replace an EAGERLY-materialized checkpoint's size estimate with
    * its MEASURED storage footprint (r17 optimization round, guide
    * §3.1: "size estimates are often badly wrong — pick the join
    * strategy deliberately"). A localCheckpoint inherits the origin
    * plan's ESTIMATED Statistics; inside iterative loops those blow
    * through every broadcast threshold (join-product compounding, see
    * [[clampCheckpointStats]]), so a genuinely node-sized rank/label
    * vector could never auto-broadcast and every round paid a
    * two-sided shuffle join. The blocks are already persisted when
    * this runs, so the block manager's memSize+diskSize for the RDD is
    * the TRUE size — stamping it makes Spark's own
    * `autoBroadcastJoinThreshold` decide honestly and
    * scale-adaptively: the sf0.1 rank vector (a few MB) broadcasts,
    * a corpus-sized vector at 100 TB exceeds the threshold and keeps
    * the shuffle join. Values never change — only the physical join
    * strategy. Falls back to the clamp when the storage info is not
    * readable (non-eager checkpoint, blocks evicted). */
  def measureCheckpointStats(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val measured = df.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => i.memSize + i.diskSize).filter(_ > 0L)
        measured match {
          case scala.Some(b) => rebuildWithSize(df, lr, BigInt(b))
          case scala.None    => clampCheckpointStats(df)
        }
      case _ => df
    }

  private def rebuildWithSize(df: DataFrame,
      lr: org.apache.spark.sql.execution.LogicalRDD,
      size: BigInt): DataFrame = {
    val st = lr.computeStats()
    ofRows(df.sparkSession,
      new org.apache.spark.sql.execution.LogicalRDD(
        lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
        lr.isStreaming, lr.stream)(
        df.sparkSession.asInstanceOf[classic.SparkSession],
        scala.Some(org.apache.spark.sql.catalyst.plans.logical
          .Statistics(sizeInBytes = size,
            rowCount = st.rowCount,
            attributeStats = st.attributeStats,
            isRuntime = st.isRuntime)),
        scala.Some(lr.constraints)))
  }

  /** Column ⇄ Expression bridges (classic.ExpressionUtils is the
    * blessed conversion since Columns became ColumnNode wrappers) —
    * lets library code build Columns over custom expressions without
    * a session-level function registration. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
