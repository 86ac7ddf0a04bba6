package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Backward as-of join as a first-class plan operator — the (c)-tier of
  * the extension ladder (custom LogicalPlan + Strategy + SparkPlan),
  * used where composing built-ins genuinely loses: the windowed
  * formulation (ops/Interp.nearestToGrid, q54) must union both sides
  * and run two `last(ignoreNulls)` window passes; this operator is one
  * co-partitioned sort-merge sweep.
  *
  * Semantics: for every left row, the right row with the same key and
  * the greatest right-time <= left-time; null-extended when none exists
  * (pandas `merge_asof(direction='backward')`, DuckDB `ASOF LEFT JOIN`
  * — q75 verifies against exactly that). The nearest direction mirrors
  * the reference's coordinate re-alignment
  * `reindex_like(var, method='nearest')` (calculations.py:893-901),
  * with equidistant ties to the earlier sample.
  *
  * Scale shape: `requiredChildDistribution` asks Catalyst for hash
  * co-partitioning on the keys and `requiredChildOrdering` for a
  * per-partition (key, time) sort, so EnsureRequirements plans exactly
  * one exchange per side (the same shape as SortMergeJoin) and the
  * merge itself is a streaming single pass per partition — no window
  * buffering, no union, state = one held right row.
  *
  * Precondition: the right side must not carry duplicate (key, time)
  * rows — the required ordering is (key, time) only, so which duplicate
  * the merge consumes last is partition-order dependent (the same
  * unspecified behavior as pandas merge_asof / DuckDB ASOF on ties).
  * Deduplicate the right side first when ties are possible; the
  * streaming twin (streaming/StreamAsOf) instead tie-breaks by id.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    direction: AsOfDirection = AsOfBackward) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Match direction. Backward: greatest right-time <= left-time.
  * Nearest: smallest |right-time − left-time|, equidistant ties to the
  * earlier right row (the reference's reindex_like(method='nearest')
  * tie rule; requires a long-valued time — timestamp or integer). */
sealed trait AsOfDirection
case object AsOfBackward extends AsOfDirection
case object AsOfNearest extends AsOfDirection

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, dir) =>
      AsOfJoinExec(lk, rk, lt, rt, dir, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    direction: AsOfDirection,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // bind against nullable right attrs: the null-extension row must
      // go through isNullAt checks, not a non-nullable fast path
      val resultProj = UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      // long-valued time access, needed only for nearest's distance math
      def timeAsLong(row: InternalRow): Long = timeType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => row.getLong(0)
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DateType => row.getInt(0).toLong
        case t => throw new UnsupportedOperationException(
          s"nearest as-of needs an integer/timestamp time column, got $t")
      }

      // One buffered right row (the next not-yet-consumed one) and the
      // last consumed right row of some key — both copied, because sort
      // iterators reuse their UnsafeRow buffers.
      var rHead: UnsafeRow = null
      var rHeadKey: UnsafeRow = null
      var lastMatch: UnsafeRow = null
      var lastMatchKey: UnsafeRow = null

      // Null keys/times never match (SortMergeJoin's null-key skip;
      // DuckDB ASOF `ts >= r_ts` and pandas merge_asof are both
      // null-rejecting). Right rows carrying them sort nulls-first and
      // would otherwise be consumed as a bogus "most recent" match.
      def pullRight(): Unit = {
        while (rHead == null && rIter.hasNext) {
          val cand = rIter.next().asInstanceOf[UnsafeRow]
          val ck = rKeyProj(cand)
          if (!ck.anyNull && !rTimeProj(cand).isNullAt(0)) {
            rHead = cand.copy()
            rHeadKey = ck.copy()
          }
        }
      }

      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val lt = lTimeProj(lRow)
        if (lk.anyNull || lt.isNullAt(0)) {
          // a null-keyed/timed left row matches nothing; don't advance
          // the right side (nulls sort first, so nothing is skipped)
          resultProj(joined(lRow, nullRight))
        } else {
        var advance = true
        while (advance) {
          if (rHead == null) pullRight()
          if (rHead == null) advance = false
          else {
            val c = keyOrd.compare(rHeadKey, lk)
            if (c < 0 ||
                (c == 0 && timeOrd.compare(rTimeProj(rHead), lt) <= 0)) {
              // consumed: it is the best-so-far candidate for its key
              lastMatch = rHead; lastMatchKey = rHeadKey
              rHead = null; rHeadKey = null
            } else advance = false
          }
        }
        // after advancing: lastMatch = last right row <= left time (some
        // key), rHead = first right row of a >= key or a later time
        val backMatched = lastMatch != null && keyOrd.compare(lastMatchKey, lk) == 0
        val chosen: InternalRow = direction match {
          case AsOfBackward => if (backMatched) lastMatch else nullRight
          case AsOfNearest =>
            val fwdMatched = rHead != null && keyOrd.compare(rHeadKey, lk) == 0
            if (backMatched && fwdMatched) {
              val ltv = timeAsLong(lt)
              val ta = timeAsLong(rTimeProj(lastMatch))
              val tb = timeAsLong(rTimeProj(rHead))
              // equidistant ties take the earlier row (reference rule)
              if (tb - ltv < ltv - ta) rHead else lastMatch
            } else if (backMatched) lastMatch
            else if (fwdMatched) rHead
            else nullRight
        }
        resultProj(joined(lRow, chosen))
        }
      }
    }
  }
}

/** Public entry: `AsOf.backwardJoin(trades, quotes, Seq("sym"), "t", "t")`.
  * Installs [[AsOfStrategy]] on the session's experimental strategies
  * (idempotent); also installable cluster-wide via
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions`. */
object AsOf {
  def backwardJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String): DataFrame =
    join(left, right, leftKeys, rightKeys, leftTime, rightTime, AsOfBackward)

  /** Nearest-in-time variant — the reference's
    * `reindex_like(method='nearest')` (equidistant ties to the earlier
    * sample); needs an integer/timestamp time column. */
  def nearestJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String): DataFrame =
    join(left, right, leftKeys, rightKeys, leftTime, rightTime, AsOfNearest)

  private def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String, dir: AsOfDirection): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      attr(lp, leftTime), attr(rp, rightTime), dir))
  }
}
