package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF JOIN — the whole-operator Catalyst extension tier
  * (custom `LogicalPlan` + `SparkStrategy` + physical `SparkPlan`):
  * for every left row, attach the single right row with the same key
  * and the greatest time <= the left row's time.
  *
  * Spark has no built-in as-of join; the composable workaround (union
  * both sides + a last(ignoreNulls) window, `graft.operators.Events
  * .asofJoin`) pays a UNION of both inputs plus a window sort over
  * the combined stream. This operator instead declares exactly what
  * the join needs from the engine — hash-cluster each side on its
  * key, sort each side by (key, time) within partitions — and merges
  * the two sorted streams per partition in one pass, the same
  * execution shape as Spark's own SortMergeJoin. EnsureRequirements
  * satisfies the declared distribution/ordering, so the plan is two
  * exchanges + two sorts + a streaming merge, with NO union and NO
  * window, and AQE remains free to coalesce the co-partitioned
  * shuffles.
  *
  * Semantics (inner as-of): left rows with a null key or time, and
  * right rows likewise, never match; ties on right time resolve to
  * the row latest in the (key, time) sort — matching DuckDB's
  * `ASOF JOIN ... ON l.key = r.key AND l.t >= r.t`, which the
  * registry query `ev_asof_join_native` hash-checks end-to-end.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; inject via
  * `spark.experimental.extraStrategies` or `GraftExtensions`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // hash-cluster each side on its key; EnsureRequirements makes the
  // two shuffles co-partitioned (same shape as SortMergeJoin)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // within each partition both sides arrive sorted by (key, time)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  // the merge preserves the left side's order and partitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the last right row read but not yet consumed by the merge;
        // right rows are copied when buffered (child iterators reuse
        // their row buffers)
        private var pendingRight: UnsafeRow = _
        // best (latest-time) right row for the current key, copied
        private var bestMatch: UnsafeRow = _
        private var bestMatchKey: UnsafeRow = _
        private var ready = false

        // Lazy lookahead: position `joined` at the next emitted row.
        // The returned row is valid until the FOLLOWING hasNext() —
        // the contract every Spark operator iterator already has
        // (buffering consumers like sort/exchange copy rows).
        private def advance(): Boolean = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTime = lTimeProj(l)
            if (!lKey.isNullAt(0) && !lTime.isNullAt(0)) {
              // consume right rows that either match now or can never
              // match any future left row (key strictly behind)
              var scan = true
              while (scan && (pendingRight != null || rIter.hasNext)) {
                val r: InternalRow =
                  if (pendingRight != null) pendingRight else rIter.next()
                val rKey = rKeyProj(r)
                val cmp = keyOrd.compare(rKey, lKey)
                if (cmp < 0) {
                  pendingRight = null // behind every remaining left key
                } else if (cmp == 0) {
                  val rTime = rTimeProj(r)
                  if (!rTime.isNullAt(0) && timeOrd.compare(rTime, lTime) <= 0) {
                    bestMatch = r.asInstanceOf[UnsafeRow].copy()
                    bestMatchKey = rKey.copy()
                    pendingRight = null
                  } else if (rTime.isNullAt(0)) {
                    pendingRight = null // null right time never matches
                  } else {
                    // too new for this left row; keep for later lefts
                    if (pendingRight == null)
                      pendingRight = r.asInstanceOf[UnsafeRow].copy()
                    scan = false
                  }
                } else {
                  if (pendingRight == null) // right key ahead; keep
                    pendingRight = r.asInstanceOf[UnsafeRow].copy()
                  scan = false
                }
              }
              if (bestMatchKey != null && keyOrd.compare(bestMatchKey, lKey) == 0) {
                joined(l, bestMatch)
                return true
              }
            }
          }
          false
        }

        override def hasNext: Boolean = {
          if (!ready) ready = advance()
          ready
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          ready = false
          joined
        }
      }
    }
  }
}

/** User-facing API: `AsOfJoinShim.asof(purchases, signups, ...)`. */
object AsOfJoinShim {

  /** Idempotently make the planner aware of [[AsOfJoinPlan]] on an
    * already-built session (builder-time injection goes through
    * `graft.GraftExtensions`).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** Inner as-of join: each left row gains the right row sharing
    * `rightKey == leftKey` with the greatest `rightTime <= leftTime`.
    * Column names must be disjoint across the two inputs (rename
    * before joining) — the operator concatenates the schemas.
    */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
    val spark = leftDf.sparkSession
    ensureRegistered(spark)
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    val plan = AsOfJoinPlan(lp, rp,
      ColumnShim.expression(leftKey), ColumnShim.expression(rightKey),
      ColumnShim.expression(leftTime), ColumnShim.expression(rightTime))
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  }
}
