package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native as-of join: the full custom-operator ladder (LogicalPlan →
  * SparkStrategy → SparkPlan, registered via SparkSessionExtensions —
  * guide §"Custom operator"). Semantically identical to the
  * `ops.AsOfJoin.asofBackward` composition, but physically better: the
  * composition unions both payloads into one widened stream and runs a
  * running-last window over it; this operator sort-merges the two
  * sides per partition — each side shuffles once on its own key,
  * carries only its own columns, and the merge scan is O(n+m) with
  * O(1) state (the last right row).
  *
  * Left rows always survive (left-outer as-of); unmatched rows carry
  * NULL right columns. Keys and times must be orderable of matching
  * types on both sides (enforced at construction in ops.AsOfJoin).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        tolerance: Option[Long] = None)
    extends BinaryNode {
  // the merge scan reads keys/times with getLong — a non-Long column
  // would silently read garbage, so reject it at construction
  for ((e, role) <- Seq(leftKey -> "leftKey", rightKey -> "rightKey",
                        leftTime -> "leftTime", rightTime -> "rightTime")
       if e.resolved)
    require(e.dataType == org.apache.spark.sql.types.LongType,
      s"AsOfJoinPlan $role must be LongType (convert timestamps with " +
        s"unix_micros first), got ${e.dataType.simpleString}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        tolerance: Option[Long])
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // both sides clustered on their key → co-partitioned by
  // EnsureRequirements (same contract SortMergeJoinExec uses)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // sorted within partitions by (key, time) → a single merge scan
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = leftKey
    val rKey = rightKey
    val lTime = leftTime
    val rTime = rightTime
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKey), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKey), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      // right attrs must be re-declared nullable here: the projection
      // otherwise skips null checks and reads 0/garbage for unmatched rows
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      val tol = tolerance.getOrElse(Long.MaxValue)
      var heldKey: Long = 0L
      var heldTime: Long = 0L
      var held: InternalRow = null // last right row with key == heldKey, time <= current left time

      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKeyProj(l).getLong(0)
          val t = lTimeProj(l).getLong(0)
          if (held != null && heldKey != k) held = null
          // advance the right side through all rows with
          // (rkey < k) or (rkey == k && rtime <= t); remember the last
          // row of the current key — it is the as-of match
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r).getLong(0)
            if (rk < k) { rBuf.next(); advancing = true }
            else if (rk == k && rTimeProj(r).getLong(0) <= t) {
              heldTime = rTimeProj(r).getLong(0)
              held = rBuf.next().copy(); heldKey = k
            } else advancing = false
          }
          val matched = held != null && t - heldTime <= tol
          outProj(joined(l, if (matched) held else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec (injected via
  * GraftExtensions.injectPlannerStrategy). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}
