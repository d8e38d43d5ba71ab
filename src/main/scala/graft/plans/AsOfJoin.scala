package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF join: for every left row, attach the single right row with
  * the greatest right timestamp ≤ the left timestamp within the same
  * key (left outer semantics — unmatched left rows keep nulls).
  *
  * This is the canonical CDC enrichment operator (join each change
  * event to the dimension version that was current when the event
  * happened). Spark has no built-in as-of join; expressing it as a
  * range join + window explodes (every left row matches its whole
  * right history before the window prunes), so this is the textbook
  * case for a custom operator: logical node + planner strategy +
  * sort-merge physical exec, registered through
  * SparkSessionExtensions (graft.GraftExtensions).
  *
  * Scale design: both sides hash-partition on the key and sort by
  * (key, ts) — exactly a sort-merge join's requirements, declared via
  * requiredChildDistribution/Ordering so EnsureRequirements plans the
  * shuffles (and AQE can still size them). The merge is one forward
  * pass per partition holding ONE buffered right row — O(n) time,
  * O(1) state, no range explosion.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable plan fragments; all generated code
    // (projections, orderings) is instantiated inside each task
    val lKeys = leftKeys
    val rKeys = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val nRight = rOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(lKeys, lOut)
      val rKeyGen = UnsafeProjection.create(rKeys, rOut)
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      // bind against nullability-adjusted right attrs, else the
      // projection elides null checks and reads garbage for
      // unmatched rows
      val out = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        private var rHead: InternalRow = advanceRight()
        private var rHeadKey: InternalRow = if (rHead == null) null else rKeyGen(rHead).copy()
        private var lastMatch: InternalRow = null
        private var lastMatchKey: InternalRow = null

        private def advanceRight(): InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyGen(l)
          // SQL as-of semantics for NULL timestamps: `r.ts <= l.ts`
          // is never true when either side is NULL, so a null-ts
          // event matches nothing and a null-ts version is never a
          // match — getLong on a null slot would read 0 and attach
          // epoch-0 versions instead
          val lTsRow = lTsProj(l)
          val lTsNull = lTsRow.isNullAt(0)
          val lTs = if (lTsNull) 0L else lTsRow.getLong(0)
          // consume right rows that are usable for this (or an
          // earlier) left position; remember the latest per key.
          // Null-ts right rows (sorted first in their key group) are
          // consumed and DISCARDED; same-key right rows are left for
          // later left rows when this left row's ts is null.
          var consuming = true
          while (consuming && rHead != null) {
            val c = keyOrdering.compare(rHeadKey, lKey)
            val rTsRow = rTsProj(rHead)
            val rTsNull = rTsRow.isNullAt(0)
            consuming = c < 0 || (c == 0 && (rTsNull ||
              (!lTsNull && rTsRow.getLong(0) <= lTs)))
            if (consuming) {
              if (c == 0 && !rTsNull) {
                lastMatch = rHead
                lastMatchKey = rHeadKey
              }
              rHead = advanceRight()
              rHeadKey = if (rHead == null) null else rKeyGen(rHead).copy()
            }
          }
          val matched = !lTsNull && lastMatch != null && lastMatchKey != null &&
            keyOrdering.compare(lastMatchKey, lKey) == 0
          out(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
