package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** The whole-operator tier of the extension ladder (SURVEY.md §2.2:
  * compose built-ins → custom Expression → custom LogicalPlan +
  * Strategy + SparkPlan): a dedicated as-of join operator.
  *
  * [[graft.operators.AsOfJoin.asof]] composes the same semantics from
  * union + window — one shuffle of left+right TOGETHER, one sort, then
  * a running `last` — which is the right default. This node exists for
  * the case a dedicated operator genuinely wins: each side shuffles
  * INDEPENDENTLY (a pre-bucketed/sorted right side re-shuffles
  * nothing), and the per-partition merge is a single forward pass
  * holding ONE buffered right row — no window state, no tag columns,
  * no union row-width blowup.
  *
  * Physical contract: both children hash-clustered on their key and
  * sorted by (key, ts) — EnsureRequirements inserts the exchanges and
  * sorts, exactly as it would for a sort-merge join. The merge then
  * streams both sides once: for every left row, the match is the
  * latest right row with `rts <= lts` of the same key.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        payload: Seq[Expression]) extends BinaryNode {

  override lazy val resolved: Boolean = childrenResolved &&
    (Seq(leftKey, rightKey, leftTs, rightTs) ++ payload).forall(e =>
      e.resolved && e.isInstanceOf[Attribute])

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.asInstanceOf[Attribute].withNullability(true))

  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinNode =
    copy(left = l, right = r)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]. Injected via
  * [[graft.functions.expressions.GraftExtensions]] or
  * `spark.experimental.extraStrategies`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk: Attribute, rk: Attribute, lt: Attribute, rt: Attribute, ps) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
        ps.map(_.asInstanceOf[Attribute])) :: Nil
    case _ => Nil
  }
}

/** Partition-local sorted merge as-of join (the distributed
  * `merge_asof`): both inputs arrive clustered by key and sorted by
  * (key, ts); one forward pass buffers only the latest matching right
  * payload per key. Key must be LongType; ts LongType or TimestampType
  * (micros — compared as long). */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        payload: Seq[Attribute]) extends BinaryExecNode {

  private def checkTypes(): Unit = {
    require(leftKey.dataType == LongType && rightKey.dataType == LongType,
      s"as-of exec requires LongType keys, got ${leftKey.dataType}/${rightKey.dataType}")
    Seq(leftTs, rightTs).foreach(t =>
      require(t.dataType == LongType || t.dataType == TimestampType,
        s"as-of exec requires Long/Timestamp event time, got ${t.dataType}"))
  }

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    checkTypes()
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lKeyIdx >= 0 && lTsIdx >= 0 && rKeyIdx >= 0 && rTsIdx >= 0,
      "as-of exec: key/ts attributes must come from the respective child")
    val payloadLocal = payload
    val rightOutput = right.output
    val leftOutput = left.output
    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadLocal, rightOutput)
      // bind the result against NULLABLE payload attrs — the no-match
      // row is all-null, and binding against the right side's original
      // nullability would elide the null checks and read garbage
      val resultProj = UnsafeProjection.create(outputAttrs,
        leftOutput ++ payloadLocal.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(payloadLocal.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      var matchKey = 0L
      var hasMatch = false
      var matchRow: InternalRow = null
      lIter.map { l =>
        val lk = l.getLong(lKeyIdx)
        val lt = l.getLong(lTsIdx)
        // advance the right side to the last row with (rk, rts) <= (lk, lt)
        var advance = true
        while (advance && rBuf.hasNext) {
          val r = rBuf.head
          val rk = r.getLong(rKeyIdx)
          val rts = r.getLong(rTsIdx)
          if (rk < lk || (rk == lk && rts <= lt)) {
            rBuf.next()
            if (rk == lk) {
              matchKey = rk; hasMatch = true
              matchRow = payloadProj(r).copy() // unsafe rows are reused buffers
            }
          } else advance = false
        }
        val p = if (hasMatch && matchKey == lk) matchRow else nullPayload
        resultProj(joined(l, p))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}
