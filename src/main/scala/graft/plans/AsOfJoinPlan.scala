package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampType}

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
  * payload per key.
  *
  * Types: keys Long or Int — but the SAME type on both sides, because
  * each side hash-clusters on its own key and murmur3 of an Int and
  * the equal Long are different hashes (a mixed-type pair would break
  * co-partitioning, not just comparison). Event time is Long /
  * Timestamp (micros) / Int / Date (days) — Date must pair with Date
  * (days vs micros are different units).
  *
  * NULL semantics match Spark joins and the composed union+window
  * form: a left row with a NULL key or NULL event time gets the null
  * payload (never matches); right rows with NULL key or event time
  * are consumed and skipped (never match anything). Both sides sort
  * nulls-first ascending, so the skipped rows sit at the front of a
  * partition / key group and the merge stays a single forward pass. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        payload: Seq[Attribute]) extends BinaryExecNode {

  private def checkTypes(): Unit = {
    require(Seq(LongType, IntegerType).contains(leftKey.dataType) &&
      rightKey.dataType == leftKey.dataType,
      s"as-of exec requires Long or Int keys of the SAME type on both sides " +
        s"(hash co-partitioning is type-sensitive), got " +
        s"${leftKey.dataType}/${rightKey.dataType}")
    Seq(leftTs, rightTs).foreach(t =>
      require(Seq(LongType, TimestampType, IntegerType, DateType).contains(t.dataType),
        s"as-of exec requires Long/Timestamp/Int/Date event time, got ${t.dataType}"))
    require((leftTs.dataType == DateType) == (rightTs.dataType == DateType),
      s"as-of exec: Date event time must pair with Date (days vs micros are " +
        s"different units), got ${leftTs.dataType}/${rightTs.dataType}")
  }

  /** Width-agnostic long extraction (Int/Date are 4-byte ints in
    * InternalRow; Long/Timestamp are 8-byte longs). */
  private def longGetter(dt: DataType): (InternalRow, Int) => Long = dt match {
    case LongType | TimestampType => (r, i) => r.getLong(i)
    case IntegerType | DateType => (r, i) => r.getInt(i).toLong
    case other => throw new IllegalStateException(s"unsupported as-of type $other")
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
    val getLKey = longGetter(leftKey.dataType)
    val getLTs = longGetter(leftTs.dataType)
    val getRKey = longGetter(rightKey.dataType)
    val getRTs = longGetter(rightTs.dataType)
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
        // NULL key/time left rows never match (nulls sort first, so they
        // precede every real key/time and skipping them keeps the merge
        // monotone). Reading them via getLong instead would silently
        // alias key 0 / the epoch — a latent wrong answer on any
        // null-bearing input.
        if (l.isNullAt(lKeyIdx) || l.isNullAt(lTsIdx)) {
          resultProj(joined(l, nullPayload))
        } else {
          val lk = getLKey(l, lKeyIdx)
          val lt = getLTs(l, lTsIdx)
          // advance the right side to the last row with (rk, rts) <= (lk, lt)
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            if (r.isNullAt(rKeyIdx)) {
              rBuf.next() // null keys never match; sorted before all keys
            } else {
              val rk = getRKey(r, rKeyIdx)
              if (rk < lk) {
                rBuf.next() // smaller key (incl. its null-ts rows): consume
              } else if (rk == lk) {
                if (r.isNullAt(rTsIdx)) {
                  rBuf.next() // null time sorts first within the key; never a match
                } else {
                  val rts = getRTs(r, rTsIdx)
                  if (rts <= lt) {
                    rBuf.next()
                    matchKey = rk; hasMatch = true
                    matchRow = payloadProj(r).copy() // unsafe rows are reused buffers
                  } else advance = false
                }
              } else advance = false
            }
          }
          val p = if (hasMatch && matchKey == lk) matchRow else nullPayload
          resultProj(joined(l, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}
