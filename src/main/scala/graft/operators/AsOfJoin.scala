package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join — an operator Spark has no native node for
  * (SURVEY.md §2.2: compose built-ins before custom plans): for every
  * left row, attach the latest right row with `rts <= lts` for the
  * same key.
  *
  * Implementation is the single-shuffle union trick, not a per-row
  * lookup: tag both inputs, union them, and run one
  * `last(value, ignoreNulls)` window over (key, time, tag) — right
  * rows sort before left rows at equal timestamps, so the running
  * "last seen right payload" at each left row IS the as-of match.
  * Cost: one shuffle by key + one sort, O(n log n) per partition —
  * the same plan shape a dedicated AsOfJoinExec would produce, and it
  * scales to arbitrarily many right rows per key (no broadcast, no
  * range explosion).
  */
object AsOfJoin {

  /** Idempotent, thread-safe registration of the as-of planner
    * strategy. `experimental.extraStrategies` alone can't be the
    * membership check: a session built with
    * `spark.sql.extensions=GraftExtensions` already carries the
    * strategy via `extraPlanningStrategies`, and the old
    * read-modify-write both double-appended in that case and raced
    * against concurrent callers. `sessionState.planner.strategies`
    * sees both injection paths; the lock serialises the append. */
  private def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    AsOfJoin.synchronized {
      val present =
        spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy) ||
          spark.sessionState.planner.strategies.contains(graft.plans.AsOfJoinStrategy)
      if (!present)
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }

  /** @param left      rows to enrich
    * @param right     reference rows (must be unique per (key, rts);
    *                  pre-aggregate if not)
    * @param key       equi-join key column name (same name both sides)
    * @param lts, rts  event-time column names
    * @param payload   right columns to carry onto left rows
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           lts: String, rts: String, payload: Seq[String]): DataFrame =
    asofImpl(left, right, key, lts, rts, payload, forward = false)

  /** The dedicated-physical-operator variant of [[asof]]: plans a
    * custom [[graft.plans.AsOfJoinNode]] that executes as a
    * partition-local sorted merge ([[graft.plans.AsOfJoinExec]]) —
    * each side shuffles independently on its key (a pre-bucketed right
    * side re-shuffles nothing) and the merge buffers ONE right payload
    * row, vs. the composed union+window's single combined shuffle and
    * window state. Same semantics as [[asof]] (asserted in
    * AsOfJoinSpec).
    *
    * Contract: column names must be DISJOINT across the two sides
    * (rename first — key/ts/payload resolve by name), keys are Long or
    * Int (the SAME type on both sides — hash co-partitioning is
    * type-sensitive), event times Long / Timestamp (micros) / Int /
    * Date (days; Date pairs only with Date), and the right side is
    * unique per (key, rts). NULL keys/times follow join semantics:
    * null-key/time left rows get the null payload, null right rows
    * match nothing. */
  def asofExec(left: DataFrame, right: DataFrame, lkey: String, rkey: String,
               lts: String, rts: String, payload: Seq[String]): DataFrame = {
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty,
      s"asofExec requires disjoint column names; overlapping: ${overlap.mkString(", ")}")
    val spark = left.sparkSession
    ensureStrategy(spark)
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val node = graft.plans.AsOfJoinNode(
      left.queryExecution.logical, right.queryExecution.logical,
      UnresolvedAttribute(lkey), UnresolvedAttribute(rkey),
      UnresolvedAttribute(lts), UnresolvedAttribute(rts),
      payload.map(UnresolvedAttribute(_)))
    org.apache.spark.sql.graftshim.Bridge.ofRows(spark, node)
  }

  /** Forward as-of: for every left row, the EARLIEST right row with
    * `rts >= lts` for the same key ("next event" semantics — next
    * purchase after a click, next maintenance after a failure). Same
    * single-shuffle union plan as [[asof]], scanning time descending
    * so the running match is the nearest upcoming right row. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  lts: String, rts: String, payload: Seq[String]): DataFrame =
    asofImpl(left, right, key, lts, rts, payload, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
                       lts: String, rts: String, payload: Seq[String],
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val clash = payload.filter(leftCols.contains)
    require(clash.isEmpty,
      s"payload columns collide with left columns: ${clash.mkString(", ")} " +
        "(rename on the right side first — duplicates would be ambiguous downstream)")
    // All payload columns travel as ONE struct: struct(...) on a right
    // row is never null even if its fields are, so a single
    // last(ignoreNulls) picks THE latest right row atomically — per-
    // column windows would stitch together fields from different right
    // rows whenever a newer row carries a legitimately-NULL field.
    val nullPayload = lit(null).cast(org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(p, right.schema(p).dataType))))
    val l = left
      .withColumn("_t", col(lts))
      .withColumn("_tag", lit(1))
      .select(leftCols.map(col) :+ col("_t") :+ col("_tag") :+ nullPayload.as("_p"): _*)
    val r = right
      // join semantics (and AsOfJoinExec parity): a right row with a
      // NULL key or NULL event time can never match anything — drop it
      // here rather than letting the null-key window partition pair it
      // with null-key left rows
      .where(col(key).isNotNull && col(rts).isNotNull)
      .withColumn("_t", col(rts))
      .withColumn("_tag", lit(0))
      .select((leftCols.map(c => if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("_t") :+ col("_tag")) :+ struct(payload.map(col): _*).as("_p"): _*)
    // at equal timestamps the right row (_tag 0) sorts first in both
    // directions, so equality matches inclusively
    // nulls_first in BOTH directions: a left row with a NULL event time
    // must scan before every right row so it gets the null payload
    // (desc's default NULLS LAST would instead hand it the running
    // match of the whole partition)
    val w = Window.partitionBy(col(key))
      .orderBy(if (forward) col("_t").desc_nulls_first else col("_t").asc_nulls_first, col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col("_m").getField(p).as(p)): _*)
  }
}
