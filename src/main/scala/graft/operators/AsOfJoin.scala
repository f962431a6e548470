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

  /** @param left      rows to enrich
    * @param right     reference rows (must be unique per (key, rts);
    *                  pre-aggregate if not)
    * @param key       equi-join key column name (same name both sides)
    * @param lts, rts  event-time column names
    * @param payload   right columns to carry onto left rows
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           lts: String, rts: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(lts))
      .withColumn("_tag", lit(1))
      .select((leftCols.map(col) :+ col("_t") :+ col("_tag")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_p_$p")): _*)
    val r = right
      .withColumn("_t", col(rts))
      .withColumn("_tag", lit(0))
      .select((leftCols.map(c => if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("_t") :+ col("_tag")) ++ payload.map(p => col(p).as(s"_p_$p")): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .select(col("*") +:
        payload.map(p => last(col(s"_p_$p"), ignoreNulls = true).over(w).as(p)): _*)
      .where(col("_tag") === 1)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
