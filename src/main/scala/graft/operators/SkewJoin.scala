package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. the skew is in a
  * broadcast-ineligible build side, or a single hot key dominates a
  * partition at 100 TB).
  *
  * Left rows get a deterministic salt in [0, salts); right rows are
  * replicated once per salt value; the join key becomes
  * (key, salt), spreading a hot key over `salts` reducers. The salt is
  * hash-derived from stable row columns (not `rand()`), so results are
  * reproducible run-to-run.
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `key`, salted.
    * @param saltCols stable left columns the salt is derived from */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      salts: Int, saltCols: Seq[String]): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("_salt",
      pmod(hash(saltCols.map(col): _*), lit(salts)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(key) === r(key) && l("_salt") === r("_salt"))
      .drop("_salt").drop(r(key))
  }
}
