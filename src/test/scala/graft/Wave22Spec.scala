package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the wave-22 additions (exact MAD, LATERAL join,
  * KMV sketch, bigram LM). */
class Wave22Spec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("mad: matches an in-memory exact median computation") {
    val vals = graft.queries.Tables.events(spark, TestSpark.sfDir)
      .where(col("value").isNotNull && col("event_type") === "click")
      .select("value").collect().map(_.getDouble(0)).sorted
    def medOf(xs: Array[Double]): Double = {
      val pos = (xs.length - 1) * 0.5
      val lo = xs(math.floor(pos).toInt); val hi = xs(math.ceil(pos).toInt)
      lo + (pos - math.floor(pos)) * (hi - lo)
    }
    val m = medOf(vals)
    val mad = medOf(vals.map(v => math.abs(v - m)).sorted)
    val row = run("q_agg_mad").where(col("event_type") === "click").head()
    assert(row.getAs[Double]("med") ===
      BigDecimal(m).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getAs[Double]("mad") ===
      BigDecimal(mad).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(run("q_agg_mad").where(col("mad") < 0).count() === 0)
  }

  test("lateral: equals the window-form top-3 per customer") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowForm = graft.queries.Tables.t(spark, TestSpark.sfDir, "orders")
      .where(col("o_custkey") % 100 === 0)
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    // lateral keeps only customers that exist in `customer`; windowForm
    // derives from orders alone, so semi-filter it for the compare
    val cust = graft.queries.Tables.t(spark, TestSpark.sfDir, "customer")
      .select(col("c_custkey"))
    val expected = windowForm.join(cust, Seq("c_custkey"), "left_semi")
    val got = run("q_join_lateral")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("kmv: small groups are exact; the _all estimate is in the error band") {
    val r = run("q_sketch_kmv").collect()
      .map(row => row.getString(0) -> (row.getLong(1), row.getDouble(2))).toMap
    r.foreach { case (_, (n, est)) =>
      if (n < 32) assert(est === n.toDouble)
    }
    val (nAll, estAll) = r("_all")
    if (nAll >= 32)
      assert(math.abs(estAll - nAll) / nAll < 0.5,
        s"KMV _all estimate $estAll vs exact $nAll outside the sanity band")
  }

  test("lmscore2: bigram counts and positivity per doc") {
    val toks = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        size(split(trim(lower(col("text"))), "\\s+")).as("nt"))
    val r = run("q_text_lmscore2").join(toks, "doc_id")
    assert(r.where(col("n_bigrams") =!= greatest(col("nt") - 1, lit(0)))
      .count() === 0)
    assert(r.where(col("bi_nll") <= 0).count() === 0)
  }
}
