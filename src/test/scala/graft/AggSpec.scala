package graft

import org.apache.spark.sql.functions._

/** Aggregation-specific checks that the oracle gate can't express:
  * the decimal-sum closed forms used for cross-engine determinism must
  * agree with Spark's builtin estimators to float precision. */
class AggSpec extends SparkSpec {

  test("q_agg_moments closed form matches builtin skewness/kurtosis at output resolution") {
    val dir = TestSpark.sfDir
    val closed = SparkEntry.queries("q_agg_moments")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val builtin = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(skewness(col("l_quantity")).as("s"), kurtosis(col("l_quantity")).as("k"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(closed.keySet === builtin.keySet)
    closed.foreach { case (g, (sk, ku)) =>
      assert(math.abs(sk - builtin(g)._1) <= 5e-6 + 1e-7, s"skew($g)")
      assert(math.abs(ku - builtin(g)._2) <= 5e-6 + 1e-7, s"kurt($g)")
    }
  }

  test("q_agg_corr closed form matches builtin corr/covar_samp within 1e-9") {
    val dir = TestSpark.sfDir
    val closed = SparkEntry.queries("q_agg_corr")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val builtin = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_discount"), col("l_tax")).as("v"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(closed.keySet === builtin.keySet)
    closed.foreach { case (k, (c, v)) =>
      // closed form is rounded to 4/6 dp, so compare at that resolution
      assert(math.abs(c - builtin(k)._1) <= 5e-5 + 1e-9, s"corr($k)")
      assert(math.abs(v - builtin(k)._2) <= 5e-7 + 1e-9, s"covar($k)")
    }
  }
}
