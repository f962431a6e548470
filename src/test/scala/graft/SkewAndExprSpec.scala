package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.functions.VectorFunctions
import graft.functions.expressions.GraftFunctions

class SkewAndExprSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = (1 to 1000).map(i => (if (i <= 900) 7L else i.toLong % 50, i.toLong))
      .toDF("k", "lv")
    val right = (0 to 60).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", salts = 8, saltCols = Seq("lv"))
      .select(left("k"), col("lv"), col("rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(plain.size === 900 + 100) // hot key fan + the rest
  }

  test("native cosine_sim expression is bit-identical to the HOF formulation") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .select($"vec_id", VectorFunctions.toDouble($"embedding").as("v"))
    val q = e.where($"vec_id" === 0).select($"v".as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select($"vec_id",
        expr("cosine_sim(v, qv)").as("fast"),
        VectorFunctions.cosine($"v", $"qv").as("hof"))
      // bit-level comparison: no tolerance
      .where(col("fast") =!= col("hof") ||
        (isnan(col("fast")) =!= isnan(col("hof"))))
    assert(both.count() === 0)
  }

  test("cosine_sim works from plain SQL via registration") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head().getDouble(0)
    assert(r === 1.0)
  }

  test("ThresholdedLevenshtein rule rewrites filter predicates to the banded form") {
    import org.apache.spark.sql.catalyst.expressions.Levenshtein
    import graft.plans.ThresholdedLevenshtein
    if (!spark.experimental.extraOptimizations.contains(ThresholdedLevenshtein))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ThresholdedLevenshtein
    // parquet-backed (a local Seq would be folded away by
    // ConvertToLocalRelation before extraOptimizations run)
    val dir = java.nio.file.Files.createTempDirectory("graft-lev").toString
    Seq(("kitten", "sitting"), ("abc", "abd"), ("a", "zzzzzz"), ("same", "same"))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val filtered = df.where(expr("levenshtein(a, b) <= 2"))
    // plan: the comparison now carries a threshold
    val thresholded = filtered.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case l: Levenshtein => l.threshold.isDefined
      case _ => false
    })
    assert(thresholded, "filter predicate must be rewritten to banded levenshtein")
    // semantics: kitten->sitting is 3 (out), abc->abd 1, same->same 0
    assert(filtered.collect().map(_.getString(0)).toSet === Set("abc", "same"))
    // strict < and = forms
    assert(df.where(expr("levenshtein(a, b) < 1")).collect()
      .map(_.getString(0)).toSet === Set("same"))
    assert(df.where(expr("levenshtein(a, b) = 3")).collect()
      .map(_.getString(0)).toSet === Set("kitten"))
    // a projected levenshtein keeps the true distance (rule must not touch it)
    val proj = df.select(expr("levenshtein(a, b)").as("d")).collect().map(_.getInt(0)).sorted
    assert(proj === Array(0, 1, 3, 6))
  }

  test("cosine_sim degenerate inputs: NULL on length mismatch / null element, matching the HOF twin") {
    GraftFunctions.register(spark)
    // (name, a, b) triples covering: equal-length clean, mismatched
    // lengths, null element either side, null array
    val df = Seq(
      ("clean",    Some(Seq[java.lang.Double](1.0, 2.0)), Some(Seq[java.lang.Double](3.0, 4.0))),
      ("shorter",  Some(Seq[java.lang.Double](1.0, 2.0, 3.0)), Some(Seq[java.lang.Double](1.0, 2.0))),
      ("nullElemL", Some(Seq[java.lang.Double](1.0, null)), Some(Seq[java.lang.Double](1.0, 2.0))),
      ("nullElemR", Some(Seq[java.lang.Double](1.0, 2.0)), Some(Seq[java.lang.Double](null, 2.0))),
      ("nullArr",  None, Some(Seq[java.lang.Double](1.0, 2.0)))
    ).toDF("name", "a", "b")
    val rows = df.select($"name",
        expr("cosine_sim(a, b)").as("fast"),
        VectorFunctions.cosine($"a", $"b").as("hof"))
      .collect().map(r => r.getString(0) -> ((r.isNullAt(1), r.isNullAt(2)))).toMap
    assert(rows("clean") === ((false, false)))
    // every degenerate case is NULL, and NULL exactly when the HOF twin is
    Seq("shorter", "nullElemL", "nullElemR", "nullArr").foreach { n =>
      assert(rows(n) === ((true, true)), s"case $n")
    }
    // and the same through the interpreted (non-codegen) path
    import graft.functions.expressions.CosineSimilarity
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def lit(xs: Seq[Any]) =
      Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(DoubleType, containsNull = true))
    assert(CosineSimilarity(lit(Seq(1.0, 2.0)), lit(Seq(1.0))).eval(null) === null)
    assert(CosineSimilarity(lit(Seq(1.0, null)), lit(Seq(1.0, 2.0))).eval(null) === null)
    assert(CosineSimilarity(lit(Seq(3.0, 4.0)), lit(Seq(3.0, 4.0))).eval(null) === 1.0)
  }

  test("q_basket_pairs mega-basket stress: the cap excludes pathological baskets") {
    // adversarial input the fixture can't produce: three identical
    // 1500-item baskets (every item frequent, so the apriori prune
    // keeps them all — without the basket cap this alone would emit
    // 3 x ~1.1M candidate pairs), plus three 2-item baskets whose pair
    // reaches support 3. The cap must drop the mega-baskets entirely
    // and keep the small-basket pair — and finish quickly.
    val dir = java.nio.file.Files.createTempDirectory("graft-megabasket")
    val mega = for (ok <- 1L to 3L; pk <- 0L until 1500L) yield (ok, pk)
    val small = for (ok <- 10L to 12L; pk <- Seq(9000L, 9001L)) yield (ok, pk)
    (mega ++ small).toDF("l_orderkey", "l_partkey")
      .write.parquet(dir.resolve("lineitem.parquet").toString)
    val got = SparkEntry.queries("q_basket_pairs")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((9000L, 9001L, 3L)),
      s"mega-baskets must be excluded by the 1000-item cap; got $got")
  }
}
