package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomPrune
import graft.queries.Tables.t

/** Properties of the round-8 sketch/runtime-filter/layout operators
  * beyond their value-level DuckDB oracles: the count-min
  * overestimate guarantee and fixed state bound, the Bloom
  * prefilter's no-false-negative contract (prefilter → exact join ≡
  * plain join) plus its actual pruning power on the fixtures, and the
  * z-order bucket bounding-box guarantee. */
class SketchAndBloomSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("bitmap_distinct: exact under shuffle merge, null-blind, sign-safe, 0 on empty") {
    import spark.implicits._
    graft.functions.expressions.GraftFunctions.register(spark)
    // keys spanning negative/positive across many partitions force the
    // partial-buffer serialize → merge path; nulls must be ignored
    val df = (-500L to 500L).flatMap(k => Seq(k, k)).toDF("k")
      .repartition(8)
      .union(Seq.empty[Long].toDF("k").select(lit(null).cast("long").as("k")))
    val got = df.agg(expr("bitmap_distinct(k)")).head().getLong(0)
    assert(got === 1001L)
    val withNulls = Seq(Some(1L), None, Some(1L), Some(-64L), None).toDF("k")
    assert(withNulls.agg(expr("bitmap_distinct(k)")).head().getLong(0) === 2L)
    assert(Seq.empty[Long].toDF("k").agg(expr("bitmap_distinct(k)"))
      .head().getLong(0) === 0L)
    // grouped: agrees with countDistinct on fixture data
    val li = t(spark, TestSpark.sfDir, "lineitem")
    val a = li.groupBy("l_returnflag").agg(expr("bitmap_distinct(l_suppkey)").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = li.groupBy("l_returnflag").agg(countDistinct("l_suppkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("HLL estimate lands within the m=64 error envelope") {
    val r = run("q_sketch_hll").head()
    val (exact, est) = (r.getAs[Long]("n_exact").toDouble, r.getAs[Double]("n_est"))
    // standard error at m=64 is 1.04/sqrt(64) = 13%; raw estimator
    // (no small-range correction) still belongs within ~3 sigma
    assert(math.abs(est - exact) / exact < 0.4,
      s"HLL estimate $est too far from exact $exact")
  }

  test("count-min estimates always dominate the exact counts") {
    val rows = run("q_sketch_cms").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS underestimated: $r")
    }
  }

  test("count-min state is bounded by d*w however many tokens stream through") {
    // rebuild the cell table exactly as the query does and check the
    // sketch never exceeds its declared d*w = 3*256 counters
    val tok = t(spark, TestSpark.sfDir, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    val cells = tok.select(posexplode(array((0 until 3).map(r =>
        (conv(substring(md5(concat(lit(s"$r|"), col("tok"))), 1, 8), 16, 10)
          .cast("long") % 256).cast("int")): _*)))
      .toDF("r", "c").groupBy("r", "c").count()
    assert(cells.count() <= 3 * 256)
    assert(cells.where(col("c") < 0 || col("c") >= 256).isEmpty,
      "cell index out of the declared [0, w) range")
  }

  test("bloom prefilter never drops a true match (exact join unchanged)") {
    val dim = t(spark, TestSpark.sfDir, "customer")
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = t(spark, TestSpark.sfDir, "orders")
    val bloom = BloomPrune.build(dim, "c_custkey", mBits = 1 << 14, h = 3)
    val withBloom = o
      .where(BloomPrune.mightContain(bloom, 1 << 14, 3, col("o_custkey")))
      .join(dim, o("o_custkey") === dim("c_custkey"), "left_semi")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val plain = o.join(dim, o("o_custkey") === dim("c_custkey"), "left_semi")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(withBloom == plain)
  }

  test("bloom prefilter actually prunes non-matching fact rows") {
    val dim = t(spark, TestSpark.sfDir, "customer")
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = t(spark, TestSpark.sfDir, "orders")
    val bloom = BloomPrune.build(dim, "c_custkey", mBits = 1 << 14, h = 3)
    val kept = o.where(BloomPrune.mightContain(bloom, 1 << 14, 3, col("o_custkey"))).count()
    val total = o.count()
    val matches = o.join(dim, o("o_custkey") === dim("c_custkey"), "left_semi").count()
    assert(kept >= matches, "bloom can never keep fewer than the true matches")
    assert(kept < total, s"bloom pruned nothing ($kept of $total kept) — " +
      "filter is degenerate (all bits set?)")
  }

  test("z-order buckets bound BOTH dimensions (the file-skipping guarantee)") {
    // top-6 z-bits fix the top-3 bits of each 10-bit dimension, so a
    // bucket's bounding box spans at most 2^7 = 128 values per dim —
    // the property that makes min/max stats skip files on EITHER column
    val rows = run("q_layout_zorder").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xSpan, ySpan) = (r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4))
      assert(xSpan <= 127 && ySpan <= 127, s"bucket box too wide: $r")
    }
    // and the interleave is a bijection into [0, 2^20): buckets cover
    // disjoint z ranges by construction, so bucket ids stay < 64
    assert(rows.map(_.getLong(0)).forall(b => b >= 0 && b < 64))
  }

  test("z-order file layout concentrates single-column predicates into few files") {
    // The end-to-end layout claim behind q_layout_zorder: WRITE the
    // table in z-key ranges and a predicate on EITHER dimension only
    // touches the files whose clustered range intersects it, because
    // each z-range file fixes leading bits of BOTH columns (here 8
    // z-range files fix y9,x9,y8 — interleave2 puts y on odd/high bit
    // positions) — that is what per-file min/max statistics prune on.
    // A linear sort on x clusters ONLY x, so the same y-slab predicate
    // has matching rows in EVERY file. Files-holding-matches is the
    // engine-portable proxy for files-read-after-stats-pruning: a
    // file with no matching rows is exactly one whose y min/max
    // excludes the slab and is skipped by any stats-aware reader.
    import graft.operators.ZOrder
    val base = t(spark, TestSpark.sfDir, "orders")
      .select((col("o_custkey") % 1024).cast("long").as("x"),
        (floor(col("o_totalprice") / 500.0).cast("long") % 1024).as("y"))
      .withColumn("z", ZOrder.interleave2(col("x"), col("y")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder-layout")
    try {
      val zDir = tmp.resolve("byz").toString
      val xDir = tmp.resolve("byx").toString
      base.repartitionByRange(8, col("z")).sortWithinPartitions("z")
        .write.parquet(zDir)
      base.repartitionByRange(8, col("x")).sortWithinPartitions("x")
        .write.parquet(xDir)
      def filesMatching(dir: String): Long =
        spark.read.parquet(dir).where(col("y").between(256, 319))
          .select(input_file_name()).distinct().count()
      val (zFiles, xFiles) = (filesMatching(zDir), filesMatching(xDir))
      // y in [256,319] fixes y9y8 = 01 -> at most the 2 z-range files
      // with (y9,x9,y8) in {010, 011} hold matches (range-boundary
      // straddle can add one more)
      assert(zFiles <= 3, s"z-ordered layout touched $zFiles of 8 files")
      assert(xFiles >= 7, s"x-sorted layout should spread the y-slab " +
        s"across ~all files, got $xFiles — fixture degenerate?")
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        val w = java.nio.file.Files.walk(p)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally w.close()
      }
      rm(tmp)
    }
  }

  test("bloom build tolerates NULL keys (they never match a join anyway)") {
    import spark.implicits._
    val keys = Seq(Some(1L), None, Some(7L)).toDF("k")
    val bits = BloomPrune.build(keys, "k", 1 << 10, 3) // NPE'd before the null filter
    val probe = Seq(1L, 7L).toDF("k")
      .where(BloomPrune.mightContain(bits, 1 << 10, 3, col("k"))).count()
    assert(probe == 2, "non-null built keys must still probe true")
  }

  test("bloom membership is exact-positive for every built key") {
    // every inserted key must probe true (zero false negatives by
    // construction — this pins the build/probe position parity)
    val dim = t(spark, TestSpark.sfDir, "customer")
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bloom = BloomPrune.build(dim, "c_custkey", mBits = 1 << 14, h = 3)
    val missed = dim.where(!BloomPrune.mightContain(bloom, 1 << 14, 3, col("c_custkey"))).count()
    assert(missed == 0)
  }
}
