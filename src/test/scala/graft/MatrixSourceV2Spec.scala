package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col

import graft.sources.{MatrixIO, MatrixSourceV2}

/** The `graft-matrix` DataSource V2 connector: parity with the
  * declarative MatrixIO parse, filter pushdown that PRUNES row
  * partitions (not just reports filters), and column pruning. */
class MatrixSourceV2Spec extends SparkSpec {

  private def v2(name: String) =
    spark.read.format("graft-matrix").load(MatrixIO.resourcePath(name))

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("v2 read matches MatrixIO.readMatrix on every fixture") {
    for (g <- Seq("G1", "G2", "G3", "G5", "G6", "G7")) {
      val want = MatrixIO.readMatrix(spark, MatrixIO.resourcePath(s"$g.txt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = v2(s"$g.txt").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"fixture $g")
    }
  }

  test("src range filters are pushed and prune row partitions") {
    val df = v2("G7.txt").where(col("src") >= 4 && col("src") < 6)
    val scan = scanOf(df)
    // pushed: the scan narrowed to rows [4, 6) — fewer partitions than
    // the unfiltered 4, and the description records the range
    assert(scan.scan.description().contains("rows=[4,6)"))
    assert(scan.inputRDD.getNumPartitions <
      scanOf(v2("G7.txt")).inputRDD.getNumPartitions)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((4L, 0L), (4L, 5L), (4L, 6L), (5L, 4L)))
  }

  test("residual dst filter is applied post-scan, src EqualTo prunes to one row") {
    val df = v2("G7.txt").where(col("src") === 4 && col("dst") > 0)
    assert(scanOf(df).scan.description().contains("rows=[4,5)"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((4L, 5L), (4L, 6L)))
  }

  test("column pruning: dst-only projection and pure count") {
    val dst = v2("G7.txt").select("dst")
    assert(scanOf(dst).scan.readSchema().fieldNames.toSeq === Seq("dst"))
    assert(dst.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 4L, 4L, 4L, 5L, 6L))
    assert(v2("G7.txt").count() === 12L)
  }

  test("contradictory pushed range yields an empty scan, not an error") {
    assert(v2("G7.txt").where(col("src") > 5 && col("src") < 3).count() === 0L)
  }

  test("the partitions read option controls planned input splits") {
    def partsOf(n: Int) = scanOf(spark.read.format("graft-matrix")
      .option("partitions", n).load(MatrixIO.resourcePath("G7.txt")))
      .inputRDD.getNumPartitions
    assert(partsOf(2) === 2)
    assert(partsOf(7) === 7)          // G7 has 7 rows — one per split
    assert(partsOf(100) === 7)        // clamped to the row count
    assert(partsOf(0) === 1)          // degenerate values clamp to 1
    // option respected alongside row-range pruning: [4,6) has 2 rows
    val pruned = spark.read.format("graft-matrix").option("partitions", 1)
      .load(MatrixIO.resourcePath("G7.txt"))
      .where(col("src") >= 4 && col("src") < 6)
    assert(scanOf(pruned).inputRDD.getNumPartitions === 1)
    assert(pruned.count() === 4L)
  }

  test("malformed files fail loudly at scan build, not silently mis-parse") {
    def tmpWith(content: String): String = {
      val p = java.nio.file.Files.createTempFile("graft-badmatrix-", ".txt")
      java.nio.file.Files.write(p, content.getBytes)
      p.toFile.deleteOnExit()
      p.toString
    }
    // truncated cell matrix: must refuse (silently re-interpreting
    // row-major cells against the declared n is the failure mode
    // MatrixIO guards against too)
    val truncated = tmpWith("3\n0 1 0 1 0\n")
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("graft-matrix").load(truncated).count()
    }
    assert(e1.getMessage.contains("expected 9 matrix cells"))
    // negative header
    val negative = tmpWith("-2\n")
    val e2 = intercept[Exception] {
      spark.read.format("graft-matrix").load(negative).count()
    }
    assert(e2.getMessage.contains("non-negative") || e2.getMessage.contains("expected"))
    // n = 0 is a VALID empty graph, not an error
    assert(spark.read.format("graft-matrix").load(tmpWith("0\n")).count() === 0L)
  }

  private def edgesDf(pairs: (Long, Long)*) = {
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map(p => Row(p._1, p._2)), 2),
      MatrixSourceV2.schema)
  }

  test("v2 write: overwrite roundtrips through the v2 read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mxw")
    try {
      val p = dir.resolve("g.txt").toString
      val in = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 3L))
      edgesDf(in: _*).write.format("graft-matrix").mode("overwrite").save(p)
      val back = spark.read.format("graft-matrix").load(p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(back === in.toSet)
      // inferred n = maxId + 1
      assert(MatrixIO.readVertexCount(spark, p) === 4)
    } finally graft.tools.TestCleanup.deleteRecursively(dir)
  }

  test("v2 write: append ORs cells into the existing matrix (op=2 modify)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mxw")
    try {
      val p = dir.resolve("g.txt").toString
      edgesDf((0L, 1L), (1L, 2L)).write.format("graft-matrix")
        .mode("overwrite").option("n", 5).save(p)
      // append a delta incl. a duplicate edge — idempotent OR semantics
      edgesDf((1L, 2L), (4L, 0L)).write.format("graft-matrix")
        .mode("append").save(p)
      val back = spark.read.format("graft-matrix").load(p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(back === Set((0L, 1L), (1L, 2L), (4L, 0L)))
      assert(MatrixIO.readVertexCount(spark, p) === 5) // existing n respected
    } finally graft.tools.TestCleanup.deleteRecursively(dir)
  }

  test("v2 write: endpoint outside an explicit n fails loudly, file intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mxw")
    try {
      val p = dir.resolve("g.txt").toString
      edgesDf((0L, 1L)).write.format("graft-matrix").mode("overwrite").save(p)
      val before = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8")
      val e = intercept[Exception] {
        edgesDf((9L, 0L)).write.format("graft-matrix")
          .mode("overwrite").option("n", 3).save(p)
      }
      assert(e.getMessage.contains("outside [0,3)") ||
        Option(e.getCause).exists(_.getMessage.contains("outside [0,3)")))
      // commit never ran — the previous file is untouched (atomicity)
      val after = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8")
      assert(after === before)
    } finally graft.tools.TestCleanup.deleteRecursively(dir)
  }
}
