package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage (SURVEY.md §2.2 scans/sinks row):
  * csv/json/orc roundtrips with declared schemas, and partition-pruned
  * parquet layout. */
class SourceSinkSpec extends SparkSpec {

  lazy val cust = graft.queries.Tables.t(spark, TestSpark.sfDir, "customer")
  def tmp(tag: String) = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("csv roundtrip with header + declared schema") {
    val dir = tmp("csv")
    cust.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(cust.schema).csv(dir)
    assert(back.count() === cust.count())
    assert(back.schema === cust.schema)
    assert(back.agg(round(sum(col("c_acctbal")), 2)).head().getDouble(0) ===
      cust.agg(round(sum(col("c_acctbal")), 2)).head().getDouble(0))
  }

  test("json-lines roundtrip") {
    val dir = tmp("json")
    cust.write.mode("overwrite").json(dir)
    val back = spark.read.schema(cust.schema).json(dir)
    assert(back.count() === cust.count())
    assert(back.select(sum(col("c_custkey"))).head().getLong(0) ===
      cust.select(sum(col("c_custkey"))).head().getLong(0))
  }

  test("orc roundtrip") {
    val dir = tmp("orc")
    cust.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === cust.count())
    assert(back.schema.fieldNames.toSeq === cust.schema.fieldNames.toSeq)
  }

  test("hive-style partitioned parquet gets partition-pruned scans") {
    val dir = tmp("part")
    val orders = graft.queries.Tables.t(spark, TestSpark.sfDir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("yr").parquet(dir)
    val pruned = spark.read.parquet(dir).where(col("yr") === 1997)
    assert(pruned.count() ===
      orders.where(col("yr") === 1997).count())
    // partition filter must reach the scan, not a post-scan Filter
    // (inputFiles lists the relation pre-pruning, so inspect the scan's
    // selected partitions instead)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.toString.contains("yr")),
      s"partition filter missing: ${scan.partitionFilters}")
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .forall(_.files.forall(_.getPath.toString.contains("yr=1997"))),
      "scan must select only the yr=1997 partition")
  }
}
