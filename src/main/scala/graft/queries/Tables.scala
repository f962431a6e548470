package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access for the query inventory (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
    * outright; read nanos as long and truncate to a microsecond
    * timestamp with exact integer arithmetic. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
  }
}
