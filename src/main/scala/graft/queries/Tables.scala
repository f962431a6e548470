package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table access for the query inventory (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Cheap local-FS metadata hash of one fixture table (single file or
    * a dir of parts): changes whenever the driver rewrites the fixture,
    * so memo keys that include it re-derive instead of serving stale
    * state after a mid-session refresh (the r9 failure class — schema
    * AND content changes both move size/mtime). */
  def fingerprint(dir: String, name: String): Long = {
    val root = new java.io.File(dir, s"$name.parquet")
    val files: Seq[java.io.File] =
      if (root.isDirectory)
        Option(root.listFiles()).getOrElse(Array.empty).toSeq.sortBy(_.getName)
      else Seq(root)
    files.foldLeft(1125899906842597L) { (h, f) =>
      31 * (31 * (31 * h + f.getName.hashCode) + f.length()) + f.lastModified()
    }
  }

  /** Loads `events` with a session-timezone TIMESTAMP `ts`, adapting to
    * whatever physical type the fixture was written with. The driver's
    * fixtures have shipped `ts` as TIMESTAMP(NANOS) (Spark 4 surfaces
    * it as a nanos LONG under `legacy.parquet.nanosAsLong`) and, since
    * the 2026-08-13 refresh, as TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (surfaced as TIMESTAMP_NTZ). Both arrive at
    * the same microsecond-precision TimestampType here; the NTZ wall
    * clock is re-interpreted in the session zone (UTC for
    * Verify/Bench), which is exactly how the DuckDB oracle reads the
    * same naive values. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // harmless for timestamp fixtures; required before the read for
    // nanos fixtures (without it Spark rejects the file outright)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: exact integer truncation to micros
        raw.withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
      case TimestampNTZType => // naive micros: wall clock -> session zone
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet type $other (expected " +
          "nanos-long, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
}
