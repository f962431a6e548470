package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.Tables
import graft.streaming.EventStreams

/** Fixture-schema canary: asserts the engine's loaders accept the
  * parquet that is ACTUALLY on disk at /root/testdata.
  *
  * Exists because the round-9 driver-side fixture refresh silently
  * switched `events.ts` from TIMESTAMP(NANOS)-as-long to
  * TIMESTAMP(MICROS): 27 queries started failing analysis and 6
  * streaming queries mis-scaled timestamps 1000×, while the unit
  * suite stayed green by staging its own files in the stale dtype.
  * If a future refresh changes any fixture schema again, THIS suite
  * fails first, by name, instead of 35 scattered tests. */
class FixtureCanarySpec extends SparkSpec {

  val dir = TestSpark.sfDir
  val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("every fixture table opens through the engine's loader and has rows") {
    tables.foreach { name =>
      val df = if (name == "events") Tables.events(spark, dir)
               else Tables.t(spark, dir, name)
      assert(df.count() > 0, s"$name is empty")
    }
  }

  test("events loader normalizes the on-disk ts dtype to TimestampType") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType,
      s"events.ts normalized to ${ev.schema("ts").dataType}, expected TIMESTAMP")
    // the values must be sane calendar time, not 1970s epoch collapse
    // (the exact silent failure mode of a mis-scaled int64 read)
    val (lo, hi) = ev.agg(min(year(col("ts"))), max(year(col("ts"))))
      .head() match { case r => (r.getInt(0), r.getInt(1)) }
    assert(lo >= 1990 && hi <= 2100,
      s"events.ts years [$lo, $hi] out of range — int64 unit mis-scale?")
  }

  test("streaming source derives its schema from the on-disk files and agrees with batch") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-canary-stream")
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        streamDir.resolve("events.parquet"))
      val q = EventStreams.eventsStream(spark, streamDir.toString)
        .agg(count(lit(1)).as("n"), min(col("ts")).as("lo"), max(col("ts")).as("hi"))
        .writeStream.outputMode("complete").format("memory")
        .queryName("canary_stream").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("canary_stream").head()
      val want = Tables.events(spark, dir)
        .agg(count(lit(1)), min(col("ts")), max(col("ts"))).head()
      assert(got.getLong(0) === want.getLong(0), "stream row count != batch")
      assert(got.getTimestamp(1) === want.getTimestamp(1) &&
        got.getTimestamp(2) === want.getTimestamp(2),
        s"stream ts range ${got.getTimestamp(1)}..${got.getTimestamp(2)} != " +
          s"batch ${want.getTimestamp(1)}..${want.getTimestamp(2)} — unit mis-scale?")
    } finally {
      val walk = java.nio.file.Files.walk(streamDir)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("key fixture columns keep their expected engine-facing dtypes") {
    val expect = Map(
      "orders" -> Map("o_orderkey" -> LongType, "o_totalprice" -> DoubleType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType),
      "embeddings" -> Map("vec_id" -> LongType))
    expect.foreach { case (tbl, cols) =>
      val schema = Tables.t(spark, dir, tbl).schema
      cols.foreach { case (c, t) =>
        assert(schema(c).dataType === t, s"$tbl.$c is ${schema(c).dataType}, expected $t")
      }
    }
    val emb = Tables.t(spark, dir, "embeddings").schema
    assert(emb.find(_.name == "embedding").exists(_.dataType.isInstanceOf[ArrayType]),
      s"embeddings.embedding is not array-typed: $emb")
  }

  test("events.props stays a single-int-field JSON object at every SF " +
       "(q_json_variant's oracle pins the literal 'OBJECT<k: BIGINT>')") {
    // The q_json_variant oracle hardcodes Spark's schema_of_variant
    // rendering for {"k": <int>} — it cannot derive it in DuckDB. This
    // canary fails BY NAME, at all three fixture SFs, the moment a
    // refresh adds/removes a props field or Spark changes the
    // schema_of_variant format, instead of surfacing as a confusing
    // gate hash-mismatch (r12 ADVICE).
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      val schemas = Tables.events(spark, d)
        .select(expr("schema_of_variant(parse_json(props))").as("sch"))
        .distinct().collect().map(_.getString(0)).toSeq
      assert(schemas === Seq("OBJECT<k: BIGINT>"),
        s"$sf events.props variant schemas are $schemas — q_json_variant's " +
          "oracle assumes every row is a single-int object rendered " +
          "'OBJECT<k: BIGINT>'; update the oracle literal (RelationalQueries " +
          "q_json_variant) together with this pin")
    }
  }
}
