package graft

import org.apache.spark.sql.functions._

/** The graft-synth-events connector: batch/stream parity, admission
  * control (batch pacing), and generator parity with Spark's own md5
  * (MessageDigest in the reader vs the md5() expression). */
class SynthSourceSpec extends SparkSpec {

  private val N = 2500L

  private def expected = {
    val h = md5(concat(lit("ev|"), col("id").cast("string")))
    spark.range(N).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1704067200L * 1000000L) + col("id") * 1000000L).as("ts"),
      (conv(substring(h, 1, 4), 16, 10).cast("long") % 50).as("user_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase"),
          lit("signup"), lit("error")),
        (conv(substring(h, 5, 1), 16, 10).cast("int") % 5) + 1).as("event_type"),
      ((conv(substring(h, 6, 4), 16, 10).cast("long") % 10000) / 100.0).as("value"))
  }

  test("batch read equals the spark.range md5 rebuild row-for-row") {
    val got = spark.read.format("graft-synth-events")
      .option("totalRows", N).load()
    assert(got.count() === N)
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("stream delivers the same rows in totalRows/rowsPerBatch batches") {
    val sink = "synth_spec_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("graft-synth-events")
      .option("totalRows", N).option("rowsPerBatch", 500L).load()
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(sink)
    assert(got.count() === N)
    assert(got.exceptAll(expected).count() === 0)
    // admission control paced the replay: 2500 rows / 500 per batch
    val fed = q.recentProgress.filter(_.numInputRows > 0)
    assert(fed.length === 5, s"expected 5 fed micro-batches, saw ${fed.length}")
    assert(fed.forall(_.numInputRows == 500L))
  }

  test("offsets roundtrip through json (checkpoint restart contract)") {
    val stream = new graft.sources.SynthEventsStream(100L, 10L, 2)
    val o = stream.latestOffset(stream.initialOffset(), stream.getDefaultReadLimit)
    assert(stream.deserializeOffset(o.json()).json() === o.json())
    // admission control advances by rowsPerBatch and clamps at total
    assert(o.json() === "10")
    val end = stream.latestOffset(stream.deserializeOffset("95"),
      stream.getDefaultReadLimit)
    assert(end.json() === "100")
  }

  test("partitions option splits each batch's range") {
    val got = spark.read.format("graft-synth-events")
      .option("totalRows", 100L).option("partitions", 8).load()
    assert(got.rdd.getNumPartitions === 8)
    assert(got.agg(sum("event_id")).head().getLong(0) === (0L until 100L).sum)
  }
}
