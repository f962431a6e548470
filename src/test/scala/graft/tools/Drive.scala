package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.multimodal.Multimodal

/** Dev driver: exercises the public API end-to-end.
  * Run: sbt "Test/runMain graft.tools.Drive" */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"

    // --- streaming: stage events into a dir, run the watermarked agg live
    val sd = java.nio.file.Files.createTempDirectory("drv-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"), sd.resolve("e.parquet"))
    val q = EventStreams.hourlyAgg(EventStreams.eventsStream(spark, sd.toString))
      .writeStream.outputMode("append").format("memory").queryName("hr").start()
    q.processAllAvailable()
    println("STREAM_HOURLY_ROWS=" + spark.table("hr").count())
    spark.table("hr").orderBy("window_start","event_type").show(4, false)
    // probe: drop a second file into the directory mid-stream (late arrival)
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"), sd.resolve("e2.parquet"))
    q.processAllAvailable()
    println("STREAM_AFTER_SECOND_FILE=" + spark.table("hr").count())
    q.stop()

    // --- stateful sessionization through the typed API
    val ev = graft.queries.Tables.events(spark, sf)
      .select($"event_id",$"ts",$"user_id",$"event_type",$"value").as[EventStreams.Event]
    val sess = EventStreams.sessionize(ev)
    println("SESSIONS_CLOSED=" + sess.count())
    sess.orderBy("user_id","session_start").show(3, false)

    // --- multimodal plumbing
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    Multimodal.decodeMeta(docs).show(3, false)
    val f = Multimodal.extractFeatures(docs).collect()
    println("FEATURES_DIM8_ALL=" + f.forall(_.features.length == 8) + " N=" + f.length)
    println("FRames=" + Multimodal.sampleFrames(docs).count())
    // probe: empty input through the full multimodal path
    println("EMPTY_META=" + Multimodal.decodeMeta(docs.where($"doc_id" < 0)).count())
    // probe: doc with empty text -> zero-byte payload
    val edge = Seq((999L, "")).toDF("doc_id","text")
    Multimodal.decodeMeta(edge).show(2,false)
    println("EMPTY_PAYLOAD_FEATURES=" + Multimodal.extractFeatures(edge).collect().head.features.toSeq)
    spark.stop()
  }
}
