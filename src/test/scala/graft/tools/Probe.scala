package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val sd = java.nio.file.Files.createTempDirectory("enrich-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"), sd.resolve("e.parquet"))
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = EventStreams.enrichStream(
      EventStreams.eventsStream(spark, sd.toString), cust, "user_id", "c_custkey")
      .groupBy("c_mktsegment").count()
    val q = enriched.writeStream.outputMode("complete").format("memory").queryName("enr").start()
    q.processAllAvailable()
    spark.table("enr").orderBy("c_mktsegment").show(10, false)
    val total = spark.table("enr").agg(sum("count")).head().getLong(0)
    println("ENRICH_TOTAL=" + total + " EXPECTED=" + spark.read.parquet(s"$sf/events.parquet").count())
    q.stop(); spark.stop()
  }
}
