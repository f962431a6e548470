package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the SCC operator (not part of the suite). */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("sccprobe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val t0 = System.nanoTime()
    val r = graft.SparkEntry.queries("q_graph_scc")(spark, d)
    val rows = r.collect()
    println(s"SCC_ROWS=${rows.length} SECS=${(System.nanoTime()-t0)/1e9}")
    rows.groupBy(_.getLong(1)).view.mapValues(_.length).toSeq.sortBy(_._1)
      .foreach { case (c, n) => println(s"comp=$c size=$n") }
    spark.stop()
  }
}
