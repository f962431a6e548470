package graft.tools
import org.apache.spark.sql.SparkSession

/** Probe: AQE on/off effect on the iterative driver-loop operators. */
object Probe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("lineitem", "orders", "nation").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    for (round <- 1 to 2; aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      time(s"r$round aqe=$aqe q_graph_cc")(
        graft.SparkEntry.queries("q_graph_cc")(spark, sfDir).count())
      time(s"r$round aqe=$aqe q_graph_bfs")(
        graft.SparkEntry.queries("q_graph_bfs")(spark, sfDir).count())
      time(s"r$round aqe=$aqe q_graph_sssp")(
        graft.SparkEntry.queries("q_graph_sssp")(spark, sfDir).count())
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
