package graft.tools

import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("drive").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // wave-18 entries end-to-end on the two iteration scales
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      for (q <- Seq("q_window_locf", "q_events_ohlc", "q_events_concurrency",
                    "q_profile_table", "q_graph_linkpred", "q_graph_hits")) {
        val df = graft.SparkEntry.queries(q)(spark, d)
        val n = df.count()
        println(s"[drive] $sf $q rows=$n")
        if (sf == "sf0.01") df.show(5, truncate = false)
      }
    }
    spark.stop()
  }
}
