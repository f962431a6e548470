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
    // closing-wave entries end-to-end on the two iteration scales
    val latest = Seq("q_embed_purity", "q_graph_modularity", "q_events_bounce",
      "q_sample_leakage", "q_text_dupe_stats", "q_events_rfm",
      "q_events_window_funnel", "q_mix_kl", "q_agg_gini", "q_agg_entropy")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      for (q <- latest) {
        val df = graft.SparkEntry.queries(q)(spark, d)
        println(s"[drive] $sf $q rows=${df.count()}")
        if (sf == "sf0.01") df.show(4, truncate = false)
      }
    }
    spark.stop()
  }
}
