package graft.tools

import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("drive").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val names = Seq("q_embed_pca", "q_dedup_simhash_acc", "q_text_heaps",
      "q_text_readability", "q_embed_outlier", "q_graph_bowtie",
      "q_agg_winsor", "q_text_jsd", "q_sample_coreset",
      "q_embed_matryoshka", "q_events_holt")
    // warmup pass (codegen/JIT), then two timed reps, report min
    for (n <- names) { graft.SparkEntry.queries(n)(spark, d).collect() }
    for (n <- names) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, d).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[drive] $n%-22s min=${times.min}%.2fs")
    }
    spark.stop()
  }
}
