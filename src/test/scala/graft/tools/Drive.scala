package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    // r17 wave: drive the touched/new gate entries end-to-end at sf0.1
    // (the gate verifies sf0.001/sf0.01; this is the bigger-data smoke)
    Seq("q_embed_ivf_2level", "q_embed_ivf_2level_auto",
        "q_stream_ivm_join", "q_ivm_join",
        "q_sample_neyman", "q_embed_pca_sampled",
        "q_embed_nsw", "q_embed_ivf_balanced").foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, d)
      df.show(80, truncate = false)
      println(f"[drive] $n rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // and the auto-knob rules through their public API directly
    println(s"[drive] autoTwoLevelFanout(2e3) = " +
      graft.operators.Similarity.autoTwoLevelFanout(2000L))
    println(s"[drive] autoTwoLevelFanout(2e5) = " +
      graft.operators.Similarity.autoTwoLevelFanout(200000L))
    println(s"[drive] autoSampleModulus(2e5)  = " +
      graft.operators.Similarity.autoSampleModulus(200000L))
    spark.stop()
  }
}
