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
    // r18 wave: drive the touched/new gate entries end-to-end at sf0.1
    // (the gate verifies sf0.001/sf0.01; this is the bigger-data smoke)
    Seq("q_stream_integrity", "q_stream_ivm_join", "q_ivm_join",
        "q_spatial_join", "q_spatial_dbscan_auto",
        "q_embed_nsw", "q_embed_nsw_beam",
        "q_embed_ivf_balanced", "q_embed_ivf_balanced_iter",
        "q_embed_ivf_filtered", "q_hybrid_retrieval").foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, d)
      df.show(80, truncate = false)
      println(f"[drive] $n rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // and the new auto-knob rule through its public API directly
    Seq(2000L, 20000L, 200000L, 2000000L).foreach { n =>
      println(s"[drive] autoSpatialRadiusExp($n) = " +
        graft.operators.Similarity.autoSpatialRadiusExp(n))
    }
    spark.stop()
  }
}
