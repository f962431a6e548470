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
    // r16 wave: drive the new gate entries end-to-end at sf0.1
    // (the gate verifies sf0.001/sf0.01; this is the bigger-data smoke)
    Seq("q_privacy_ldiversity", "q_layout_skipping", "q_pack_sequences",
        "q_embed_ivf_2level", "q_ivm_join", "q_dedup_bloom",
        "q_privacy_tcloseness").foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, d)
      df.show(80, truncate = false)
      println(f"[drive] $n rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // and the auto-knob rules through their public API directly
    println(s"[drive] autoPlanesPerBand(2e5) = " +
      graft.operators.Similarity.autoPlanesPerBand(200000L))
    println(s"[drive] autoCellCount(2e5)     = " +
      graft.operators.Similarity.autoCellCount(200000L))
    println(s"[drive] autoSampleModulus(2e5) = " +
      graft.operators.Similarity.autoSampleModulus(200000L))
    val pcaS = graft.SparkEntry.queries("q_embed_pca_sampled")(spark, d)
    pcaS.show(3, truncate = false)
    println(s"[drive] q_embed_pca_sampled rows=${pcaS.count()}")
    spark.stop()
  }
}
