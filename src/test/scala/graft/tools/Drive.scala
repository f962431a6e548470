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
    // r15 wave: drive the two new public operators end-to-end at sf0.1
    // (the gate verifies sf0.001/sf0.01; this is the bigger-data smoke)
    Seq("q_graph_densest", "q_embed_perceptron").foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, d)
      df.show(200, truncate = false)
      println(f"[drive] $n rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // and the operators through their public API directly
    import spark.implicits._
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    graft.operators.GraphAlgos.densestPeelCanon(tri.localCheckpoint(true), 3)
      .show(false)
    spark.stop()
  }
}
