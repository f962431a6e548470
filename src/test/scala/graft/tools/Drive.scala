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
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    // r20: drive the touched gate entries end-to-end at sf0.1
    // (the gate verifies sf0.001/sf0.01; this is the bigger-data smoke)
    Seq(
        // seen-A snapshot compaction (r19 verdict item 2)
        "q_stream_ivm_join", "q_ivm_join",
        // ratio guard + topology-knob plumbing (defaults unchanged)
        "q_embed_nsw_recall", "q_embed_nsw", "q_embed_nsw_beam",
        "q_embed_nsw_batch",
        "q_hybrid_retrieval_indexed").foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, d)
      df.show(80, truncate = false)
      println(f"[drive] $n rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // the navigable graph through its builder directly: degree bounds
    // and cross-cell reach at sf0.1
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val k = graft.operators.Similarity.autoCellCount(emb.count())
    val g = graft.queries.PipelineQueries.nswGraph(spark, d, k)
    val deg = g.groupBy("src").count()
    println(s"[drive] nswGraph sf0.1: edges=${g.count()} " +
      s"maxDeg=${deg.agg(max("count")).head.getLong(0)} cells=$k")
    // dense bound-pruning census: how many cells the exact probe reads
    val (_, _, cand) = graft.queries.PipelineQueries.hybridDenseCandCells(spark, d)
    println(s"[drive] hybridDense cells scanned: ${cand.size}/$k")
    spark.stop()
  }
}
