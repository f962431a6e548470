package graft.tools

import org.apache.spark.sql.SparkSession

/** r19: census + per-leg timing for the index-backed hybrid probe —
  * cells scanned by the bound-pruned exact dense probe vs total
  * cells, and the sparse/dense leg walls, at the derived scales.
  * args: [sfDir] */
object HybridProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("hybrid-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    val k = graft.operators.Similarity.autoCellCount(n)
    // staging (build once)
    val t0 = System.nanoTime()
    val (idx, qv, cand) = graft.queries.PipelineQueries.hybridDenseCandCells(spark, d)
    println(f"[hyb] $d n=$n cells=$k: first probe (incl. index build) ${(System.nanoTime() - t0) / 1e9}%.2f s")
    (1 to 3).foreach { i =>
      val t1 = System.nanoTime()
      val (_, _, c2) = graft.queries.PipelineQueries.hybridDenseCandCells(spark, d)
      println(f"[hyb] cand-cells warm rep$i: ${c2.size}/$k cells in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    import org.apache.spark.sql.functions._
    (1 to 3).foreach { i =>
      val t2 = System.nanoTime()
      idx.where(col("cid").isin(cand: _*) && col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          round(expr("cosine_sim(v, qv)"), 4).as("d_score"))
        .orderBy(col("d_score").desc, col("doc_id")).limit(20).count()
      println(f"[hyb] dense scan+score rep$i: ${(System.nanoTime() - t2) / 1e9}%.2f s")
    }
    val t3 = System.nanoTime()
    val ndcg = graft.SparkEntry.queries("q_hybrid_ndcg")(spark, d).collect()
    println(f"[hyb] ndcg in ${(System.nanoTime() - t3) / 1e9}%.2f s: " +
      ndcg.map(_.toString).mkString(" "))
    spark.stop()
  }
}
