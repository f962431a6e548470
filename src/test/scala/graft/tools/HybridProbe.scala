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

    // r19 verdict item 4: the isotropic census above reads 0/k pruned
    // — cell radius ≈ data diameter, so a sound bound cannot exclude
    // anything (BASELINE.md names the geometry). This section is the
    // COMPLEMENT: a clustered fixture with LOW INTRINSIC DIMENSION
    // (40 tight Gaussian bundles around random unit directions in the
    // same 64-d ambient space, noise σ=0.05, cluster c ∋ ids ≡ c mod
    // 40 so centroid ids 1..40 land in 40 DISTINCT clusters) — the
    // geometry real embedding corpora approach, where inter-cell
    // centroid cosine ≈ 0 ± 0.15 while in-cell τ ≈ 0.99, so the
    // Cauchy–Schwarz upper bound excludes nearly every foreign cell.
    // The probed top-20 is asserted bit-identical to the brute scan
    // on this geometry too (the exactness argument is geometry-free).
    val cBase = java.nio.file.Paths.get("/tmp/graft_hybrid_clustered")
    val cdir = cBase.toString
    val nC = 20000
    val kC = 40
    val rnd = new scala.util.Random(42)
    val dirs = Array.fill(kC)(Array.fill(64)(rnd.nextGaussian())).map { v =>
      val nrm = math.sqrt(v.map(x => x * x).sum); v.map(_ / nrm)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType), nullable = false)))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](nC)
    (0 until nC).foreach { i =>
      val c = i % kC
      val ri = new scala.util.Random(i * 2654435761L + 7)
      rows.add(org.apache.spark.sql.Row(i.toLong,
        dirs(c).map(x => (x + 0.05 * ri.nextGaussian()).toFloat).toSeq))
    }
    spark.createDataFrame(rows, schema)
      .repartition(8).write.mode("overwrite")
      .parquet(s"$cdir/embeddings.parquet")
    val t4 = System.nanoTime()
    val (cidx, cqv, ccand) =
      graft.queries.PipelineQueries.hybridDenseCandCells(spark, cdir)
    val kClu = graft.operators.Similarity.autoCellCount(nC.toLong)
    println(f"[hyb] CLUSTERED n=$nC cells=$kClu: bounds kept " +
      f"${ccand.size}/$kClu cells (pruned ${kClu - ccand.size}) — first " +
      f"probe incl. build ${(System.nanoTime() - t4) / 1e9}%.2f s")
    def cTop20(scoped: org.apache.spark.sql.DataFrame): Seq[String] =
      scoped.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(cqv))
        .select(col("vec_id").as("doc_id"),
          round(expr("cosine_sim(v, qv)"), 4).as("d_score"))
        .orderBy(col("d_score").desc, col("doc_id")).limit(20)
        .collect().map(_.toString).toSeq
    val probed = cTop20(cidx.where(col("cid").isin(ccand: _*)))
    val brute = cTop20(cidx)
    println(s"[hyb] CLUSTERED probed==brute top-20: ${probed == brute}")
    spark.stop()
  }
}
