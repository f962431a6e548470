package graft

import org.apache.spark.sql.functions._
import graft.operators.Traversals

/** r14 wave: DFS residual settle + supporting invariants. */
class Wave29Spec extends SparkSpec {
  import spark.implicits._

  test("dfsLeafResidual settles the scaladoc counterexample exactly") {
    // 0→1, 0→2, 1→3, 3→2: vertex 3 is rule-undecided (its only
    // out-neighbor 2 has two possible discoverers), but the
    // deterministic DFS visits 0,1,3 then discovers 2 FROM 3 —
    // replay must settle 3 = internal, 2 = leaf
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (3L, 2L)).toDF("src", "dst")
    val r = Traversals.dfsLeafResidual(e, 0L).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getString(2))).toMap
    assert(r(3L) === ("undecided", "internal"))
    assert(r(2L) === ("leaf", "leaf"))
    assert(r(0L)._2 === "internal")
    assert(r(1L)._2 === "internal")
  }

  test("dfsLeafResidual final classes equal the full dfsLeaves replay on random digraphs") {
    val rnd = new scala.util.Random(14L)
    for (trial <- 1 to 8) {
      val n = 12 + rnd.nextInt(20)
      val edges = (1 to n * 3).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) :+ (0L, 1L + rnd.nextInt(n - 1))
      val e = edges.toDF("src", "dst")
      val fullLeaves = Traversals.dfsLeaves(e, 0L).collect()
        .map(_.getLong(0)).toSet
      val res = Traversals.dfsLeafResidual(e, 0L).collect()
      val resLeaves = res.filter(_.getString(2) == "leaf").map(_.getLong(0)).toSet
      assert(resLeaves === fullLeaves, s"trial=$trial edges=$edges")
      // rule classes never contradict the exact classes
      for (row <- res) {
        val (rule, fin) = (row.getString(1), row.getString(2))
        if (rule != "undecided") assert(rule === fin,
          s"sound rule contradicted at ${row.getLong(0)} (trial=$trial)")
      }
    }
  }

  test("certain-parent back-edge reduction lets the residual replay fit a tighter bound") {
    // chain 0→1→2→3→4 with every back-edge k→k−1: each vertex's only
    // in-neighbor is its chain parent, so all 4 back-edges drop and
    // the residual adjacency is exactly the 4 chain edges — a replay
    // bound of 4 suffices where the raw reachable set has 8
    val chain = (0L to 3L).map(k => (k, k + 1))
    val back = (1L to 4L).map(k => (k, k - 1))
    val e = (chain ++ back).toDF("src", "dst")
    // full replay input (r13 reduction only) keeps all 8 edges minus
    // the into-start backedge 1→0 ⇒ 7 > 4, so dfsLeaves at bound 4 refuses
    intercept[IllegalArgumentException] {
      Traversals.dfsLeaves(e, 0L, maxReplayEdges = 4L)
    }
    // the residual path reduces to the 4 chain edges and settles
    val r = Traversals.dfsLeafResidual(e, 0L, maxResidualEdges = 4L).collect()
      .map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r === Map(0L -> "internal", 1L -> "internal", 2L -> "internal",
      3L -> "internal", 4L -> "leaf"))
  }

  test("scaledCovarianceBlocked is bit-identical across block sizes") {
    import graft.operators.Similarity
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val x = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("j0", "x0")))
      .select(col("vec_id"), (col("j0") + 1).as("j"),
        round(col("x0").cast("double"), 6).cast("decimal(18,6)").as("x"))
    val g = x.groupBy("j").agg(sum(col("x")).cast("decimal(24,6)").as("sx"),
      count(lit(1)).cast("decimal(6,0)").as("n"))
    val yArr = x.join(broadcast(g), "j")
      .select(col("vec_id"), col("j"),
        (col("x") * col("n") - col("sx")).cast("decimal(18,6)").as("y"))
      .groupBy("vec_id")
      .agg(expr("transform(sort_array(collect_list(struct(j, y))), s -> s.y)").as("ya"))
      .localCheckpoint(true)
    def cells(blockDim: Int) =
      Similarity.scaledCovarianceBlocked(yArr, d = 64, blockDim = blockDim)
        .selectExpr("CAST(j AS BIGINT) AS j", "CAST(k AS BIGINT) AS k", "mjk")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDecimal(2)).toMap
    val single = cells(64)
    val blocked = cells(16)
    assert(single.size === 64 * 64)
    assert(blocked.size === 64 * 64)
    // exact-decimal equality, cell by cell — blocking must not change
    // a single term's sum
    assert(single === blocked)
  }

  test("streaming IVF upsert is arrival-order independent and equals the batch rebuild") {
    import graft.operators.Similarity
    import graft.functions.VectorFunctions.toDouble
    graft.functions.expressions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val cents = e.where(col("vec_id").between(1, 8))
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val isArrival = (col("vec_id") % 10 === 0) && col("vec_id") > 8
    val batchRebuild = Similarity.assignCells(e, cents)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def streamed(order: Seq[String]): Map[Long, Long] = {
      val raw = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      val outDir = java.nio.file.Files.createTempDirectory("graft-upsert-spec-out")
      val streamDir = java.nio.file.Files.createTempDirectory("graft-upsert-spec-in")
      try {
        // base index content = non-arrivals
        Similarity.assignCells(e.where(!isArrival), cents)
          .select("vec_id", "cid")
          .write.mode("overwrite").parquet(outDir.resolve("idx").toString)
        val chunks = Map(
          "a" -> raw.where(isArrival && col("vec_id") % 20 === 0),
          "b" -> raw.where(isArrival && col("vec_id") % 20 =!= 0))
        order.zipWithIndex.foreach { case (tag, i) =>
          val stage = streamDir.resolve(s"_st_$i")
          chunks(tag).coalesce(1).write.parquet(stage.toString)
          val ls = java.nio.file.Files.list(stage)
          try ls.forEach(f => if (f.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.move(f, streamDir.resolve(s"c$i.parquet")))
          finally ls.close()
        }
        val stream = spark.readStream.schema(raw.schema)
          .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
        val q = stream.writeStream.foreachBatch(
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            Similarity.assignCells(
                batch.select(col("vec_id"), toDouble(col("embedding")).as("v")), cents)
              .select("vec_id", "cid")
              .write.mode("append").parquet(outDir.resolve("idx").toString)).start()
        try q.processAllAvailable() finally q.stop()
        spark.read.parquet(outDir.resolve("idx").toString).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally {
        def rm(dir: java.nio.file.Path): Unit = {
          import scala.jdk.CollectionConverters._
          if (java.nio.file.Files.exists(dir))
            java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
              .foreach(p => try java.nio.file.Files.deleteIfExists(p)
                catch { case _: Throwable => () })
        }
        rm(streamDir); rm(outDir)
      }
    }
    val ab = streamed(Seq("a", "b"))
    val ba = streamed(Seq("b", "a"))
    assert(ab === batchRebuild, "streamed upsert (a,b) != batch rebuild")
    assert(ba === batchRebuild, "streamed upsert (b,a) != batch rebuild")
  }

  test("batch PPR slices are bit-identical to the single-seed operator") {
    import graft.operators.Traversals
    val e = (Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L),
      (1L, 4L))).toDF("src", "dst")
    val batch = Traversals.personalizedPageRankBatch(e, Seq(0L, 3L), iters = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (seed <- Seq(0L, 3L)) {
      val single = Traversals.personalizedPageRank(e, Seq(seed), iters = 8)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for ((v, rank) <- single)
        assert(batch((seed, v)) === rank, s"seed=$seed v=$v")
      assert(single.keySet === batch.keySet.filter(_._1 == seed).map(_._2))
    }
  }

  test("dfsLeafResidual skips the replay when rules settle everything") {
    // pure out-tree: every vertex is rule-certain
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    // maxResidualEdges=0 would refuse any replay — proving none runs
    val r = Traversals.dfsLeafResidual(e, 0L, maxResidualEdges = 0L).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getString(2))).toMap
    assert(r(3L) === ("leaf", "leaf"))
    assert(r(4L) === ("leaf", "leaf"))
    assert(r(2L) === ("leaf", "leaf"))
    assert(r(1L) === ("internal", "internal"))
    assert(r(0L) === ("internal", "internal"))
  }
}
