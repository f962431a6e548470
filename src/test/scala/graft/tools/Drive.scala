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
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    println(s"[drive] heap=${Runtime.getRuntime.maxMemory() / (1L << 20)}MiB")
    // fixed-work spin probe: single-thread ms for a fixed loop
    def spin(): Double = {
      val t0 = System.nanoTime(); var x = 0L; var i = 0
      while (i < 200000000) { x += i * 31; i += 1 }
      if (x == 42) println(x)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[drive] spin_pre=${spin()}%.3f")

    graft.functions.expressions.GraftFunctions.register(spark)
    // build the SAME staged edge table both variants iterate over
    val eo = {
      val edges = spark.read.parquet(s"$d/lineitem.parquet")
        .select((col("l_orderkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      val t = graft.operators.Traversals.pageRankEdgeTable(edges)
      t.count() // materialize the cache
      t
    }

    def newVariant(): Unit =
      graft.operators.Traversals.pageRankDeterministicStaged(eo, iters = 5)
        .select(col("vertex"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("vertex")).limit(20).collect()

    def oldVariant(): Unit = {
      val verts = eo.select(col("src").as("vertex"))
        .union(eo.select(col("dst").as("vertex"))).distinct()
        .localCheckpoint(true)
      val zeros = verts.select(col("vertex"),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)").as("w"))
      var r = verts.withColumn("rank", lit(1.0))
      (1 to 5).foreach { _ =>
        val contrib = eo.join(r, eo("src") === r("vertex"))
          .select(eo("dst").as("vertex"),
            (col("rank") / col("odeg")).cast("decimal(38,18)").as("w"))
        r = contrib.union(zeros).groupBy("vertex")
          .agg((lit(0.15) + lit(0.85) * sum(col("w")).cast("double")).as("rank"))
      }
      r.select(col("vertex"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("vertex")).limit(20).collect()
    }

    newVariant(); oldVariant() // JIT both
    for (label <- Seq("old", "new", "old", "new", "old", "new")) {
      val t0 = System.nanoTime()
      if (label == "old") oldVariant() else newVariant()
      println(f"[drive] $label%-4s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    println(f"[drive] spin_post=${spin()}%.3f")
    // one-superstep plans
    val verts = eo.select(col("src").as("vertex"))
      .union(eo.select(col("dst").as("vertex"))).distinct()
    val zerosN = verts.select(col("vertex"), lit(0L).as("u"),
      lit(null).cast("decimal(38,18)").as("wbig"))
    val r0 = verts.withColumn("rank", lit(1.0))
    val stepNew = eo.join(r0, eo("src") === r0("vertex"))
      .select(eo("dst").as("vertex"), (col("rank") / col("odeg")).as("w"))
      .select(col("vertex"), expr("fixed18(w)").as("u"), col("w"))
      .select(col("vertex"), col("u"),
        when(col("u").isNull && col("w").isNotNull,
          col("w").cast("decimal(38,18)")).as("wbig"))
      .union(zerosN).groupBy("vertex")
      .agg(sum(expr("u div 1000000000")).as("shi"),
           sum(expr("u % 1000000000")).as("slo"),
           sum(col("wbig")).as("sbig"))
      .select(col("vertex"),
        (lit(0.15) + lit(0.85) * expr("fixed_combine(shi, slo, sbig)")).as("rank"))
    println("[drive] ===== NEW PLAN =====")
    println(stepNew.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
