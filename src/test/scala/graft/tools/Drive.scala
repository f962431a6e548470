package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .appName("drive").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[drive] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    spark.read.parquet(s"$d/lineitem.parquet").count()
    val e0 = spark.read.parquet(s"$d/lineitem.parquet")
      .select((col("l_orderkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))

    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val outDeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("odeg"))
    val eo = e.join(outDeg, "src").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("eo materialize")(eo.count())
    val verts = time("verts from cache") {
      eo.select(col("src").as("vertex"))
        .union(eo.select(col("dst").as("vertex"))).distinct()
        .localCheckpoint(true)
    }
    val zeros = verts.select(col("vertex"),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)").as("w"))
    var r = verts.withColumn("rank", lit(1.0))
    (1 to 5).foreach { _ =>
      val contrib = eo.join(r, eo("src") === r("vertex"))
        .select(eo("dst").as("vertex"),
          (col("rank") / col("odeg")).cast("decimal(38,18)").as("w"))
      r = contrib.union(zeros)
        .groupBy("vertex")
        .agg((lit(0.15) + lit(0.85) * sum(col("w")).cast("double")).as("rank"))
    }
    time("5 supersteps + ckpt") { r = r.localCheckpoint(true) }
    time("topk")(r.orderBy(desc("rank")).limit(20).collect())
    // how much of a superstep is the decimal sum?
    val contrib1 = eo.join(r, eo("src") === r("vertex"))
      .select(eo("dst").as("vertex"),
        (col("rank") / col("odeg")).cast("decimal(38,18)").as("w"))
    time("1 superstep decimal") {
      contrib1.union(zeros).groupBy("vertex")
        .agg((lit(0.15) + lit(0.85) * sum(col("w")).cast("double")).as("rank")).count()
    }
    val contribD = eo.join(r, eo("src") === r("vertex"))
      .select(eo("dst").as("vertex"), (col("rank") / col("odeg")).as("w"))
    time("1 superstep double") {
      contribD.groupBy("vertex").agg(sum(col("w"))).count()
    }
    spark.stop()
  }
}
