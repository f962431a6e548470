package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Traversals

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("drive").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val scc = graft.SparkEntry.queries("q_graph_scc")(spark, d).collect()
    val core = scc.filter(_.getAs[Long]("component") == 48L).map(_.getAs[Long]("vertex"))
    println(s"[drive] core size ${core.length}: ${core.sorted.take(40).mkString(",")}")
    // rebuild edges like sccEdges via the public scc entry's shape:
    // recompute from orders directly
    val o = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey").cast("long").as("k"))
    val ring = o.select((col("k") % 128).as("src")).distinct()
      .withColumn("dst",
        when(col("src") % 16 < 15, col("src") + 1).otherwise(col("src") - 15))
    def cross(filterMod: Long, srcRing: org.apache.spark.sql.Column,
              dstRing: org.apache.spark.sql.Column) =
      o.where((col("k") % filterMod === 0) &&
          ((col("k") * 7) % 8 < (col("k") * 3) % 8))
        .select((srcRing * 16 + col("k") % 16).as("src"),
          (dstRing * 16 + shiftright(col("k"), 4) % 16).as("dst"))
        .distinct()
    val dn = cross(13, (col("k") * 7) % 8, (col("k") * 3) % 8)
    val up = cross(997, (col("k") * 3) % 8, (col("k") * 7) % 8)
    val edges = ring.union(dn).union(up).distinct().localCheckpoint(true)
    println(s"[drive] edges=${edges.count()} dn=${dn.count()} up=${up.count()}")
    val cv = spark.createDataFrame(spark.sparkContext.parallelize(
      core.toSeq.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vertex",
          org.apache.spark.sql.types.LongType))))
    val fwd = Traversals.reachableFrom(edges, cv)
    val bwd = Traversals.reachableFrom(
      edges.select(col("dst").as("src"), col("src").as("dst")), cv)
    println(s"[drive] fwd=${fwd.count()} bwd=${bwd.count()}")
    spark.stop()
  }
}
