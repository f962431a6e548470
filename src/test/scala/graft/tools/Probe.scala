package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{GraphCatalog, Traversals}
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("probe")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files.createTempDirectory("wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // realistic graph: 60k-edge bipartite from sf0.01 lineitem
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select((col("l_orderkey")*2).as("src"), (col("l_suppkey")*2+1).as("dst")).distinct()
    val edges = li.union(li.select(col("dst").as("src"), col("src").as("dst")))
    val cat = new GraphCatalog(spark, java.nio.file.Files.createTempDirectory("cat").toString)
    cat.addGraphBucketed("big", edges, buckets = 8)
    val b = cat.loadBucketed("big")
    println("BUCKETED_EDGES=" + b.count() + " PLAIN_EDGES=" + edges.count())
    // BFS over the bucketed load == BFS over the in-memory edges
    val a1 = Traversals.bfsLevels(b, 2L).groupBy("level").count().orderBy("level")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val a2 = Traversals.bfsLevels(edges, 2L).groupBy("level").count().orderBy("level")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    println("BFS_BUCKETED=" + a1.mkString(","))
    println("BFS_MATCH=" + (a1 == a2))
    // probe: overwrite the bucketed graph (last-writer-wins holds for tables too)
    cat.addGraphBucketed("big", edges.limit(100), buckets = 8)
    println("AFTER_OVERWRITE=" + cat.loadBucketed("big").count())
    spark.stop()
  }
}
