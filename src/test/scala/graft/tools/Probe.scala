package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.graphx.{Edge, Graph}

/** Probe: GraphX edge-partition-count effect on Pregel superstep cost
  * (bfs_big / cc_big are the bench hotspots; hypothesis: per-superstep
  * scheduling overhead scales with task count, and 600k edges need
  * nowhere near 32 partitions). */
object Probe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("lineitem", "orders").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val bip0 = li.select((col("l_orderkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val bip = bip0.select(explode(array(
        struct(col("src").as("src"), col("dst").as("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val chains = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey").as("src"),
        lead(col("o_orderkey"), 1).over(w).as("dst"))
      .where(col("dst").isNotNull).select(col("src"), col("dst"))

    def bfs(edges: org.apache.spark.sql.DataFrame, parts: Int, start: Long): Long = {
      var rdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
      if (parts > 0) rdd = rdd.coalesce(parts)
      val g = Graph.fromEdges[Int, Unit](rdd, Int.MaxValue)
        .mapVertices((id, _) => if (id == start) 0 else Int.MaxValue)
      val res = g.pregel(Int.MaxValue)(
        (_, attr, msg) => math.min(attr, msg),
        t => if (t.srcAttr != Int.MaxValue && t.srcAttr + 1 < t.dstAttr)
               Iterator((t.dstId, t.srcAttr + 1)) else Iterator.empty,
        (a, b) => math.min(a, b))
      res.vertices.filter(_._2 != Int.MaxValue).count()
    }
    def cc(edges: org.apache.spark.sql.DataFrame, parts: Int): Long = {
      var rdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
      if (parts > 0) rdd = rdd.coalesce(parts)
      Graph.fromEdges[Unit, Unit](rdd, ()).connectedComponents().vertices.count()
    }
    val start = li.agg(min(col("l_orderkey")).cast("long")).head().getLong(0) * 2
    for (round <- 1 to 2; p <- Seq(0, 1, 2, 4, 8)) {
      time(s"r$round bfs_big parts=$p")(bfs(bip, p, start))
      time(s"r$round cc_big parts=$p")(cc(chains, p))
    }
    spark.stop()
  }
}
