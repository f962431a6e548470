package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: replicates Bench's session config and times the
  * named SparkEntry queries twice (cold/warm). */
object Perf {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PERF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("perf")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("lineitem", "orders", "customer", "nation", "documents", "embeddings")
      .foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => }
      }
    val names = if (args.nonEmpty) args.toSeq else Seq("q_graph_bfs_big", "q_graph_cc_big")
    names.foreach { n =>
      time(n + "_cold")(graft.SparkEntry.queries(n)(spark, sfDir).count())
      time(n + "_warm")(graft.SparkEntry.queries(n)(spark, sfDir).count())
    }
    spark.stop()
  }
}
