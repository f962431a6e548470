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
    // PERF_REPS>0: after the cold run, time `reps` warm executions and
    // print the median — single warm runs are noise-dominated below ~1s
    val reps = sys.env.getOrElse("PERF_REPS", "1").toInt
    names.foreach { n =>
      time(n + "_cold")(graft.SparkEntry.queries(n)(spark, sfDir).count())
      if (reps <= 1) time(n + "_warm")(graft.SparkEntry.queries(n)(spark, sfDir).count())
      else {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"PERF ${n}_median_of_$reps ${ts(ts.length / 2)}%.3f s (min ${ts.head}%.3f max ${ts.last}%.3f)")
      }
    }
    spark.stop()
  }
}
