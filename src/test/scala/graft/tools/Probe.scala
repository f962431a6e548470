package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: DataFrame-CC pointer-jump count (rounds vs per-round cost)
  * on q_graph_cc (20-vertex chains) and the 15k-vertex order chains. */
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
    Seq("orders", "nation").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val chains = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey").as("src"),
        lead(col("o_orderkey"), 1).over(w).as("dst"))
      .where(col("dst").isNotNull).select(col("src"), col("dst"))
    for (round <- 1 to 2; j <- Seq(1, 2, 3)) {
      time(s"r$round cc_gate jumps=$j")({
        // the actual gate query graph (nations chains)
        val k = spark.read.parquet(s"$sfDir/nation.parquet")
          .select(col("n_nationkey").cast("long").as("k"))
        val e = k.where(col("k") < 10 || (col("k") >= 12 && col("k") < 20))
          .select(col("k").as("src"), (col("k") + 1).as("dst"))
        graft.operators.Traversals.connectedComponents(e, jumps = j).count()
      })
      time(s"r$round cc_chains15k jumps=$j")(
        graft.operators.Traversals.connectedComponents(chains, jumps = j).count())
    }
    spark.stop()
  }
}
