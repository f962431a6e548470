package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev driver: exercises the public API end-to-end.
  * Run: sbt "Test/runMain graft.tools.Drive" */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries

    // --- round-7 additions: results + the plan properties that make
    // them scale (WindowGroupLimit pushdown, broadcast eval probe)
    for (name <- Seq("q_sample_stratified", "q_mix_weights", "q_text_decontaminate")) {
      val df = q(name)(spark, sf)
      println(s"$name ROWS=" + df.count())
      df.show(5, false)
      val plan = df.queryExecution.executedPlan.toString
      println(s"$name WINDOWGROUPLIMIT=" + plan.contains("WindowGroupLimit"))
      println(s"$name BROADCASTJOIN=" + plan.contains("BroadcastHashJoin"))
    }
    spark.stop()
  }
}
