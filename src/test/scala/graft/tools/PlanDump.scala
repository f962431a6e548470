package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of the named inventory queries
  * (args: sfDir then query names) — the .explain feedback loop the
  * plan audits in PLANS.md are written from. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("plandump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.count() // force AQE final plan
      println(s"==== $q ====")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
