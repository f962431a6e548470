package graft.tools
import org.apache.spark.sql.SparkSession

/** One-off scan: which inventory queries contain CartesianProduct /
  * BroadcastNestedLoopJoin nodes in their EXECUTED plans (post-AQE)?
  * Feeds the smoke-spec plan-lint allowlist.
  * Run: sbt "Test/runMain graft.tools.PlanLint" */
object PlanLint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("planlint")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        df.count()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
        val hits = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
        if (hits.nonEmpty) println(s"PLANLINT $name: ${hits.mkString(",")}")
      } catch {
        case e: Exception => println(s"PLANLINT $name: ERROR ${e.getClass.getSimpleName}")
      }
    }
    println("PLANLINT done")
    spark.stop()
  }
}
