package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: print the scan nodes of the index-backed hybrid probe so
  * the pushed `term IN` filter is visible. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_hybrid_retrieval_indexed")(spark, d)
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    txt.linesIterator.foreach { l =>
      val t = l.trim
      if (t.startsWith("PushedFilters") || t.startsWith("PartitionFilters") ||
          t.startsWith("Location") || t.contains("Scan parquet"))
        println("[peek] " + t.take(260))
    }
    spark.stop()
  }
}
