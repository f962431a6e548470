package graft.tools
/** One-off: print inventory counts for doc consistency. */
object Counts {
  def main(args: Array[String]): Unit = {
    println(s"QUERIES=${graft.SparkEntry.queries.size}")
    println(s"ORACLES=${graft.SparkEntry.oracleSql.size}")
    println(s"HEADLINE=${graft.Bench.headline.size}")
    println(s"NO_ORACLE=${(graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet).toSeq.sorted.mkString(",")}")
  }
}
