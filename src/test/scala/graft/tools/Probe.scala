package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.{Dedup, Traversals}
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    // probe: bands that don't divide k -> named error, not O(n^2) join
    try { Dedup.minhashPairs(docs, k = 16, bands = 5); println("BAD_BANDS_ACCEPTED!") }
    catch { case e: IllegalArgumentException => println("BAD_BANDS_REJECTED=" + e.getMessage.take(80)) }
    // probe: empty graph through connectedComponents -> empty result, no NPE
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    println("EMPTY_CC_ROWS=" + Traversals.connectedComponents(empty).count())
    // probe: empty graph through BFS -> start vertex only
    println("EMPTY_BFS=" + Traversals.bfs(empty, 7L).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).mkString(";"))
    spark.stop()
  }
}
