package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for key queries; used to audit
  * pushdown / broadcast / codegen. Run: sbt "Test/runMain graft.tools.Plans [query...]" */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("plans")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_agg_groupby","q_join_broadcast","q_tpch_q3","q_sort_topk","q_embed_topk")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
