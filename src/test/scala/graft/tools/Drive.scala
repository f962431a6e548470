package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("drive").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    // count runtime-bloom subqueries in each memo-consuming dedup entry
    val names = Seq("q_dedup_minhash", "q_dedup_pipeline", "q_dedup_editdist",
      "q_text_bleu", "q_dedup_minhash_acc", "q_dedup_lsh_curve",
      "q_multimodal_agree", "q_dedup_ngram", "q_dedup_containment")
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, d)
        df.collect()
        val blooms = "might_contain".r
          .findAllIn(df.queryExecution.executedPlan.toString).size
        println(s"[drive] $n might_contain=$blooms")
      } catch { case e: Throwable =>
        println(s"[drive] $n FAILED ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
