package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 1. does the live q_embed_topk plan keep cosine_sim inside WholeStageCodegen?
    val df = graft.SparkEntry.queries("q_embed_topk")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    println("PLAN_HAS_COSINE_IN_CODEGEN=" + plan.contains("cosine_sim"))
    println(plan.linesIterator.filter(l => l.contains("cosine_sim") || l.contains("WholeStageCodegen")).take(4).mkString("\n"))
    // 2. SQL misuse: wrong input type -> analysis error naming the function?
    graft.functions.expressions.GraftFunctions.register(spark)
    try { spark.sql("SELECT cosine_sim(1.0, 2.0)").collect(); println("WRONG_TYPE_ACCEPTED!") }
    catch { case e: Exception => println("WRONG_TYPE_ERROR=" + e.getMessage.linesIterator.next().take(120)) }
    // 3. null array input -> null out, not crash
    val r = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c").head()
    println("NULL_IN_NULL_OUT=" + r.isNullAt(0))
    spark.stop()
  }
}
