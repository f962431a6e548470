package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    // resize then feed the RESIZED payload back through feature extraction
    // (ops compose: resize -> features, the pipeline shape that matters)
    val resized = Multimodal.resize(docs, factor = 4)
    resized.show(3)
    val asDocs = resized.select($"doc_id", $"payload".cast("binary"))
      .withColumn("text", $"payload".cast("string")).drop("payload")
    val feats = Multimodal.extractFeatures(asDocs).collect()
    println("COMPOSED_FEATURES_OK=" + feats.forall(f => f.features.length == 8 && math.abs(f.features.sum - 1f) < 1e-3))
    // probe: factor 1 = identity; factor larger than payload -> 1 byte
    println("FACTOR1_IDENTITY=" + Multimodal.resize(docs, 1).collect().forall(m => m.resized_bytes == m.orig_bytes))
    println("FACTOR_HUGE=" + Multimodal.resize(docs, 100000).collect().forall(m => m.resized_bytes == 1))
    spark.stop()
  }
}
