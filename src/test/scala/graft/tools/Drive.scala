package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("drive").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, Similarity}
    import graft.functions.VectorFunctions.toDouble
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val sig = Dedup.minhashSignatures(docs, 16, 3)
      // reproduce bandRows: 4 bands of 4 components
      val bandDf = sig.select(col("doc_id"), posexplode(
        array((0 until 4).map(b =>
          concat_ws("", slice(col("sig"), b * 4 + 1, 4))).toIndexedSeq: _*)))
        .toDF("doc_id", "band_id", "bkey")
      val top = bandDf.groupBy("band_id", "bkey").count()
        .agg(max("count"), expr("percentile(count, 0.999)")).head()
      println(s"[drive] $sf minhash max bucket=${top.get(0)} p999=${top.get(1)} docs=${docs.count()}")
      val e = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val bands = Similarity.lshBandBuckets(e, 4, 8, 64)
      val t2 = bands.groupBy("band_id", "bucket").count()
        .agg(max("count"), expr("percentile(count, 0.999)")).head()
      println(s"[drive] $sf embed max bucket=${t2.get(0)} p999=${t2.get(1)} vecs=${e.count()}")
    }
    spark.stop()
  }
}
