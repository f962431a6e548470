package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("drive").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    // embed LSH pairs with/without forced salting: is the final pair
    // set invariant on the ORGANIC fixture when a tiny cap forces the
    // salted path?
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      val raw = Similarity.lshBandBuckets(e, bands = 4, planesPerBand = 8, dims = 64)
        .localCheckpoint(true)
      // bucket-size profile
      raw.groupBy("band_id", "bucket").count()
        .agg(max("count"), expr("percentile(count, 0.999)"), count(lit(1))).show()
      def pairs(cap: Int): Set[(Long, Long)] = {
        val (bands, splits) = Similarity.adaptiveSalt(raw, Seq("band_id", "bucket"), "vec_id", cap)
        println(s"[drive] $sf cap=$cap splits=${splits.count()}")
        val cand = bands.select(col("vec_id").as("i"), col("band_id"), col("bucket"), col("salt"))
          .join(bands.select(col("vec_id").as("j"), col("band_id"), col("bucket"), col("salt")),
            Seq("band_id", "bucket", "salt"))
          .where(col("i") < col("j"))
          .select("i", "j").distinct()
        val joined = cand
          .join(e.select(col("vec_id").as("i"), col("v").as("va")), "i")
          .join(e.select(col("vec_id").as("j"), col("v").as("vb")), "j")
        joined.select(col("i"), col("j"), round(expr("cosine_sim(va, vb)"), 4).as("cos"))
          .where(col("cos") >= 0.4)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val unsalted = pairs(Int.MaxValue)
      for (cap <- Seq(64, 16, 8, 4)) {
        val p = pairs(cap)
        println(s"[drive] $sf cap=$cap pairs=${p.size} unsalted=${unsalted.size} " +
          s"lost=${(unsalted -- p).size} gained=${(p -- unsalted).size}")
      }
    }
    spark.stop()
  }
}
