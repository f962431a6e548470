package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 scale diagnosis for the embedding near-dup family: at a FIXED
  * LSH geometry (4 bands × 8 planes = 256 buckets/band) the candidate
  * pair volume is Σ_bucket C(n_b, 2) — quadratic in per-bucket
  * density, so a 10× corpus at the same geometry costs ~100× pairs
  * (the sf10 bench measured exactly this: the rescore join's shuffle
  * exceeded the sandbox's 78 GB of spill space). The production lever
  * is planesPerBand ~ log2(corpus/targetBucket): buckets scale WITH
  * the corpus and the pair volume returns to ~linear.
  *
  * This probe makes both halves measurable without materialising the
  * quadratic join: (1) the ANALYTIC candidate volume Σ C(n_b, 2) per
  * geometry — one hash agg over the band table, no join; (2) a timed
  * run of the full candidate→rescore pipeline at the SCALED geometry.
  *
  * args: [sfDir] [planesScaled]  (defaults /tmp/sf10, 12) */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf10")
    val planesScaled = if (args.length > 1) args(1).toInt else 12
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("lsh-scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.expressions.GraftFunctions.register(spark)

    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
      .localCheckpoint(true)
    val n = e.count()

    def candVolume(planes: Int): Long =
      graft.operators.Similarity.lshBandBuckets(e, bands = 4,
          planesPerBand = planes, dims = 64)
        .groupBy("band_id", "bucket").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).cast("long")).head().getLong(0)

    def pairs(planes: Int): DataFrame = {
      val raw = graft.operators.Similarity
        .lshBandBuckets(e, bands = 4, planesPerBand = planes, dims = 64)
        .localCheckpoint(true)
      val (bands, _) = graft.operators.Similarity.adaptiveSalt(raw,
        Seq("band_id", "bucket"), "vec_id",
        graft.operators.Similarity.maxBucketDefault)
      val cand = bands.select(col("vec_id").as("i"), col("band_id"), col("bucket"), col("salt"))
        .join(bands.select(col("vec_id").as("j"), col("band_id"), col("bucket"), col("salt")),
          Seq("band_id", "bucket", "salt"))
        .where(col("i") < col("j"))
        .select("i", "j").distinct()
      cand
        .join(e.select(col("vec_id").as("i"), col("v").as("va")), "i")
        .join(e.select(col("vec_id").as("j"), col("v").as("vb")), "j")
        .select(col("i"), col("j"),
          round(expr("cosine_sim(va, vb)"), 4).as("cos"))
        .where(col("cos") >= 0.4)
    }

    val v8 = candVolume(8)
    val vS = candVolume(planesScaled)
    println(f"[lsh-scale] n=$n cand_p8=$v8 cand_p$planesScaled=$vS " +
      f"(ratio ${v8.toDouble / math.max(1, vS)}%.1fx)")

    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val np = pairs(planesScaled).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[lsh-scale] rep$rep planes=$planesScaled pairs>=0.4: $np in $dt%.2f s")
    }
    spark.stop()
  }
}
