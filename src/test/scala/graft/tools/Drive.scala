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
    graft.functions.expressions.GraftFunctions.register(spark)
    // Drive q_embed_pca through the public queries surface at two SFs:
    // print the full 64-dim loading vector + eigenvalue, check unit
    // norm, and cross-check the eigenvalue against a driver-side
    // Rayleigh quotient computed from raw parquet (independent path).
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val out = graft.SparkEntry.queries("q_embed_pca")(spark, s"/root/testdata/$sf")
        .collect().sortBy(_.getAs[Int]("dim"))
      val v = out.map(_.getAs[Double]("loading"))
      val ev = out.head.getAs[Double]("eigenvalue")
      println(s"[drive] $sf eigenvalue=$ev norm=${math.sqrt(v.map(x => x * x).sum)}")
      println(s"[drive] $sf loadings head=${v.take(8).mkString(",")}")
      // independent Rayleigh quotient v'Cv on the raw data
      val rows = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .select(expr("transform(embedding, x -> cast(x as double))").as("e"))
        .collect().map(_.getSeq[Double](0).toArray)
      val n = rows.length.toDouble
      val mu = Array.tabulate(64)(j => rows.map(_(j)).sum / n)
      val proj = rows.map(r => (0 until 64).map(j => (r(j) - mu(j)) * v(j)).sum)
      val rayleigh = proj.map(p => p * p).sum / n
      println(s"[drive] $sf rayleigh=$rayleigh (reported $ev, ratio ${rayleigh / ev})")
    }
    spark.stop()
  }
}
