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
    val d = "/root/testdata/sf0.001"
    import graft.queries.Tables.t
    val ex = t(spark, d, "embeddings")
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .toDF("vec_id", "label", "pos", "x0")
      .select(col("vec_id"), col("label"), col("pos"),
        round(col("x0").cast("double"), 6).as("x"))
    val mu = ex.groupBy("label", "pos").agg(
      round(sum(col("x").cast("decimal(38,18)")).cast("double") /
        count(lit(1)), 6).as("mu"))
    val d2 = ex.join(broadcast(mu), Seq("label", "pos"))
      .select(col("vec_id"), col("label"),
        round((col("x") - col("mu")) * (col("x") - col("mu")), 8)
          .cast("decimal(38,18)").as("t"))
      .groupBy("vec_id", "label")
      .agg(round(sum(col("t")).cast("double"), 6).as("d2"))
      .localCheckpoint(true)
    val st = d2.groupBy("label").agg(
      round(sum(col("d2").cast("decimal(38,18)")).cast("double") /
        count(lit(1)), 6).as("m"))
    val va = d2.join(broadcast(st), "label")
      .select(col("label"), col("m"),
        round((col("d2") - col("m")) * (col("d2") - col("m")), 8)
          .cast("decimal(38,18)").as("q"))
      .groupBy("label", "m")
      .agg(round(sqrt(round(sum(col("q")).cast("double") /
        count(lit(1)), 8)), 6).as("sd"))
    val z = d2.join(broadcast(va), "label")
      .where(col("vec_id") === 252)
      .select(col("vec_id"), col("d2"), col("m"), col("sd"),
        ((col("d2") - col("m")) / col("sd")).as("zraw"),
        round((col("d2") - col("m")) / col("sd"), 4).as("z"))
    z.collect().foreach { r =>
      println(s"[drive] vec=${r.getAs[Long]("vec_id")} d2=${r.getAs[Double]("d2")} m=${r.getAs[Double]("m")} sd=${r.getAs[Double]("sd")} zraw=${r.getAs[Double]("zraw")} z=${r.getAs[Double]("z")}")
    }
    spark.stop()
  }
}
