package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object Perf {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PERF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("perf")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    time("ngram_current")(Dedup.ngramJaccardPairs(docs).count())
    // alternative: precomputed arrays + codegen'd array_intersect
    def arrayVariant(): Long = {
      val gs = Dedup.shingleRows(docs, 3).distinct()
        .groupBy("doc_id").agg(collect_list(col("g")).as("gs"))
        .join(docs.select(col("doc_id"), col("lang"), col("source"),
          floor(col("n_chars") / 100).as("band")), "doc_id")
      val a = gs.select(col("doc_id").as("doc_a"), col("lang"), col("source"), col("band"), col("gs").as("ga"))
      val b = gs.select(col("doc_id").as("doc_b"), col("lang"), col("source"), col("band"), col("gs").as("gb"))
      a.join(b, Seq("lang","source","band")).where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("ga"), col("gb"))).cast("double") /
           size(array_union(col("ga"), col("gb"))).cast("double")).as("jac0"))
        .where(col("jac0") >= 0.15).count()
    }
    time("ngram_array")(println("  n=" + arrayVariant()))
    time("ngram_array_again")(arrayVariant())
    spark.stop()
  }
}
