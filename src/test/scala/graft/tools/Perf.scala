package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions._

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
    time("shingle_rows")(docs.select(col("doc_id"), explode(wordShingles(col("text"),3)).as("g")).count())
    time("signatures")(Dedup.minhashSignatures(docs).count())
    time("minhash_full")(Dedup.minhashPairs(docs).count())
    time("minhash_full_again")(Dedup.minhashPairs(docs).count())
    val shr = docs.select(col("doc_id"), col("lang"), col("source"),
        floor(col("n_chars") / 100).as("band"),
        explode(array_distinct(wordShingles(col("text"), 3))).as("g"))
    time("ngram_shr")(shr.count())
    val inter = shr.as("a").join(shr.as("b"),
        col("a.g") === col("b.g") && col("a.lang") === col("b.lang") &&
          col("a.source") === col("b.source") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
    time("ngram_interjoin_rows")(println("  inter=" + inter.count()))
    time("ngram_full")(Dedup.ngramJaccardPairs(docs).count())
    spark.stop()
  }
}
