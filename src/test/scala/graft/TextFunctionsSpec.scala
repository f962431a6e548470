package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c.as("r")).head().get(0)

  test("word_ngrams generator equals the window-lead shingleRows formulation") {
    graft.functions.expressions.GraftFunctions.register(spark)
    val docs = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents")
    val viaGen = docs.select(col("doc_id"), expr("word_ngrams(text, 3)"))
      .select(col("doc_id"), col("gram"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val viaWin = graft.operators.Dedup.shingleRows(docs, 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(viaGen.nonEmpty)
    assert(viaGen === viaWin)
    // positions are 0-based and contiguous per doc
    val pos = docs.select(col("doc_id"), expr("word_ngrams(text, 3)"))
      .groupBy("doc_id").agg(min("pos").as("p0"), max("pos").as("p1"),
        count(lit(1)).as("n"))
      .collect()
    pos.foreach(r => assert(r.getInt(1) === 0 &&
      r.getInt(2).toLong === r.getLong(3) - 1, s"non-contiguous: $r"))
  }

  test("tokens and shingles") {
    assert(one(tokenCount(col("text")), "The quick  brown fox") === 4)
    assert(one(wordShingles(col("text"), 3), "a b c d")
      .asInstanceOf[collection.Seq[String]].toList === List("a b c", "b c d"))
    assert(one(wordShingles(col("text"), 3), "a b").asInstanceOf[collection.Seq[String]].toList === Nil)
  }

  test("fingerprint: matches direct computation, order-sensitive") {
    val t = "abc"
    val expected = t.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    assert(one(fingerprint(col("text")), t) === expected)
    assert(one(fingerprint(col("text")), "acb") !== expected)
  }

  test("punct ratio and quality bounds") {
    assert(one(round(punctRatio(col("text")), 2), "ab!?") === 0.5)
    val q = one(qualityScore(col("text")),
      "the quick brown fox is a good dog and it runs to the park in town")
    assert(q.asInstanceOf[Double] > 0.5 && q.asInstanceOf[Double] <= 1.0)
  }

  test("langid picks the language with most stopword hits") {
    assert(one(langId(col("text")), "the cat is in the hat and it is good") === "en")
    assert(one(langId(col("text")), "el gato es un animal que vive en la casa") === "es")
    assert(one(langId(col("text")), "der hund ist ein tier und das ist gut") === "de")
    assert(one(langId(col("text")), "xyzzy plugh") === "und")
  }

  test("simhash16 stays within 16 bits and is deterministic") {
    val h1 = one(simhash16(col("text")), "hello world foo bar")
    val h2 = one(simhash16(col("text")), "hello world foo bar")
    assert(h1 === h2)
    assert(h1.asInstanceOf[Long] >= 0L && h1.asInstanceOf[Long] < 65536L)
  }
}
