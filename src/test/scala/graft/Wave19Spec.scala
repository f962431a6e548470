package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the wave-19 additions (k-truss peel, winnowing
  * fingerprints, blocked entity resolution). */
class Wave19Spec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("ktruss: matches an independent in-memory 2-round peel") {
    val edges = graft.queries.Tables.t(spark, TestSpark.sfDir, "orders")
      .select((col("o_orderkey") % 300).as("x"), (col("o_custkey") % 300).as("y"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))

    def peel(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = es.foldLeft(Map.empty[Long, Set[Long]]) { case (m, (a, b)) =>
        m.updated(a, m.getOrElse(a, Set.empty) + b)
          .updated(b, m.getOrElse(b, Set.empty) + a)
      }
      es.iterator.map { case (a, b) =>
        (a, b) -> (adj(a) & adj(b)).size.toLong
      }.toMap
    }
    var cur = edges.toSet
    var sup = Map.empty[(Long, Long), Long]
    (1 to 2).foreach { _ =>
      sup = peel(cur)
      cur = cur.filter(e => sup(e) >= 2)
    }
    val expected = cur.toSeq.map(e => (e._1, e._2, sup(e))).sorted
    val got = run("q_graph_ktruss").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got === expected)
  }

  test("winnow: fingerprint counts bounded by complete windows; short docs 0") {
    val docs = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        size(split(trim(lower(col("text"))), "\\s+")).as("n_tok"))
    val r = run("q_text_winnow").join(docs, "doc_id").cache()
    try {
      assert(r.count() > 0)
      // complete windows = max(n_shingles - w + 1, 0), n_shingles = n_tok - 2
      assert(r.where(col("n_fp") > greatest(col("n_tok") - 6, lit(0)))
        .count() === 0)
      // any doc with >= 7 tokens has at least one complete window
      assert(r.where(col("n_tok") >= 7 && col("n_fp") === 0).count() === 0)
      assert(r.where(col("n_fp") > 0 && col("min_fp") > col("max_fp"))
        .count() === 0)
    } finally r.unpersist()
  }

  test("er: matches are same-block pairs at true edit distance <= 2") {
    val c = graft.queries.Tables.t(spark, TestSpark.sfDir, "customer")
    val r = run("q_er_match").cache()
    try {
      assert(r.count() > 0)
      assert(r.where(col("a") >= col("b") || !col("dist").between(0, 2))
        .count() === 0)
      // re-derive each matched pair's block keys + UNthresholded
      // levenshtein; they must agree with the blocked/banded result
      val xa = c.select(col("c_custkey").as("a"), col("c_name").as("na"),
        col("c_nationkey").as("nata"), col("c_mktsegment").as("sega"))
      val xb = c.select(col("c_custkey").as("b"), col("c_name").as("nb"),
        col("c_nationkey").as("natb"), col("c_mktsegment").as("segb"))
      val bad = r.join(xa, "a").join(xb, "b")
        .where(col("nata") =!= col("natb") || col("sega") =!= col("segb") ||
          levenshtein(col("na"), col("nb")) =!= col("dist"))
      assert(bad.count() === 0)
    } finally r.unpersist()
  }
}
