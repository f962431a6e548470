package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the wave-20 additions (square counting, HLL
  * merge rollup, MinHash accuracy readout, catalog version diff). */
class Wave20Spec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("squares: total matches an independent in-memory diagonal count") {
    val edges = graft.queries.Tables.t(spark, TestSpark.sfDir, "orders")
      .select((col("o_orderkey") % 150).as("x"), (col("o_custkey") % 150).as("y"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.foldLeft(Map.empty[Long, Set[Long]]) { case (m, (a, b)) =>
      m.updated(a, m.getOrElse(a, Set.empty) + b)
        .updated(b, m.getOrElse(b, Set.empty) + a)
    }
    val verts = adj.keys.toSeq.sorted
    var sumC2 = 0L
    for (i <- verts.indices; j <- (i + 1) until verts.size) {
      val c = (adj(verts(i)) & adj(verts(j))).size.toLong
      sumC2 += c * (c - 1) / 2
    }
    val expectedTotal = sumC2 / 2
    val r = run("q_graph_squares").collect()
    assert(r.nonEmpty)
    assert(r.map(_.getAs[Long]("total_squares")).distinct.toSeq === Seq(expectedTotal))
    // per-row consistency: nsq = C(cn, 2)
    assert(r.forall(row =>
      row.getAs[Long]("nsq") == row.getAs[Long]("cn") * (row.getAs[Long]("cn") - 1) / 2))
  }

  test("hll merge: _all estimate equals a direct build over all rows") {
    val rows = run("q_sketch_hll_merge").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // direct register build over ALL events, same derivation
    val e = graft.queries.Tables.events(spark, TestSpark.sfDir)
      .select(col("user_id").cast("string").as("k"))
    val h = md5(concat(lit("hll|"), col("k")))
    val direct = e.select(
        (conv(substring(h, 1, 8), 16, 10).cast("long") % 64).cast("int").as("idx"),
        conv(substring(h, 9, 8), 16, 10).cast("long").as("v"))
      .select(col("idx"), when(col("v") === 0, lit(33))
        .otherwise(lit(33) - length(bin(col("v")))).as("rho"))
      .groupBy("idx").agg(max("rho").as("m"))
      .agg(sum(pow(lit(2.0), -col("m"))).as("ssum"), count(lit(1)).as("nreg"))
      .select(round(lit(0.709) * 4096.0 /
        (col("ssum") + (lit(64) - col("nreg")) * 1.0), 4).as("est"))
      .head().getDouble(0)
    assert(rows.contains("_all"))
    assert(rows("_all")._2 === direct,
      "merged-register estimate must equal the direct over-all-rows build")
  }

  test("minhash acc: estimates and true jaccard are sane per candidate") {
    val r = run("q_dedup_minhash_acc").cache()
    try {
      assert(r.count() > 0)
      assert(r.where(!col("est").between(0.0, 1.0) ||
        !col("jac").between(0.0, 1.0)).count() === 0)
      // candidate pairs are unique and ordered
      assert(r.where(col("doc_a") >= col("doc_b")).count() === 0)
      assert(r.select("doc_a", "doc_b").distinct().count() === r.count())
    } finally r.unpersist()
  }

  test("catalog diff: closed-form added/removed fingerprints") {
    val m = run("q_catalog_diff").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // added = delta rows k=0..9 -> dst k+100; removed = base k=20..24 -> k/2
    assert(m("added") === ((10L, (0 until 10).map(_ + 100L).sum)))
    assert(m("removed") === ((5L, (20 until 25).map(_ / 2L).sum)))
  }
}
