package graft

/** Every inventory query runs at sf0.001 and yields a sane result.
  * (Value-level correctness is the driver's DuckDB oracle — replicated
  * locally by tools/oracle_check.py; this guards against runtime
  * regressions in `sbt test`.) */
class QueriesSmokeSpec extends SparkSpec {

  // pair/cluster queries whose tiny-SF fixture legitimately has no
  // qualifying pairs (and the empty-by-construction anti join)
  val nonEmptyExempt = Set("q_dedup_minhash", "q_dedup_ngram", "q_join_anti",
    "q_multimodal_dedup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.sfDir)
      val n = df.count()
      if (!nonEmptyExempt(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or a documented exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // dfs_leaves: traversal-order-dependent; approx: HLL estimator-
    // specific — both golden-tested instead (pagerank graduated to an
    // exact oracle via the deterministic decimal-sum implementation)
    assert(noOracle === Set("q_graph_dfs_leaves", "q_agg_approx"))
  }
}
