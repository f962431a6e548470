package graft

/** Property pins for the r17 wave-2 ANN additions: the graph-routed
  * search (q_embed_nsw) and the capacity-balanced IVF assignment
  * (q_embed_ivf_balanced). The gate oracles pin exact values; these
  * pin the INVARIANTS the operators exist for — a monotone improving
  * route, and population conservation under the cap. */
class GraphAnnSpec extends SparkSpec {

  private val dir = TestSpark.sfDir

  test("q_embed_nsw: trace is a monotone improving route from the entry vertex") {
    val rows = SparkEntry.queries("q_embed_nsw")(spark, dir)
      .collect().sortBy(_.getAs[Int]("hop"))
    assert(rows.length === 5, "4 fixed hops + the entry row")
    assert(rows.head.getAs[Int]("hop") === 0)
    assert(rows.head.getAs[Long]("vertex") === 1L, "deterministic entry vertex")
    val scores = rows.map(_.getAs[Double]("score"))
    // monotone by construction: current stays in its own candidate set
    scores.sliding(2).foreach { case Array(a, b) => assert(b >= a, s"route worsened: $a -> $b") }
    assert(rows.forall(_.getAs[Int]("cells") === 8), "fixture SFs land on the 8-cell clamp")
  }

  test("q_embed_ivf_balanced: population conserved, stayers capped, spill measured") {
    val rows = SparkEntry.queries("q_embed_ivf_balanced")(spark, dir).collect()
    assert(rows.nonEmpty)
    val n = graft.queries.Tables.t(spark, dir, "embeddings").count()
    val cap = rows.head.getAs[Long]("cap")
    assert(cap === (n + 7) / 8, "cap = ceil(n/k) at the fixture 8-cell clamp")
    // every vector lands exactly once, before and after balancing
    assert(rows.map(_.getAs[Long]("n_first")).sum === n)
    assert(rows.map(_.getAs[Long]("n_balanced")).sum === n)
    rows.foreach { r =>
      val stayers = r.getAs[Long]("n_first") - r.getAs[Long]("n_spill_out")
      assert(stayers <= cap, s"cell ${r.getAs[Long]("cid")} kept $stayers > cap $cap")
      assert(r.getAs[Long]("n_balanced") === stayers + r.getAs[Long]("n_spill_in"))
    }
    // the strict cap is the point: the fixture's natural skew must
    // actually exercise the spill path
    assert(rows.map(_.getAs[Long]("n_spill_out")).sum > 0, "no spill — cap never bound")
  }
}
