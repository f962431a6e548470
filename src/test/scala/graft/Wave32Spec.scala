package graft

import org.apache.spark.sql.functions._

/** r18-verdict (round 19) pins:
  *   1. the routed-ANN proximity graph is NAVIGABLE — in-cell skip
  *      edges and cross-cell long links exist, degree stays bounded
  *      (verdict item 1; recall itself is priced by NswProbe and
  *      recorded in BASELINE.md, not unit-asserted — it is a measured
  *      quantity, not an invariant);
  *   2. the hybrid fusion readout (q_hybrid_ndcg) is internally
  *      consistent: the dense leg IS the pseudo-qrels ranking, so its
  *      row must read hits=10 / mrr=1 / ndcg=1 exactly (verdict
  *      item 2 — the definitional bias, pinned so it stays visible);
  *   3. the index-backed hybrid probe answers BIT-IDENTICALLY to the
  *      scan-bound sibling (verdict item 3 — the bound-pruned dense
  *      probe's exactness argument made observable).
  */
class Wave32Spec extends SparkSpec {

  private val dir = TestSpark.sfDir

  test("nswGraph: bounded-degree navigable topology (skip + cross-cell edges)") {
    val emb = graft.queries.Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val k = graft.operators.Similarity.autoCellCount(n)
    val g = graft.queries.PipelineQueries.nswGraph(spark, dir, k)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // no duplicate edges (the local/far union is disjoint by construction)
    assert(g.length === g.distinct.length, "duplicate edges in the union")
    // the query vertex is never routable, either side
    assert(g.forall { case (s, d0) => s != 0L && d0 != 0L })
    val deg = g.groupBy(_._1).view.mapValues(_.size)
    // max out-degree 10 = 5 NN + 3 skip ranks + 2 cross-cell links
    assert(deg.values.max <= 10, s"degree ${deg.values.max} > 10")
    // navigability: the long edges actually exist on this fixture —
    // some vertex carries more than the 5 proximity edges (skip rank
    // 16 needs a >=17-member cell; the 500-row/8-cell fixture has
    // them), and cross-cell designation gives ~2 extra per vertex
    assert(deg.values.max >= 7, "no long edges — graph degenerated to 5-NN")
    // cross-cell links: reconstruct the cell assignment and verify
    // at least one edge crosses cells (the r18 graph had zero)
    val e = emb.selectExpr("vec_id",
        "transform(embedding, x -> cast(x as double)) as v")
      .where(col("vec_id") =!= 0)
    val cents = e.where(col("vec_id").between(1, k))
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val cell = graft.operators.Similarity.assignCells(e, cents)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val crossing = g.count { case (s, d0) => cell(s) != cell(d0) }
    assert(crossing > 0, "no cross-cell edge — walk cannot leave entry cells")
    assert(crossing <= 2 * cell.size, "more cross links than 2 per vertex")
  }

  test("q_hybrid_retrieval_indexed answers bit-identically to the scan-bound sibling") {
    val scan = SparkEntry.queries("q_hybrid_retrieval")(spark, dir)
      .collect().map(_.toString).toSeq
    val probe = SparkEntry.queries("q_hybrid_retrieval_indexed")(spark, dir)
      .collect().map(_.toString).toSeq
    assert(probe === scan,
      "index-backed probe diverged from the scan-bound derivation")
  }

  test("q_hybrid_ndcg: dense leg is the truth by construction; legs bounded") {
    val rows = SparkEntry.queries("q_hybrid_ndcg")(spark, dir).collect()
      .map(r => r.getAs[String]("system") ->
        ((r.getAs[Long]("hits"), r.getAs[Double]("mrr"), r.getAs[Double]("ndcg"))))
      .toMap
    assert(rows.keySet === Set("dense", "fusion", "sparse"))
    // the named bias, pinned visible: qrels = exact cosine top-10 =
    // the dense leg's own ranking
    assert(rows("dense") === ((10L, 1.0, 1.0)),
      s"dense row ${rows("dense")} != the definitional (10, 1, 1)")
    rows.foreach { case (sys, (h, mrr, ndcg)) =>
      assert(h >= 0 && h <= 10, s"$sys hits $h")
      assert(mrr >= 0.0 && mrr <= 1.0, s"$sys mrr $mrr")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-12, s"$sys ndcg $ndcg")
      // any hit implies positive scores and vice versa
      assert((h > 0) === (ndcg > 0.0) && (h > 0) === (mrr > 0.0))
    }
    // how MUCH fusion keeps/loses is a measurement (BASELINE.md),
    // not an invariant — but on this fixed fixture the fusion
    // retaining at least one true top-10 doc is pinned behavior
    assert(rows("fusion")._1 >= 1, "fusion lost every qrel doc")
  }
}
