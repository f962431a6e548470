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
    // max out-degree 19 = 12 NN + 3 skip ranks + 4 cross-cell links
    // (the r20 (12,4) re-pin)
    assert(deg.values.max <= 19, s"degree ${deg.values.max} > 19")
    // navigability: the long edges actually exist on this fixture —
    // some vertex carries more than the 12 proximity edges (skip rank
    // 16 needs a >=17-member cell; the 500-row/8-cell fixture has
    // them), and cross-cell designation gives ~4 extra per vertex
    assert(deg.values.max >= 14, "no long edges — graph degenerated to in-cell NN")
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
    assert(crossing <= 4 * cell.size, "more cross links than 4 per vertex")
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

  test("q_embed_nsw_recall: readout is internally consistent with its parts") {
    val r = SparkEntry.queries("q_embed_nsw_recall")(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    val hits = row.getAs[Long]("hits")
    assert(hits >= 0 && hits <= 8)
    assert(row.getAs[Double]("recall_at_8") === hits / 8.0)
    val rb = row.getAs[Double]("routed_best")
    val eb = row.getAs[Double]("exact_best")
    // the walk can never beat the exact best, and the ratio is the
    // quotient of the two already-rounded bests
    assert(rb <= eb && eb <= 1.0 && rb >= -1.0)
    assert(row.getAs[Double]("ratio") ===
      BigDecimal(rb / eb).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the navigable graph must actually retrieve on the fixture —
    // the r18 topology scored 0 here
    assert(hits >= 1, "routed walk retrieved nothing from the exact top-8")
  }

  test("q_stream_postings_upsert equals the batch-derived sparse ranking") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_stream_postings_upsert")(spark, dir)
      .collect().map(_.toString).toSeq
    // batch re-derivation straight from the documents table (the
    // maintained index must be content-identical to this)
    val docs = graft.queries.Tables.t(spark, dir, "documents")
    val tok = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val df_ = tok.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val tots = dl.agg(count(lit(1)).cast("double").as("n"),
      sum("dl").cast("double").as("tt"))
    val qt = tok.where(col("doc_id") === 0).select("term").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("s_score").desc, col("doc_id"))
    val want = tf.join(qt, "term").where(col("doc_id") =!= 0)
      .join(df_, "term").join(dl, "doc_id").crossJoin(broadcast(tots))
      .withColumn("idf", round(
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 6))
      .withColumn("c0", round(col("idf") * (col("tf") * 2.2) /
        (col("tf") + lit(1.2) *
          (lit(0.25) + lit(0.75) * col("dl") * col("n") / col("tt"))), 4))
      .groupBy("doc_id")
      .agg(sum(col("c0").cast("decimal(18,4)")).cast("double").as("s_score"))
      .orderBy(col("s_score").desc, col("doc_id")).limit(20)
      .withColumn("rs", row_number().over(w))
      .select(col("doc_id"), col("s_score"), col("rs"))
      .orderBy("rs").collect().map(_.toString).toSeq
    assert(got === want,
      "streamed postings diverged from the batch derivation")
  }

  test("q_embed_nsw_batch: 4 independent walks, no self-retrieval, ranked frontiers") {
    val rows = SparkEntry.queries("q_embed_nsw_batch")(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rk"),
        r.getAs[Long]("vertex"), r.getAs[Double]("score")))
    val qids = rows.map(_._1).distinct
    assert(qids.length === 4, s"expected 4 query walks, got ${qids.toSeq}")
    // deterministic query selection: lowest corpus ids ≡ 5 (mod 10)
    assert(qids.forall(q => q % 10 == 5 && q != 0))
    rows.groupBy(_._1).foreach { case (qid, fr) =>
      assert(fr.length <= 4 && fr.nonEmpty)
      // a query never retrieves itself
      assert(fr.forall(_._3 != qid), s"walk $qid retrieved itself")
      // frontier scores descending in rank order
      val byRk = fr.sortBy(_._2).map(_._4)
      assert(byRk.zip(byRk.tail).forall { case (a, b) => b <= a },
        s"walk $qid frontier not rank-ordered: ${byRk.toSeq}")
    }
  }
}
