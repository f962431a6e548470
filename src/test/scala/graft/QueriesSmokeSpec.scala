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

  /** Plan lint: CartesianProduct is NEVER acceptable; a
    * BroadcastNestedLoopJoin only where the inventory deliberately
    * crosses a broadcast SCALAR / tiny-constant side (audited one by
    * one — centroid tables, query vectors, scalar-subquery totals,
    * the 25-row nation non-equi edge generator). A new query landing
    * a BNLJ outside this list is an unreviewed cross product. */
  val bnljAudited = Set(
    "q_dedup_pipeline",                              // corpus-total scalar
    "q_embed_ivf", "q_embed_ivf_multiprobe",         // broadcast centroid table
    "q_embed_kmeans", "q_embed_purity",              // broadcast centroids
    "q_embed_knn_join", "q_embed_pq",                // broadcast query/codebook side
    "q_embed_recall", "q_embed_rerank", "q_embed_topk", // broadcast query vector
    "q_embed_mips",                                  // broadcast query vector
    "q_embed_matryoshka",                            // broadcast query vector (three prefix rankings)
    "q_embed_spearman",                              // broadcast query vector + codes
    "q_embed_pca",                                   // broadcast 1-row norm scalar per step
    "q_embed_pca_sampled",                           // same pipeline body, same 1-row norm scalar
    "q_text_heaps",                                  // broadcast 16-row threshold table + 1-row max scalar
    "q_text_jsd",                                    // broadcast source-pair grid (sources² rows)
    "q_events_holt",                                 // broadcast 1-row smoothing state per unrolled step
    "q_graph_triads",                                // broadcast 1-row count scalars at the close
    "q_events_changepoint",                          // broadcast 1-row totals scalar
    "q_embed_ivf_indexed",                           // broadcast 1-row query vector (local)
    "q_embed_ivf_append",                            // broadcast 1-row query vector (local)
    "q_stream_ivf_upsert",                           // broadcast 1-row query vector (local)
    "q_embed_binary",                                // broadcast 1-row query vector + codes
    "q_embed_binary_recall",                         // broadcast 1-row query vector + codes
    "q_embed_ivfpq",                                 // broadcast 1-row query vector / cell
    "q_embed_ivfpq_residual",                        // broadcast 1-row query vector / cell
    "q_events_psi",                                  // broadcast 1-row min-day scalar
    "q_embed_ivf_delete",                            // broadcast 1-row query vector (local)
    "q_embed_ivf_compact",                           // broadcast 1-row query vector (local)
    "q_mix_doremi",                                  // broadcast scalar NLL totals
    "q_text_bm25",                                   // broadcast 1-row corpus totals
    "q_embed_classify",                              // broadcast 1-row weight vector
    "q_embed_classify_cal",                          // broadcast 1-row weight vector
    "q_sample_dsir",                                 // broadcast scalar token totals
    "q_agg_cramers",                                 // dims-sized grid cross + scalar totals
    "q_agg_theilsen",                                // broadcast 1-row median scalar
    "q_embed_maxsim",                                // dims-sized label-pair grid
    "q_events_funnel",                               // scalar step totals
    "q_events_ks",                                   // broadcast 1-row sample-size scalar
    "q_events_window_funnel",                        // scalar level totals
    "q_events_rfm",                                  // broadcast 1-row reference date
    "q_events_survival",                             // study-length days x users at-risk join
    "q_events_markov_attribution",                   // 1-row baseline scalar join
    "q_graph_clustcoef", "q_graph_triangles",        // 25-row nation non-equi generator / scalar terms
    "q_graph_squares",                               // broadcast 1-row total_squares scalar
    "q_graph_vcover",                                // four scalar-count crosses
    "q_sketch_hll", "q_text_lift", "q_text_lmscore", // scalar total / register fold
    "q_text_lmscore2",                               // broadcast vocab-size scalar
    "q_mix_kl",                                      // broadcast corpus-total scalar
    "q_graph_reciprocity",                           // scalar edge totals
    "q_subquery", "q_tpch_q22",                      // scalar subqueries
    // the derived-partsupp five: the derivation itself crossJoins ONE
    // broadcast scalar (the supplier count) into the part projection —
    // TpchQueries.partsupp; q11 adds the threshold scalar on top
    "q_tpch_q2", "q_tpch_q9", "q_tpch_q11", "q_tpch_q16", "q_tpch_q20",
    "q_profile_skew",                                // broadcast 1-row skew scalars
    "q_privacy_kanon",                               // broadcast 1-row k/singleton scalars
    "q_privacy_ldiversity",                          // broadcast 1-row l/homogeneous scalars
    "q_privacy_tcloseness",                          // bounded group×band spine + 1-row totals
    "q_sample_neyman",                               // broadcast 1-row weight-total scalar
    "q_layout_skipping",                             // broadcast 1-row max-orderkey scalar
    "q_embed_ivf_2level",                            // broadcast 1-row query vector / cell
    "q_embed_ivf_filtered",                          // broadcast 1-row query vector / probe cells
    "q_hybrid_retrieval",                            // broadcast 1-row totals + query vector
    "q_hybrid_retrieval_indexed",                    // broadcast 1-row query vector (staged-index probes)
    "q_hybrid_ndcg",                                 // broadcast 1-row totals/query/IDCG scalars
    "q_embed_nsw_recall",                            // broadcast 1-row query vector
    "q_stream_postings_upsert",                      // broadcast 1-row corpus-totals scalar
    "q_mix_shuffle")                                 // broadcast lang-count table + 1-row total

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.sfDir)
      val n = df.count()
      if (!nonEmptyExempt(name)) assert(n > 0, s"$name returned no rows")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — unbounded cross product")
      if (!bnljAudited(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unaudited BroadcastNestedLoopJoin — add it to " +
            "bnljAudited ONLY after confirming the broadcast side is scalar/tiny")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle — no exemptions remain") {
    // r11 retired the last exemption: q_graph_dfs_leaves (traversal-
    // order-dependent, golden-tested through r10) now has a list-state
    // recursive-CTE oracle that replays the sequential DFS exactly
    // (pagerank graduated earlier via deterministic decimal sums;
    // q_agg_approx via the deterministic-HLL + histogram-median
    // estimators)
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set.empty[String])
  }
}
