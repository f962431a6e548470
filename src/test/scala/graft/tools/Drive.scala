package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev driver: exercises the public API end-to-end.
  * Run: sbt "Test/runMain graft.tools.Drive"
  *
  * ROTATES per round: each round's drive targets that round's new
  * paths; past rounds' drivers (as-of NULL-key semantics, streaming
  * left-outer interval join, catalog append/compaction, ...) live in
  * git history, and the permanent coverage for those paths is the
  * ScalaTest suite — this main is a smoke/inspection tool, not the
  * regression gate. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries

    // --- round-8 additions: bloom runtime-filter join, CMS sketch,
    // per-edge jaccard, SCD-2 intervals (batch + streaming-executed),
    // repeated-span dedup, z-order layout clustering
    for (name <- Seq("q_join_bloom", "q_sketch_cms", "q_graph_jaccard",
        "q_events_scd2", "q_dedup_substring", "q_layout_zorder",
        "q_stream_scd2", "q_cdc_snapshot", "q_events_transitions",
        "q_basket_pairs", "q_events_twa", "q_graph_scc", "q_graph_scc_big",
        "q_quality_checks", "q_events_anomaly", "q_embed_pq",
        // wave-10: interval bin-join, streak patterns, MERGE upsert,
        // IVM partial-state merge, bitmap exact distinct, skyline,
        // rolling distinct, path mining, landmark closeness
        "q_join_interval", "q_window_pattern", "q_merge_upsert",
        "q_agg_incremental", "q_agg_bitmap", "q_skyline",
        "q_events_rolling_distinct", "q_events_paths", "q_graph_closeness",
        // wave-11: native bitmap agg, histogram quantiles, null-safe
        // join, containment dedup, personalized PR, eccentricity
        "q_agg_bitmap_native", "q_agg_histo_quantile", "q_join_nullsafe",
        "q_dedup_containment", "q_graph_ppr", "q_graph_eccentricity",
        // wave-12: exact-oracled HLL, window distinct, payload dedup,
        // streaming CDC apply, clustering coefficient, time travel
        "q_sketch_hll", "q_window_distinct", "q_multimodal_dedup",
        "q_stream_cdc", "q_graph_clustcoef", "q_catalog_timetravel",
        "q_udtf_ngrams", "q_agg_bitmap_intersect", "q_graph_bfs_bidir",
        "q_graph_subtree_sum", "q_events_growth", "q_text_lift",
        "q_asof_nearest", "q_source_evolution", "q_events_cohort",
        "q_graph_degree_dist", "q_text_vocab")) {
      val df = q(name)(spark, sf)
      println(s"$name ROWS=" + df.count())
      df.show(5, false)
    }
    // BloomPrune public API: build over a key set, probe selectivity
    val dim = graft.queries.Tables.t(spark, sf, "customer")
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bloom = graft.operators.BloomPrune.build(dim, "c_custkey", mBits = 1 << 14, h = 3)
    println("BLOOM_WORDS=" + bloom.length + " SET_BITS=" +
      bloom.map(java.lang.Long.bitCount).sum)
    val o = graft.queries.Tables.t(spark, sf, "orders")
    val kept = o.where(graft.operators.BloomPrune
      .mightContain(bloom, 1 << 14, 3, col("o_custkey"))).count()
    println(s"BLOOM_KEPT=$kept OF=" + o.count())

    // checkpoint hygiene: after an iterative operator, superseded
    // superstep blocks must be gone (only the final tables linger)
    graft.operators.Traversals.pageRankDeterministic(
      o.select((col("o_orderkey") % 500).as("src"), (col("o_custkey") % 500).as("dst")),
      iters = 5).count()
    val live = spark.sparkContext.getPersistentRDDs.size
    println(s"PERSISTENT_RDDS_AFTER_PAGERANK=$live")
    spark.stop()
  }
}
