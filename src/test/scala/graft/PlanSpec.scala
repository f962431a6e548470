package graft

/** Physical-plan regression guards: the plan *properties* PLANS.md
  * documents — pushdown reaching the scan, broadcast joins on dims,
  * top-k without a global sort — asserted so a refactor that silently
  * loses them fails the suite, not just the benchmark. */
class PlanSpec extends SparkSpec {

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString

  test("q_filter_project: filters are pushed into the parquet scan") {
    val p = physical("q_filter_project")
    assert(p.contains("PushedFilters: ["), p.take(800))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("l_shipdate"),
      "date predicate must reach the scan")
  }

  test("q_join_broadcast and q_tpch_q5: dimensions broadcast") {
    assert(physical("q_join_broadcast").contains("BroadcastHashJoin"))
    val q5 = physical("q_tpch_q5")
    val n = "BroadcastHashJoin".r.findAllIn(q5).length
    assert(n >= 4, s"q5 should broadcast its dimension chain, got $n broadcast joins")
  }

  test("q_sort_topk: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = physical("q_sort_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("q_agg_groupby: partial+final hash aggregation (one shuffle)") {
    val p = physical("q_agg_groupby")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "partial+final hash agg expected")
  }

  test("rank-filter queries plan as WindowGroupLimit, not a full window sort") {
    // Spark 3.5+'s WindowGroupLimit pushes a rank()<=k / row_number()<=k
    // filter below the window, keeping only k rows per group on each
    // map side BEFORE the shuffle — the difference between sorting
    // every (doc, term) score at 100 TB and shuffling 3 rows per doc.
    val tfidf = physical("q_text_tfidf")
    assert(tfidf.contains("WindowGroupLimit"), tfidf.take(800))
    val rank = physical("q_window_rank")
    assert(rank.contains("WindowGroupLimit"), rank.take(800))
    // r10's driver bench recorded q_sample_stratified at 6x its steady
    // state; the number was exonerated as CPU steal (isolated 0.29 s),
    // but VERDICT r10 #2 asks the plan shape be pinned so a real loss
    // of the group-limit pushdown can never hide behind host noise
    val strat = physical("q_sample_stratified")
    assert(strat.contains("WindowGroupLimit"), strat.take(800))
  }

  test("q_asof_exec_bucketed: the bucketed reference side joins with ZERO exchange") {
    // the exec's design case (PLANS.md): a right side bucketed on the
    // key satisfies ClusteredDistribution straight off the scan, so the
    // ONLY shuffle in the whole as-of is the left (event) side — the
    // composed union+window form must always shuffle both together
    val p = physical("q_asof_exec_bucketed")
    assert(p.contains("AsOfJoin "), "must plan the dedicated operator:\n" + p.take(800))
    val joinTree = p.split("AsOfJoin ").last // children print under the node
    val exchanges = joinTree.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1,
      s"exactly ONE side (the events side) may shuffle, got $exchanges:\n$joinTree")
  }

  test("q_embed_topk: native cosine_sim scores inside the top-k project") {
    val df = SparkEntry.queries("q_embed_topk")(spark, TestSpark.sfDir)
    val pre = df.queryExecution.executedPlan.toString
    assert(pre.contains("cosine_sim("), "scoring must use the native expression")
    assert(pre.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    df.collect() // finalize the adaptive plan, then check codegen spans
    // whole-stage-codegen stages print as "*(n) Operator" in the tree
    val post = df.queryExecution.executedPlan.toString
    assert(post.contains("*(") && post.contains(") Project [vec_id"),
      "the scoring Project must sit inside a WholeStageCodegen stage")
  }
}
