package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the wave-18 inventory additions (forward fill,
  * OHLC bars, concurrency sweep, column profiler, link prediction,
  * integer HITS). Value-level parity is the DuckDB oracle's job; these
  * pin the invariants a refactor could silently break. */
class Wave18Spec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("locf: filled echoes non-null readings and only leads are null") {
    val r = run("q_window_locf").cache()
    try {
      // wherever the masked reading survives, forward fill must echo it
      assert(r.where(col("reading").isNotNull &&
        !(col("filled") === col("reading"))).count() === 0)
      // a null fill can only happen before a user's first observation —
      // so every (user, null-filled row) must precede that user's first
      // non-null reading in (ts, event_id) order, which event_id encodes
      // monotonically per the fixture; check via the minimal witness:
      // no user has a null fill after a non-null fill
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")
      val flagged = r.withColumn("seen",
          max(when(col("filled").isNotNull, lit(1)).otherwise(lit(0))).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
        .where(col("filled").isNull && col("seen") === 1)
      assert(flagged.count() === 0)
    } finally r.unpersist()
  }

  test("ohlc: bar invariants hold on every row") {
    val r = run("q_events_ohlc").cache()
    try {
      assert(r.count() > 0)
      assert(r.where(col("high") < col("low") ||
        col("high") < col("open") || col("high") < col("close") ||
        col("low") > col("open") || col("low") > col("close") ||
        col("volume") < 1).count() === 0)
    } finally r.unpersist()
  }

  test("concurrency: peak is within [1, n_intervals] and witnessed") {
    val r = run("q_events_concurrency").cache()
    try {
      assert(r.count() > 0)
      assert(r.where(col("peak") < 1 || col("peak") > col("n_intervals") ||
        col("first_peak_us").isNull).count() === 0)
    } finally r.unpersist()
  }

  test("profile: orders pk is unique, null-free, min<=max on numerics") {
    val r = run("q_profile_table").cache()
    try {
      val nOrders = graft.queries.Tables.t(spark, TestSpark.sfDir, "orders").count()
      val pk = r.where(col("col_name") === "orderkey").head()
      assert(pk.getAs[Long]("n_null") === 0L)
      assert(pk.getAs[Long]("n_distinct") === nOrders)
      assert(r.where(col("min_v").isNotNull && col("min_v") > col("max_v"))
        .count() === 0)
      assert(r.count() === 6)
    } finally r.unpersist()
  }

  test("linkpred: candidates are non-adjacent pairs with a common neighbour") {
    val r = run("q_graph_linkpred").cache()
    try {
      assert(r.count() > 0)
      assert(r.where(col("cn") < 1 || col("a") >= col("b")).count() === 0)
      val und = graft.queries.Tables.t(spark, TestSpark.sfDir, "orders")
        .select((col("o_orderkey") % 300).as("x"), (col("o_custkey") % 300).as("y"))
        .where(col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .distinct()
      assert(r.join(und, Seq("a", "b"), "left_semi").count() === 0,
        "a predicted link already exists in the graph")
    } finally r.unpersist()
  }

  test("hits: matches an independent in-memory power iteration") {
    val edges = graft.queries.Tables.t(spark, TestSpark.sfDir, "orders")
      .select((col("o_orderkey") % 150).as("src"), (col("o_custkey") % 150).as("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val a1 = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val h1 = edges.groupBy(_._1).view
      .mapValues(_.map(e => a1.getOrElse(e._2, 0L)).sum).toMap
    val a2 = edges.groupBy(_._2).view
      .mapValues(_.map(e => h1.getOrElse(e._1, 0L)).sum).toMap
    val expected = verts.map(v =>
      (v, h1.getOrElse(v, 0L), a2.getOrElse(v, 0L)))
    val got = run("q_graph_hits").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSeq
    assert(got === expected.toSeq)
  }
}
