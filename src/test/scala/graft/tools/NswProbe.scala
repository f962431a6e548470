package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Similarity
import graft.functions.VectorFunctions.toDouble

/** r17 verdict item 3: PRICE the routed-ANN search the way IVF has
  * q_embed_recall and LSH has the bands table — greedy-route top-1
  * agreement vs exact over a deterministic query sample, across the
  * beam (1→4) and entry-point (1→4) levers. The gate's q_embed_nsw is
  * the paradigm's degenerate corner (beam 1, one entry); q_embed_nsw_beam
  * is the production configuration (beam 4, four entries). This probe
  * measures what each lever buys at sf1/sf10 (BASELINE.md r18 table).
  *
  * Measurement shape (all-queries-at-once, never per-query driver
  * loops): the 32-query sample routes SIMULTANEOUSLY — per hop one
  * broadcast of the ≤ 32·beam frontier against the 5-NN graph, one
  * broadcast-candidate scan of the corpus for scoring; exact truth is
  * one blocked 32×n cosine pass. Recall@1 = fraction of queries whose
  * routed final top-1 IS the exact nearest neighbour; the score ratio
  * (routed final cosine / exact best cosine) prices how NEAR the
  * misses land.
  *
  * args: [sfDir] (default /tmp/sf1) */
object NswProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("nsw-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)

    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val n = emb.count()
    val k = Similarity.autoCellCount(n)
    println(s"[nsw] corpus $d n=$n cells=$k")
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .where(col("vec_id") =!= 0).localCheckpoint(true)

    // the gate entries' graph build — EXACTLY the staged nswGraph
    // artifact (r19: deg-NN in-cell + rank-16/64/256 in-cell skip
    // edges + `links` hash-designated cross-cell links), timed once
    // per TOPOLOGY — the staged-artifact cost a production store pays
    // per corpus generation, NOT per query. r19 verdict item 3: the
    // search-width levers are exhausted (beam 16 = +1/32 for 2×), so
    // this round prices the TOPOLOGY levers: in-cell degree 5→8 and a
    // third cross-cell link, each a linear build-cost delta.
    def buildGraph(deg: Int, links: Int): DataFrame = {
      val tg = System.nanoTime()
      val g = graft.queries.PipelineQueries.nswGraph(spark, d, k, deg, links)
        .localCheckpoint(true)
      println(f"[nsw] graph deg=$deg links=$links: ${g.count()} edges " +
        f"in ${(System.nanoTime() - tg) / 1e9}%.2f s")
      g
    }

    // deterministic 32-query sample: every ⌊n/32⌋-th corpus id in rank
    // order (ids are NOT dense at the derived scales — ScaleGen shifts
    // keys per copy, so id-arithmetic sampling would under-select)
    val wAll = Window.orderBy("vec_id")
    val stride = math.max(1L, n / 32)
    val q = e.withColumn("rn", row_number().over(wAll))
      .where(col("rn") % stride === 7L).limit(32)
      .select(col("vec_id").as("qid"), col("v").as("qv")).localCheckpoint(true)
    val nq = q.count()

    // exact top-1 per query (excluding self) — one 32×n pass
    val te = System.nanoTime()
    val wq = Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id"))
    val exact10 = e.crossJoin(broadcast(q)).where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), expr("cosine_sim(v, qv)").as("sc"))
      .withColumn("rk", row_number().over(wq)).where(col("rk") <= 10)
      .select(col("qid"), col("vec_id").as("exact_id"),
        col("rk").as("exact_rk"), col("sc").as("exact_sc"))
      .localCheckpoint(true)
    val exact = exact10.where(col("exact_rk") === 1)
      .select(col("qid"), col("exact_id"), col("exact_sc"))
    println(f"[nsw] exact truth (32×n brute force): ${(System.nanoTime() - te) / 1e9}%.2f s")

    val ev = e.select(col("vec_id").as("vertex"), col("v").as("cv"))
    // grid: topology (deg, links) × search config (beam, entries,
    // hops). (5,2) is the r19 gate graph; the search grid around the
    // pinned beam-8/all-centroid/8-hop config stays small because r19
    // measured search width exhausted on the (5,2) graph.
    // the full grid prices at sf1; "big" narrows to baseline +
    // sf1-winner + one scout rung for the expensive sf10 builds
    val topos =
      if (args.length > 1 && args(1) == "big") Seq((5, 2), (12, 4), (16, 6))
      else Seq((5, 2), (8, 2), (5, 3), (8, 3), (12, 4))
    val cfgs =
      if (args.length > 1 && args(1) == "big") Seq((8, k, 8), (8, k, 12))
      else Seq((4, k, 8), (8, k, 8), (8, k, 12))
    for ((deg, links) <- topos) {
      val g = buildGraph(deg, links)
      for ((beam, entries, hops) <- cfgs) {
      val t1 = System.nanoTime()
      val wr = Window.partitionBy("qid").orderBy(col("sc").desc, col("vertex"))
      def topB(cands: DataFrame): DataFrame = cands.distinct()
        .join(ev, "vertex").join(broadcast(q), "qid")
        .where(col("vertex") =!= col("qid"))
        .select(col("qid"), col("vertex"), expr("cosine_sim(cv, qv)").as("sc"))
        .withColumn("rk", row_number().over(wr)).where(col("rk") <= beam)
        .select("qid", "vertex", "sc").localCheckpoint(true)
      var frontier = topB(q.select(col("qid")).crossJoin(
        spark.range(1, entries + 1).select(col("id").as("vertex"))))
      (1 to hops).foreach { _ =>
        val cand = frontier.select("qid", "vertex").unionByName(
          broadcast(frontier.select(col("qid"), col("vertex")))
            .join(g, col("vertex") === col("src"))
            .select(col("qid"), col("dst").as("vertex")))
        frontier = topB(cand)
      }
      val fin = frontier.withColumn("rk", row_number().over(wr))
        .where(col("rk") === 1)
      val joined = fin.join(exact, "qid").localCheckpoint(true)
      val agree = joined.where(col("vertex") === col("exact_id")).count()
      val in10 = fin.join(exact10,
        fin("qid") === exact10("qid") && fin("vertex") === exact10("exact_id"))
        .count()
      val ratio = joined.agg(avg(col("sc") / col("exact_sc"))).head().getDouble(0)
      println(f"[nsw] deg=$deg links=$links beam=$beam entries=$entries " +
        f"hops=$hops recall@1=$agree/$nq inExactTop10=$in10/$nq " +
        f"scoreRatio=$ratio%.4f wall=${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
