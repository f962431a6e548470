package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.Tables

/** r20 optimization pins — the two entries whose internals moved off
  * the per-step DataFrame round-trip shape onto bounded driver
  * arithmetic (OPTIMIZATION_r20.md):
  *   1. q_embed_pca's power iteration now runs on the COLLECTED d²-row
  *      scaled covariance (the MLlib RowMatrix shape: the Gramian is
  *      d²-bounded at any corpus size, so the collect is
  *      bounded-by-contract). This spec re-runs the r19 DataFrame
  *      mat-vec loop — 6 steps of join + agg + checkpoint, verbatim —
  *      and pins the entry's output to it row for row: the driver
  *      BigDecimal algebra must be bit-identical, not just close.
  *   2. q_sample_coreset's per-round center probe is now a single
  *      collect (argmax row + its 64 components) instead of a nested
  *      broadcast build. Pinned against an independent brute-force
  *      greedy k-center in pure BigDecimal over the collected corpus
  *      (test-only collect; the fixture is tiny) — same seed, same
  *      exact-decimal distances, same (md desc, vec_id) tiebreak.
  */
class Wave34Spec extends SparkSpec {

  private val dir = TestSpark.sfDir

  test("q_embed_pca: driver-local power iteration ≡ the r19 DataFrame mat-vec loop") {
    val s = spark
    val emb = Tables.t(s, dir, "embeddings")
    // --- the r19 reference path, verbatim: exact scaled centering,
    // blocked covariance, six DataFrame mat-vec steps ---
    val x = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("j0", "x0")))
      .select(col("vec_id"), (col("j0") + 1).as("j"),
        round(col("x0").cast("double"), 6).cast("decimal(18,6)").as("x"))
    val g = x.groupBy("j").agg(
      sum(col("x")).cast("decimal(24,6)").as("sx"),
      count(lit(1)).cast("decimal(6,0)").as("n"))
    val nD = emb.count().toDouble
    val yArr = x.join(broadcast(g), "j")
      .select(col("vec_id"), col("j"),
        (col("x") * col("n") - col("sx")).cast("decimal(18,6)").as("y"))
      .groupBy("vec_id")
      .agg(expr("transform(sort_array(collect_list(struct(j, y))), s -> s.y)")
        .as("ya"))
    val cov = Similarity.scaledCovarianceBlocked(yArr, d = 64, blockDim = 64)
      .localCheckpoint(true)
    var v = s.range(1, 65).select(col("id").as("j"),
      lit(0.125).cast("decimal(8,6)").as("vj"))
    var lastNorm: org.apache.spark.sql.DataFrame = null
    for (_ <- 1 to 6) {
      val w = cov.join(broadcast(v.select(col("j").as("k"), col("vj"))), "k")
        .groupBy("j")
        .agg(round(sum((col("mjk") * col("vj")).cast("decimal(33,18)")), 0)
          .cast("decimal(15,0)").as("wj"))
        .localCheckpoint(true)
      val nrm = w.agg(
        sqrt(sum((col("wj") * col("wj")).cast("decimal(38,0)"))
          .cast("double")).as("nrm"))
      lastNorm = nrm
      v = w.crossJoin(broadcast(nrm))
        .select(col("j"), round(col("wj").cast("double") / col("nrm"), 6)
          .cast("decimal(8,6)").as("vj"))
        .localCheckpoint(true)
    }
    val ref = v.crossJoin(broadcast(lastNorm))
      .select(col("j").cast("int").as("dim"),
        col("vj").cast("double").as("loading"),
        round(col("nrm") / lit(nD * nD * nD), 6).as("eigenvalue"))
      .orderBy("dim")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    // --- the optimized entry ---
    val got = SparkEntry.queries("q_embed_pca")(s, dir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == ref,
      "driver-local power iteration diverged from the DataFrame mat-vec reference")
    assert(got.size == 64 && math.abs(
      got.map(t => t._2 * t._2).sum - 1.0) < 1e-4,
      "top component is not unit-norm")
  }

  test("q_sample_coreset: single-collect center probe ≡ brute-force greedy k-center") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    val s = spark
    // independent reference: collect the rounded-decimal corpus
    // (test-only collect — sf0.001) and run the greedy selection in
    // pure BigDecimal with the entry's exact arithmetic
    val ex = Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("j0", "x0")))
      .select(col("vec_id"), (col("j0") + 1).as("j"),
        round(col("x0").cast("double"), 6).cast("decimal(18,6)").as("x"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2)))
    val vecs: Map[Long, Map[Int, JBD]] =
      ex.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    def d2(a: Long, b: Long): JBD = {
      val va = vecs(a); val vb = vecs(b)
      (1 to 64).foldLeft(JBD.ZERO) { (acc, j) =>
        val e = va(j).subtract(vb(j)).setScale(6, RM.HALF_UP)
        acc.add(e.multiply(e).setScale(12, RM.HALF_UP))
      }.setScale(12, RM.HALF_UP)
    }
    var md = vecs.keys.filter(_ != 0L).map(v => v -> d2(v, 0L)).toMap
    val expect = scala.collection.mutable.ListBuffer[(Int, Long, Double)]((0, 0L, 0.0))
    for (k <- 1 to 8) {
      val (selId, selMd) = md.toSeq.sortWith { case ((v1, m1), (v2, m2)) =>
        val c = m1.compareTo(m2)
        if (c != 0) c > 0 else v1 < v2
      }.head
      expect += ((k, selId, selMd.doubleValue))
      md = (md - selId).map { case (vid, old) =>
        val nd = d2(vid, selId)
        vid -> (if (old.compareTo(nd) <= 0) old else nd)
      }
    }
    val got = SparkEntry.queries("q_sample_coreset")(s, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect.toSeq,
      "coreset selection diverged from the brute-force greedy k-center reference")
  }

  // --- dense-local fast paths (r20): each graph operator that gained a
  // bounded driver-local path is pinned local ≡ distributed on the
  // fixture modulus graphs (localMaxEdges = 0 forces the distributed
  // wedge/superstep machinery; the default takes the local path) ---

  private def modUnd(m: Int) = graft.operators.GraphAlgos.canonicalUndirected(
    Tables.t(spark, dir, "orders").select(
      (col("o_orderkey") % m).as("src"), (col("o_custkey") % m).as("dst")))

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("trussPeelCanon: dense-local peel ≡ distributed wedge peel") {
    import graft.operators.GraphAlgos
    val und = modUnd(300)
    val local = GraphAlgos.trussPeelCanon(und, k = 4, rounds = 2)
    val dist = GraphAlgos.trussPeelCanon(und, k = 4, rounds = 2,
      localMaxEdges = 0)
    assert(local.schema.map(f => (f.name, f.dataType)) ==
      dist.schema.map(f => (f.name, f.dataType)))
    assert(rowSet(local) == rowSet(dist))
    assert(rowSet(local).nonEmpty, "fixture 4-truss is empty — test proves nothing")
  }

  test("linkPredictionCanon: bitmap candidates ≡ distributed wedge join") {
    import graft.operators.GraphAlgos
    val und = modUnd(300)
    val local = GraphAlgos.linkPredictionCanon(und, topN = 100)
    val dist = GraphAlgos.linkPredictionCanon(und, topN = 100, localMaxEdges = 0)
    assert(local.schema.map(f => (f.name, f.dataType)) ==
      dist.schema.map(f => (f.name, f.dataType)))
    // top-N under a TOTAL order (cn desc, pa desc, a, b) — compare as
    // ordered sequences, not sets
    val lo = local.orderBy(col("cn").desc, col("pa").desc, col("a"), col("b"))
      .collect().map(_.toString).toSeq
    val di = dist.orderBy(col("cn").desc, col("pa").desc, col("a"), col("b"))
      .collect().map(_.toString).toSeq
    assert(lo == di)
  }

  test("squareDiagTop: bitmap codegrees ≡ distributed wedge join") {
    import graft.operators.GraphAlgos
    val und = modUnd(150)
    val local = GraphAlgos.squareDiagTop(und, topN = 10)
    val dist = GraphAlgos.squareDiagTop(und, topN = 10, localMaxEdges = 0)
    val lo = local.orderBy(col("nsq").desc, col("a"), col("b"))
      .collect().map(_.toString).toSeq
    val di = dist.orderBy(col("nsq").desc, col("a"), col("b"))
      .collect().map(_.toString).toSeq
    assert(lo == di && lo.nonEmpty)
  }

  test("greedyMatchingCanon: local md5 rounds ≡ distributed rounds") {
    import graft.operators.GraphAlgos
    val und = modUnd(150)
    val local = GraphAlgos.greedyMatchingCanon(und, rounds = 3)
    val dist = GraphAlgos.greedyMatchingCanon(und, rounds = 3, localMaxEdges = 0)
    assert(rowSet(local) == rowSet(dist))
    assert(rowSet(local).nonEmpty)
  }

  test("q_events_markov_attribution: driver-local chain ≡ the r19 DataFrame chain") {
    import spark.implicits._
    val s = spark
    // --- the r19 reference path, verbatim: journey chain + 5 lazy
    // 6-step DataFrame chains over the checkpointed transition matrix ---
    val ev = Tables.events(s, dir)
    val firstP = ev.where(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("ts")).as("pts"))
    val steps = ev.join(firstP, Seq("user_id"), "left_outer")
      .where(col("pts").isNull || col("ts") <= col("pts"))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val seq0 = steps
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .withColumn("rn", row_number().over(w))
    val trans = seq0.where(col("rn") === 1)
        .select(lit("start").as("src"), col("event_type").as("dst"))
      .unionByName(seq0.where(col("nxt").isNotNull)
        .select(col("event_type").as("src"), col("nxt").as("dst")))
      .unionByName(seq0.where(col("nxt").isNull &&
          col("event_type") =!= "purchase")
        .select(col("event_type").as("src"), lit("null").as("dst")))
      .where(col("src") =!= "purchase")
    val tShape = trans.groupBy("src", "dst").agg(count(lit(1)).as("c"))
      .withColumn("tot", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .select(col("src"), col("dst"),
        round(col("c").cast("double") / col("tot"), 8).as("p"))
      .localCheckpoint(true)
    val absorb = Seq(("purchase", "purchase", 1.0), ("null", "null", 1.0))
      .toDF("src", "dst", "p")
    def pconv(removed: Option[String]): org.apache.spark.sql.DataFrame = {
      val base = removed match {
        case None => tShape
        case Some(c) => tShape.where(col("src") =!= c)
          .withColumn("dst", when(col("dst") === c, lit("null"))
            .otherwise(col("dst")))
      }
      val tm = base.unionByName(absorb)
        .groupBy("src", "dst").agg(
          round(sum(col("p").cast("decimal(38,18)")).cast("double"), 8).as("p"))
        .localCheckpoint(true)
      var pv = Seq(("start", 1.0)).toDF("st", "m")
      (1 to 6).foreach { _ =>
        pv = tm.as("t").join(pv.as("v"), col("t.src") === col("v.st"))
          .groupBy(col("t.dst"))
          .agg(round(sum((col("v.m") * col("t.p")).cast("decimal(38,18)"))
            .cast("double"), 8).as("m2"))
          .select(col("dst").as("st"), col("m2").as("m"))
      }
      pv.where(col("st") === "purchase").select(round(col("m"), 6).as("p"))
    }
    val base = pconv(None).select(col("p").as("p_conv"))
    val ref = Seq("click", "error", "signup", "view")
      .map { c =>
        pconv(Some(c)).select(lit(c).as("channel"), col("p").as("p_without"))
      }.reduce(_ unionByName _)
      .crossJoin(broadcast(base))
      .select(col("channel"), col("p_conv"), col("p_without"),
        round(lit(1.0) - col("p_without") / col("p_conv"), 4)
          .as("removal_effect"))
      .orderBy("channel")
      .collect().map(_.toString).toSeq
    val got = SparkEntry.queries("q_events_markov_attribution")(s, dir)
      .orderBy("channel").collect().map(_.toString).toSeq
    assert(got == ref,
      "driver-local absorbing chain diverged from the DataFrame chain reference")
    assert(got.size == 4)
  }

  test("q_events_holt: driver-local recursion ≡ the r19 unrolled DataFrame chain") {
    import spark.implicits._
    val s = spark
    val daily = Tables.events(s, dir)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val series = daily
      .withColumn("rd", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("day").desc)))
      .where(col("rd") <= 16)
      .select((lit(17) - col("rd")).as("rn"),
        col("x").cast("decimal(20,6)").as("y"))
      .localCheckpoint(true)
    val half = lit(0.5).cast("decimal(2,1)")
    def yAt(t: Int) = broadcast(series.where(col("rn") === t).select("y"))
    var st = yAt(1).select(col("y").cast("decimal(24,6)").as("l"))
      .crossJoin(yAt(2).select(col("y").as("y2")))
      .select(col("l"), (col("y2") - col("l")).cast("decimal(24,6)").as("b"))
      .localCheckpoint(true)
    for (t <- 2 to 16) {
      st = st.crossJoin(yAt(t))
        .select(col("l"), col("b"),
          round((col("y") + col("l") + col("b")) * half, 6)
            .cast("decimal(24,6)").as("lt"))
        .select(col("lt").as("l"),
          round((col("lt") - col("l") + col("b")) * half, 6)
            .cast("decimal(24,6)").as("b"))
        .localCheckpoint(true)
    }
    val full16 = broadcast(series.agg(count(lit(1)).as("nd"))
      .where(col("nd") === 16))
    val ref = st.crossJoin(full16).select(lit(16).as("n_days"),
        col("l").cast("double").as("level"),
        col("b").cast("double").as("trend"),
        (col("l") + col("b")).cast("double").as("f1"),
        (col("l") + col("b") * lit(2)).cast("double").as("f2"),
        (col("l") + col("b") * lit(3)).cast("double").as("f3"))
      .collect().map(_.toString).toSeq
    val got = SparkEntry.queries("q_events_holt")(s, dir)
      .collect().map(_.toString).toSeq
    assert(got == ref,
      "driver-local Holt recursion diverged from the unrolled DataFrame chain")
    assert(got.size == 1)
  }

  test("dfsLeaves: local reach+reduce+replay ≡ distributed reduction path") {
    val e = Tables.t(spark, dir, "orders").select(
        (col("o_orderkey") % 150).as("src"), (col("o_custkey") % 150).as("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true)
    val local = graft.operators.Traversals.dfsLeaves(e, 0L)
    val dist = graft.operators.Traversals.dfsLeaves(e, 0L, localMaxEdges = 0)
    assert(rowSet(local) == rowSet(dist) && rowSet(local).nonEmpty)
  }

  test("dfsLeafResidual: local rules+replay ≡ distributed reduce/replay path") {
    val e = Tables.t(spark, dir, "orders").select(
        (col("o_orderkey") % 150).as("src"), (col("o_custkey") % 150).as("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true)
    val local = graft.operators.Traversals.dfsLeafResidual(e, 0L)
    val dist = graft.operators.Traversals.dfsLeafResidual(e, 0L,
      localMaxEdges = 0)
    assert(rowSet(local) == rowSet(dist) && rowSet(local).nonEmpty)
  }

  test("labelPropagation: local counting rounds ≡ distributed fused rounds") {
    val e = modUnd(300).select(col("a").as("src"), col("b").as("dst"))
    val local = graft.operators.Traversals.labelPropagation(e, iters = 2)
    val dist = graft.operators.Traversals.labelPropagation(e, iters = 2,
      localMaxEdges = 0)
    assert(rowSet(local) == rowSet(dist) && rowSet(local).nonEmpty)
  }

  test("lubyMis: local md5 rounds ≡ distributed rounds") {
    val e = modUnd(300).select(col("a").as("src"), col("b").as("dst"))
    val local = graft.operators.Traversals.lubyMis(e, rounds = 3)
    val dist = graft.operators.Traversals.lubyMis(e, rounds = 3,
      localMaxEdges = 0)
    assert(rowSet(local) == rowSet(dist))
    assert(rowSet(local).nonEmpty)
  }
}
