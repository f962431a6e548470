package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{GraphAlgos, Similarity}

/** r15 wave: densest-subgraph batched peel + in-engine perceptron
  * training. Both are checked against independent in-memory
  * references (set/BigDecimal arithmetic — no Spark, no SQL), so the
  * DuckDB oracles and these specs fail independently. */
class Wave30Spec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference of the Bahmani batched peel: per round
    * (before-stats, peeled count), keep v iff deg·V > 3·E. */
  private def refPeel(edges: Set[(Long, Long)], rounds: Int)
      : Seq[(Int, Long, Long, Long, Long)] = {
    var e = edges
    (1 to rounds).map { r =>
      val nE = e.size.toLong
      val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
        .groupBy(identity).map { case (v, l) => v -> l.size.toLong }
      val nV = deg.size.toLong
      val kept = deg.collect { case (v, dg) if dg * nV > 3 * nE => v }.toSet
      val surv = e.filter { case (a, b) => kept(a) && kept(b) }
      val nKept = (surv.map(_._1) ++ surv.map(_._2)).size.toLong
      val ppm = if (nV > 0) 1000000L * nE / nV else 0L
      val row = (r, nV, nE, ppm, nV - nKept)
      e = surv
      row
    }
  }

  private def peelDf(edges: Set[(Long, Long)], rounds: Int) =
    GraphAlgos.densestPeelCanon(
      edges.toSeq.toDF("a", "b").localCheckpoint(true), rounds)
      .orderBy("round")
      .select("round", "n_vertices", "n_edges", "density_ppm", "n_peeled",
        "is_best")
      .as[(Int, Long, Long, Long, Long, Int)].collect().toSeq

  test("densestPeel matches the in-memory reference on a skewed star+clique") {
    // a 6-clique core plus 20 degree-1 spokes: round 1 peels the
    // spokes (deg 1 ≤ 3ρ), density then rises to the clique's
    val clique = (for (i <- 100L to 105L; j <- (i + 1) to 105L) yield (i, j)).toSet
    val spokes = (1L to 20L).map(s => (s, 100L + s % 6)).map {
      case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val edges = clique ++ spokes
    val got = peelDf(edges, 4)
    val want = refPeel(edges, 4)
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) === want)
    // density must strictly rise after the spokes leave, and the best
    // round is the densest prefix (earliest on ties)
    assert(want(1)._4 > want.head._4)
    val best = want.maxBy(t => (t._4, -t._1))._1
    assert(got.filter(_._6 == 1).map(_._1) === Seq(best))
  }

  test("densestPeel matches the reference on random graphs (incl. full peel-out)") {
    val rnd = new Random(15)
    (1 to 5).foreach { _ =>
      val n = 12 + rnd.nextInt(20)
      val edges = (1 to 3 * n).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).toSet
      if (edges.nonEmpty) {
        val got = peelDf(edges, 5)
        assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) === refPeel(edges, 5))
      }
    }
  }

  /** In-memory exact-decimal perceptron (BigDecimal — mirrors the
    * operator's DECIMAL(12,6)/(20,6)/(38,12) arithmetic exactly since
    * every value involved is a terminating 6-dp decimal). */
  private def refPerceptron(xs: Seq[(Long, Int, Array[BigDecimal])],
                            dims: Int, epochs: Int)
      : Seq[(Array[BigDecimal], Long)] = {
    var w = Array.fill(dims)(BigDecimal(0))
    (1 to epochs).map { _ =>
      val miss = xs.filter { case (_, y, x) =>
        val mg = (0 until dims).map(j => w(j) * x(j)).sum
        (y == 1 && mg <= 0) || (y == -1 && mg >= 0)
      }
      val g = Array.tabulate(dims)(j =>
        miss.map { case (_, y, x) => x(j) * y }.sum)
      w = w.zip(g).map { case (a, b) => a + b }
      (w.clone(), miss.size.toLong)
    }
  }

  private def perceptronDf(xs: Seq[(Long, Int, Array[BigDecimal])],
                           dims: Int, epochs: Int) = {
    val rows = xs.flatMap { case (id, y, x) =>
      x.zipWithIndex.map { case (v, j0) => (id, y, j0 + 1, v.bigDecimal) } }
    val xr = rows.toDF("vec_id", "y", "j", "x0")
      .select(col("vec_id"), col("y"), col("j"),
        col("x0").cast("decimal(12,6)").as("x"))
    Similarity.perceptronEpochs(xr, dims, epochs)
      .orderBy("epoch", "dim")
      .as[(Int, Int, Double, Long)].collect().toSeq
  }

  test("perceptron converges on a linearly separable fixture and freezes at err 0") {
    // +1 points at (1, 0), −1 points at (−1, 0): epoch 1 updates on
    // everything (w0 = 0), epoch 2+ classify perfectly — err drops to
    // 0 and the weights stop moving
    val xs = (1L to 8L).map { i =>
      val y = if (i % 2 == 0) 1 else -1
      (i, y, Array(BigDecimal(y), BigDecimal(0)))
    }
    val got = perceptronDf(xs, dims = 2, epochs = 3)
    val errs = got.groupBy(_._1).map { case (e, r) => e -> r.head._4 }
    assert(errs === Map(1 -> 8L, 2 -> 0L, 3 -> 0L))
    val w2 = got.filter(_._1 == 2).map(r => r._2 -> r._3).toMap
    val w3 = got.filter(_._1 == 3).map(r => r._2 -> r._3).toMap
    assert(w2 === w3)
    assert(w2(1) == 8.0 && w2(2) == 0.0)
  }

  /** The engine's CDC chunking expressions, applied to a 1-doc frame. */
  private def cdcChunks(text: String): Seq[String] =
    Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("bs", expr(
        "filter(sequence(1, greatest(length(text) - 7, 1)), " +
          "i -> i = 1 OR substring(md5(substring(text, i, 8)), 1, 2) <= '03')"))
      .select(explode(expr(
        "transform(bs, (b, k) -> substring(text, b, " +
          "coalesce(try_element_at(bs, k + 2), length(text) + 1) - b))")).as("c"))
      .as[String].collect().toSeq

  test("CDC chunking is shift-resilient: a 1-char insertion disturbs O(1) chunks") {
    val rnd = new Random(64)
    val s0 = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val c0 = cdcChunks(s0)
    val c1 = cdcChunks("X" + s0)
    // chunks rebuild the text exactly, in order
    assert(c0.mkString === s0)
    assert(c1.mkString === "X" + s0)
    assert(c0.size > 10, s"fixture too short to test (got ${c0.size} chunks)")
    // every window of s0 at position i reappears in X+s0 at i+1, so
    // every boundary except (possibly) the forced first survives the
    // shift: all but the first chunk of s0 must reappear verbatim
    val shared = c0.tail.toSet intersect c1.toSet
    assert(shared.size >= c0.size - 1,
      s"insertion disturbed ${c0.size - shared.size} of ${c0.size} chunks")
    // the CONTRAST that motivates CDC: fixed-width 64-char windows all
    // shift — zero survive the same insertion
    val f0 = s0.grouped(64).toSet
    val f1 = ("X" + s0).grouped(64).toSet
    assert((f0 intersect f1).size <= 1)
  }

  test("perceptron matches the exact-decimal in-memory reference on random data") {
    val rnd = new Random(30)
    val dims = 5
    val xs = (1L to 40L).map { i =>
      val y = if (rnd.nextBoolean()) 1 else -1
      val x = Array.fill(dims)(
        BigDecimal(rnd.nextInt(2000001) - 1000000) / BigDecimal(1000000))
      (i, y, x)
    }
    val want = refPerceptron(xs, dims, epochs = 3)
    val got = perceptronDf(xs, dims, epochs = 3)
    (1 to 3).foreach { e =>
      val epoch = got.filter(_._1 == e)
      assert(epoch.head._4 === want(e - 1)._2, s"err at epoch $e")
      epoch.foreach { case (_, dim, w, _) =>
        assert(w === want(e - 1)._1(dim - 1).toDouble,
          s"w at epoch $e dim $dim")
      }
    }
  }
}
