package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Traversals

/** Soundness of the distributed DFS-leaf classification and exactness
  * of the r13 replay-input reduction (r12 VERDICT item 4).
  *
  * The classifier's claims are ORDER-INVARIANT ("leaf/internal in
  * every DFS order"), so each class is checked against replays under
  * several neighbor orders — ascending (the reference's), descending,
  * and seeded shuffles. A sound class must agree with all of them. */
class DfsClassesSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential explicit-stack DFS leaves under an arbitrary
    * neighbor order (the operator's replay, order generalized). */
  private def refLeaves(edges: Set[(Int, Int)], start: Int,
                        order: Seq[Int] => Seq[Int]): Set[Int] = {
    val adj = edges.groupBy(_._1).map { case (s, es) =>
      s -> order(es.map(_._2).toSeq.distinct.sorted) }
    val visited = scala.collection.mutable.Set(start)
    val leaves = scala.collection.mutable.Set.empty[Int]
    final class Frame(val v: Int) {
      val it = adj.getOrElse(v, Seq.empty).iterator
      var children = 0
    }
    val stack = scala.collection.mutable.Stack(new Frame(start))
    while (stack.nonEmpty) {
      val f = stack.top
      var pushed = false
      while (!pushed && f.it.hasNext) {
        val u = f.it.next()
        if (!visited(u)) { f.children += 1; visited += u; stack.push(new Frame(u)); pushed = true }
      }
      if (!pushed) { stack.pop(); if (f.children == 0) leaves += f.v }
    }
    leaves.toSet
  }

  private def genEdges(i: Int): Set[(Int, Int)] = {
    val rnd = new Random(1300 + i)
    val n = 3 + rnd.nextInt(15)
    (0 until n * (1 + rnd.nextInt(3)))
      .map(_ => (rnd.nextInt(n), rnd.nextInt(n))).toSet
  }

  test("leaf/internal classes hold under EVERY replayed neighbor order") {
    (0 until 10).foreach { i =>
      val edges = genEdges(i)
      val e = edges.toSeq.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
      val cls = Traversals.dfsLeafClasses(e, 0L).collect()
        .map(r => r.getLong(0).toInt -> r.getString(1)).toMap
      val orders: Seq[Seq[Int] => Seq[Int]] =
        Seq((s: Seq[Int]) => s, (s: Seq[Int]) => s.reverse) ++
          (0 until 3).map(k => (s: Seq[Int]) => new Random(7 * i + k).shuffle(s))
      orders.zipWithIndex.foreach { case (ord, oi) =>
        val leaves = refLeaves(edges, 0, ord)
        val certainLeaves = cls.collect { case (v, "leaf") => v }.toSet
        val certainInternal = cls.collect { case (v, "internal") => v }.toSet
        assert(certainLeaves.subsetOf(leaves),
          s"graph #$i order #$oi: claimed leaves ${certainLeaves -- leaves} " +
            s"are not leaves under this order ($edges)")
        assert((certainInternal & leaves).isEmpty,
          s"graph #$i order #$oi: claimed internals ${certainInternal & leaves} " +
            s"are leaves under this order ($edges)")
      }
      // classification covers exactly the reachable set
      assert(cls.keySet === refLeaves(edges, 0, identity).union(
        { // reachable = visited set of any replay; recompute directly
          val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
          var seen = Set(0); var front = Set(0)
          while (front.nonEmpty) {
            front = front.flatMap(v => adj.getOrElse(v, Set.empty)).diff(seen)
            seen ++= front
          }
          seen
        }), s"graph #$i: class rows != reachable set")
    }
  }

  test("the BFS-level rule's counterexample is classified honestly") {
    // 0→1, 0→2, 1→3, 3→2: vertex 3's only out-neighbor (2) sits at a
    // STRICTLY SMALLER BFS level, yet ascending-order DFS discovers 2
    // from 3 — so any classifier marking 3 'leaf' by the level rule is
    // wrong. Ours must leave 3 undecided (2's parents are {0, 3}).
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (3L, 2L)).toDF("src", "dst")
    val cls = Traversals.dfsLeafClasses(e, 0L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cls(3L) === "undecided")
    assert(cls(2L) === "leaf")      // no out-edges at all
    assert(cls(0L) === "internal")  // the root with children
    assert(cls(1L) === "internal")  // sole parent of 3
    // and the actual ascending-order replay agrees: 3 is NOT a leaf
    assert(refLeaves(Set((0, 1), (0, 2), (1, 3), (3, 2)), 0, identity) === Set(2))
  }

  test("classes and exact replay agree on the data-scale mod-150 graph " +
       "(the q_graph_dfs_leaves_big / q_graph_dfs_classes pair's fixture shape)") {
    val orders = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
    val e = orders.select((col("o_orderkey") % 150).as("src"),
        (col("o_custkey") % 150).as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val leaves = Traversals.dfsLeaves(e, 0L).collect().map(_.getLong(0)).toSet
    val cls = Traversals.dfsLeafClasses(e, 0L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cls.nonEmpty)
    val certainLeaves = cls.collect { case (v, "leaf") => v }.toSet
    val certainInternal = cls.collect { case (v, "internal") => v }.toSet
    assert(certainLeaves.subsetOf(leaves),
      s"claimed leaves not in the replay leaf set: ${certainLeaves -- leaves}")
    assert((certainInternal & leaves).isEmpty,
      s"claimed internals that replay as leaves: ${certainInternal & leaves}")
  }

  test("replay-input reduction is exact and extends the replay envelope") {
    (0 until 6).foreach { i =>
      val clean = genEdges(100 + i).filter { case (a, b) => a != b && b != 0 }
      // pollute: self-loops, edges into start, duplicates — all
      // droppable without changing the traversal
      val polluted = clean.toSeq ++ clean.toSeq ++
        clean.toSeq.map { case (a, _) => (a, a) } ++
        clean.toSeq.map { case (a, _) => (a, 0) }
      val cleanDf = clean.toSeq.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
      val dirtyDf = polluted.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
      val expect = Traversals.dfsLeaves(cleanDf, 0L).collect().map(_.getLong(0)).toSeq
      // bound sized for the REDUCED adjacency only: the raw polluted
      // edge count is ~4x the clean one, so pre-r13 this require-failed
      val got = Traversals.dfsLeaves(dirtyDf, 0L,
        maxReplayEdges = clean.size.toLong).collect().map(_.getLong(0)).toSeq
      assert(got === expect, s"graph #$i: reduction changed the leaf set")
    }
  }

  // ---- forest-ancestor back-edge rule (r14 VERDICT item 5) -------------

  /** Chain 0→1→…→8 plus two deep back-edges. 6→3 targets a depth-3
    * ancestor; 8→2 targets a depth-6 ancestor but is INVISIBLE in
    * round 1 (the 6→3 edge gives vertex 3 two in-neighbors, so 8's
    * certain chain stops below 3) — dropping 6→3 MINTS 3's certain
    * parent and round 2 reaches 2. The certain-PARENT rule alone
    * drops NOTHING here (no edge targets its own src's unique
    * in-neighbor): the fixture where the r13 reduction stalls and
    * the ancestor rule moves. */
  private lazy val chainBackEdges =
    ((0 until 8).map(i => (i.toLong, i + 1L)) ++ Seq((6L, 3L), (8L, 2L)))
      .toDF("src", "dst")

  test("forest-ancestor rule: finds chain back-edges the parent rule stalls on") {
    val e = chainBackEdges
      .where(col("src") =!= col("dst") && col("dst") =!= 0L)
      .distinct().localCheckpoint(true)
    // the certain-parent rule is provably stalled on this fixture
    val uniq = e.groupBy("dst")
      .agg(count(lit(1)).as("nin"), min(col("src")).as("p"))
      .where(col("nin") === 1).select(col("dst").as("cv"), col("p"))
    assert(e.join(uniq, e("src") === col("cv") && e("dst") === col("p")).count() === 0L,
      "fixture broken: the parent rule is supposed to stall here")
    // one ancestor pass finds EXACTLY the currently-provable edge
    val inert1 = Traversals.certainAncestorInert(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inert1 === Set((6L, 3L)),
      s"round-1 inert set wrong: $inert1 (8→2 must wait for the minted parent)")
    // the iterated trace: round 1 drops 6→3, round 2 drops the minted
    // 8→2, round 3 is the fixpoint witness — the MEASURED residual
    // reduction on a parent-rule-stalled graph (10 live edges → 8)
    val tr = Traversals.certainReductionTrace(chainBackEdges, 0L, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(tr === Seq((1L, 9L, 1L), (2L, 8L, 1L), (3L, 8L, 0L)))
  }

  test("dfsLeafResidual with the ancestor pass stays bit-identical to the unreduced replay") {
    val fixtures = chainBackEdges +:
      (0 until 6).map { i =>
        genEdges(140 + i).filter { case (a, b) => a != b && b != 0 }
          .toSeq.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
      }
    fixtures.zipWithIndex.foreach { case (df, i) =>
      def rows(maxRounds: Int) =
        Traversals.dfsLeafResidual(df, 0L, maxReduceRounds = maxRounds)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(rows(30) === rows(0),
        s"fixture #$i: the reduction changed the settled classes")
    }
  }
}
