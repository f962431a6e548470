package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Traversals
import Tables.t

/** The reference's graph query surface (BFS levels/order, DFS-tree
  * leaves, plus catalog-adjacent analytics: components, degrees,
  * triangles) exposed over **deterministic fixture-derived edge
  * tables** so DuckDB `WITH RECURSIVE` can serve as the oracle
  * (SURVEY.md §5.3). DFS-leaves is order-dependent and deliberately
  * oracle-less — covered by the G1–G7 golden suite instead.
  */
object GraphQueries {

  /** Mirror a directed edge list into its undirected (both-directions)
    * form in ONE pass: `union(e, e.reversed)` re-executes the whole
    * upstream plan (window/distinct/scan) once per branch, while
    * explode(array(fwd, rev)) emits both directions from a single scan
    * inside one codegen stage — at 100 TB that's the difference between
    * one and two passes over the edge source. */
  private def mirror(e: DataFrame): DataFrame =
    e.select(explode(array(
        struct(col("src").as("src"), col("dst").as("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))

  /** Session-scoped memo of the key-derived modulus graphs — ONE
    * staged edge table per (fixture, modulus, form) serving the whole
    * motif/similarity family (jaccard, k-truss, link prediction,
    * squares, assortativity, triangle counting share the mod-300/150
    * canonical set; HITS and reciprocity the directed set). Same
    * lifecycle contract as the MinHash signature memo
    * (PipelineQueries.memoTable): keyed on the orders fixture
    * fingerprint so a driver-side refresh re-derives instead of
    * serving stale edges, reaped when the session stops. At 100 TB the
    * staged table is what a production pipeline would persist as a
    * materialized edge view; at gate scale it cuts the repeated
    * scan+distinct (~0.3-0.5 s each) from every family member after
    * the first. */
  private[graft] val graphMemo = new SessionMemo

  private def modMemoized(s: SparkSession, d: String, tag: String)
                         (build: => DataFrame): DataFrame =
    graphMemo(s, d, s"mod_$tag", Tables.fingerprint(d, "orders"))(build)

  /** Canonical undirected (a < b, deduped, long, pinned) modulus-m
    * graph over orders — [[graft.operators.GraphAlgos.canonicalUndirected]]
    * staging, memoized per session. */
  private def modulusUnd(s: SparkSession, d: String, m: Int): DataFrame =
    modMemoized(s, d, s"und_$m") {
      graft.operators.GraphAlgos.canonicalUndirected(
        t(s, d, "orders").select(
          (col("o_orderkey") % m).as("src"), (col("o_custkey") % m).as("dst")))
    }

  /** Directed distinct (self-loop-free, pinned) modulus-m graph over
    * orders — the HITS/reciprocity form, memoized per session. */
  private def modulusDirected(s: SparkSession, d: String, m: Int): DataFrame =
    modMemoized(s, d, s"dir_$m") {
      t(s, d, "orders").select(
          (col("o_orderkey") % m).as("src"), (col("o_custkey") % m).as("dst"))
        .where(col("src") =!= col("dst")).distinct()
        .localCheckpoint(true)
    }

  /** Tree graph over the 25 nations: undirected edge k — floor(k/2),
    * k>0 (a binary heap shape). Derived identically in the oracle. */
  private def treeEdges(s: SparkSession, d: String): DataFrame = {
    val k = t(s, d, "nation").select(col("n_nationkey").cast("long").as("k"))
    mirror(k.where(col("k") > 0)
      .select(col("k").as("src"), floor(col("k") / 2).cast("long").as("dst")))
  }

  /** Two chains with gaps: 0–10 and 12–20 (nations 11, 21–24 isolated
    * and therefore absent — matches CC's edge-derived vertex set). */
  private def chainEdges(s: SparkSession, d: String): DataFrame = {
    val k = t(s, d, "nation").select(col("n_nationkey").cast("long").as("k"))
    mirror(k.where(col("k") < 10 || (col("k") >= 12 && col("k") < 20))
      .select(col("k").as("src"), (col("k") + 1).as("dst")))
  }

  /** Scale-realistic graph: order—supplier bipartite from lineitem
    * (600 k distinct pairs → 1.2 M mirrored rows at sf0.1). Vertices:
    * orderkey·2 (even) and suppkey·2+1 (odd). Session-staged like the
    * modulus graphs (r12): three gate entries (pagerank_big, bfs_big,
    * degree_dist) consume the same derived edge table, and its
    * scan + distinct + mirror is the dominant staging cost of each —
    * the memo pins it once per fixture generation (keyed on the
    * lineitem fingerprint, unlike the orders-keyed modulus memo). */
  private def bipartiteEdges(s: SparkSession, d: String): DataFrame =
    graphMemo(s, d, "bip_edges", Tables.fingerprint(d, "lineitem"))(
      mirror(t(s, d, "lineitem")
        .select((col("l_orderkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()).localCheckpoint(true))

  /** Session-staged (src, dst, odeg) pagerank edge table over the
    * bipartite graph ([[Traversals.pageRankEdgeTable]] artifact,
    * memoized like the edge tables above; persisted blocks die with
    * the session). The edge-table dependency is resolved BEFORE the
    * memo insert (its own `graphMemo` call), which SessionMemo makes
    * safe — the build runs outside any map mapping function. */
  private def bipartiteEo(s: SparkSession, d: String): DataFrame = {
    val edges = bipartiteEdges(s, d)
    graphMemo(s, d, "bip_eo", Tables.fingerprint(d, "lineitem"))(
      Traversals.pageRankEdgeTable(edges))
  }

  /** Per-customer order chains (consecutive orderkeys linked) —
    * components = customers; ~15 k vertices at sf0.01. Returned
    * DIRECTED (one row per chain link): the only consumer is GraphX
    * connectedComponents, whose Pregel propagates along both edge
    * directions, so mirroring would double the edge RDD for nothing. */
  private def chainOrdersEdges(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey").as("src"),
        lead(col("o_orderkey"), 1).over(w).as("dst"))
      .where(col("dst").isNotNull)
      .select(col("src"), col("dst"))
  }

  /** DIRECTED fixture for SCC: eight 16-vertex rings over the
    * orderkey residues mod 128 (each ring a base SCC), overlaid with
    * data-dependent cross edges — a sampled low-ring→high-ring "down"
    * family that keeps the condensation a DAG, plus a rare (k % 997)
    * high→low "up" family whose presence merges the ring interval it
    * closes. SCC structure therefore varies with SF (sf0.001: six
    * rings + one 32-merge; sf0.01: four rings + two 32-merges) while
    * staying exactly reproducible in the DuckDB twin. */
  private def sccEdges(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").select(col("o_orderkey").cast("long").as("k"))
    val ring = o.select((col("k") % 128).as("src")).distinct()
      .withColumn("dst",
        when(col("src") % 16 < 15, col("src") + 1).otherwise(col("src") - 15))
    def cross(filterMod: Long, srcRing: org.apache.spark.sql.Column,
              dstRing: org.apache.spark.sql.Column) =
      o.where((col("k") % filterMod === 0) &&
          ((col("k") * 7) % 8 < (col("k") * 3) % 8))
        .select((srcRing * 16 + col("k") % 16).as("src"),
          (dstRing * 16 + shiftright(col("k"), 4) % 16).as("dst"))
        .distinct()
    val dn = cross(13, (col("k") * 7) % 8, (col("k") * 3) % 8)
    val up = cross(997, (col("k") * 3) % 8, (col("k") * 7) % 8)
    ring.union(dn).union(up).distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_scc_big" -> ((s, d) => {
      // SCC at DATA scale (~150k vertices at sf0.1): per-customer
      // order chains directed ascending, plus sampled back-to-first
      // edges (every 23rd orderkey) that close a cycle over the
      // customer's prefix. Ground truth has a closed form — the SCC
      // is exactly the prefix up to the LARGEST back-edge source
      // (every prefix vertex reaches it forward, it returns to the
      // first) — so the oracle needs no reachability closure and the
      // gate stays exact at any SF. Output: component-size histogram
      // (bounded). The coloring algorithm resolves this shape in ONE
      // peel: ids ascend along each chain, so every vertex past the
      // last back-edge source is its own color root, and the prefix
      // class resolves through its root in the same round.
      val o = t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey").cast("long").as("k"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("k"))
      val chain = o.withColumn("nxt", lead(col("k"), 1).over(w))
        .where(col("nxt").isNotNull)
        .select(col("k").as("src"), col("nxt").as("dst"))
      val firsts = o.groupBy("o_custkey")
        .agg(min(col("k")).as("f"), count(lit(1)).as("n"))
      val back = o.join(firsts, "o_custkey")
        .where((col("n") >= 2) && (col("k") % 23 === 0) && (col("k") =!= col("f")))
        .select(col("k").as("src"), col("f").as("dst"))
      Traversals.stronglyConnectedComponents(chain.union(back))
        .groupBy("component").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_components"))
        .orderBy("sz")
    }),
    "q_graph_scc" -> ((s, d) =>
      // strongly connected components of the directed ring+cross
      // fixture via FW-BW min-label peeling (Traversals.scala) — the
      // oracle is ground truth from the full mutual-reachability
      // closure, so it validates ANY correct SCC algorithm
      Traversals.stronglyConnectedComponents(sccEdges(s, d)).orderBy("vertex")),
    "q_graph_triads" -> ((s, d) => {
      // directed TRIAD motif census — cyclic (a→b→c→a) vs
      // feed-forward (a→b→c with the a→c shortcut) triangle counts
      // over the ring+cross fixture, plus their ratio's integer
      // parts: the motif fingerprint that separates hierarchy
      // (feed-forward dominant — the web, citation graphs, food
      // webs) from circulation (cycle dominant). Two wedge joins on
      // the pinned edge table, integer-exact; cycles counted once
      // per rotation then divided by exactly 3 (`div`). The same
      // degree-bounded wedge shape as the undirected triangle
      // machinery — no enumeration beyond wedges.
      val e = sccEdges(s, d).where(col("src") =!= col("dst")).distinct()
        .localCheckpoint(true) // both wedge joins + the closing probes
      val ab = e.select(col("src").as("a"), col("dst").as("b"))
      val bc = e.select(col("src").as("b2"), col("dst").as("c"))
      val wedge = ab.join(bc, col("b") === col("b2"))
        .where(col("a") =!= col("c"))
        .select(col("a"), col("b"), col("c"))
      val cyc = wedge.join(e.select(col("src").as("c2"), col("dst").as("a2")),
          col("c") === col("c2") && col("a") === col("a2"))
        .agg(count(lit(1)).as("n3"))
        .select(expr("n3 div 3").as("cyclic"))
      val ffd = wedge.join(e.select(col("src").as("a3"), col("dst").as("c3")),
          col("a") === col("a3") && col("c") === col("c3"))
        .agg(count(lit(1)).as("feedforward"))
      cyc.crossJoin(ffd)
        .crossJoin(e.agg(count(lit(1)).as("n_edges")))
        .select(col("n_edges"), col("cyclic"), col("feedforward"))
    }),
    "q_graph_bowtie" -> ((s, d) => {
      // BOW-TIE decomposition (Broder et al., WWW 2000) of the
      // directed ring+cross fixture — the structural census every
      // web-corpus crawl audit reports: the largest SCC is the CORE,
      // IN reaches it, OUT is reached from it, everything else is
      // tendril/disconnected OTHER. Composition of two existing
      // primitives: the FW-BW SCC peel picks the core, then two
      // set-seeded reachability fixpoints (Traversals.reachableFrom,
      // seeds stay distributed — no driver collect) classify the
      // rest; a vertex in both frontiers would be in the core's SCC,
      // so the four classes partition. Per-class size + min-vertex
      // census output, bounded at 4 rows. The oracle derives all
      // three sets independently from the same recursive-CTE
      // reachability closure ground truth q_graph_scc uses. The scc
      // fixture's ring-level edge structure only allows 1→5 and 3→7
      // (so its core has NO in/out fringe — every class but core/other
      // would be vacuously empty); two deterministic 16-edge rails,
      // ring1→ring3 (an IN candidate) and ring7→ring5 (an OUT
      // candidate), give the decomposition a real tie to cut at every
      // SF (at larger SFs a sampled up-edge may merge them into the
      // core — the oracle recomputes ground truth either way).
      val rails = s.range(0, 16).select(col("id"))
        .select(explode(array(
          struct((col("id") + 16).as("src"), (col("id") + 48).as("dst")),
          struct((col("id") + 112).as("src"), (col("id") + 80).as("dst")))))
        .select(col("col.src").as("src"), col("col.dst").as("dst"))
      val edges = sccEdges(s, d).union(rails).distinct()
        .localCheckpoint(true) // scc + fwd + bwd scans
      val comp = Traversals.stronglyConnectedComponents(edges)
      val coreId = comp.groupBy("component").agg(count(lit(1)).as("sz"))
        .orderBy(col("sz").desc, col("component")).limit(1).select("component")
      val cv = comp.join(broadcast(coreId), "component").select("vertex")
        .localCheckpoint(true) // both reachability seeds + the class check
      val fwd = Traversals.reachableFrom(edges, cv)
      val bwd = Traversals.reachableFrom(
        edges.select(col("dst").as("src"), col("src").as("dst")), cv)
      edges.select(explode(array(col("src"), col("dst"))).as("vertex")).distinct()
        .join(cv.withColumn("isCore", lit(1)), Seq("vertex"), "left")
        .join(bwd.withColumn("isBwd", lit(1)), Seq("vertex"), "left")
        .join(fwd.withColumn("isFwd", lit(1)), Seq("vertex"), "left")
        .select(col("vertex"),
          when(col("isCore") === 1, "core")
            .when(col("isBwd") === 1, "in")
            .when(col("isFwd") === 1, "out")
            .otherwise("other").as("cls"))
        .groupBy("cls").agg(count(lit(1)).as("n_vertices"),
          min("vertex").as("first_vertex"))
        .orderBy("cls")
    }),
    "q_graph_mst" -> ((s, d) => {
      // Borůvka minimum spanning forest at DATA scale, over
      // per-customer order CYCLES (the scc_big chain shape closed
      // back to the first order; customers with ≥3 orders so the
      // back edge never parallels a chain edge). Weight is the
      // deterministic (a·7 + b·13) % 997 + 1 on canonical a<b, total
      // order (w, a, b). Ground truth has a closed form — the MSF of
      // a cycle is the cycle minus its maximum edge under the SAME
      // total order — so the oracle needs no MST search and the gate
      // stays exact at any SF. Output: per-customer forest weight.
      val o = t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey").cast("long").as("k"))
      val n = o.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), min(col("k")).as("f"), max(col("k")).as("l"))
        .where(col("n") >= 3)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("k"))
      val chain = o.join(n.select("o_custkey"), "o_custkey")
        .withColumn("nxt", lead(col("k"), 1).over(w))
        .where(col("nxt").isNotNull)
        .select(col("k").as("src"), col("nxt").as("dst"))
      val back = n.select(col("f").as("src"), col("l").as("dst"))
      val edges = chain.union(back).select(col("src"), col("dst"),
        ((col("src") * 7 + col("dst") * 13) % 997 + 1).cast("double").as("weight"))
      Traversals.minimumSpanningForest(edges)
        .join(o.select(col("k").as("src"), col("o_custkey")), "src")
        .groupBy("o_custkey")
        .agg(sum(col("weight")).cast("long").as("mst_w"))
        .orderBy("o_custkey")
    }),
    // -- the reference's own sample graphs, bundled as resources; the
    // oracles are the hand-derived goldens of FIXTURES.md (from
    // secondary_server.c:142-248 semantics) as literal VALUES --------
    "q_source_matrixv2" -> ((s, _) => {
      // the DataSource V2 path over the reference matrix format:
      // shortname lookup, src-range pushdown (row partitions [4, 7)
      // pruned before any cell parses — pushedFilters carries the
      // predicate, no post-scan Filter on src), canonical edge schema.
      // Oracle: G7's literal edge list with src >= 4.
      s.read.format("graft-matrix")
        .load(graft.sources.MatrixIO.resourcePath("G7.txt"))
        .where(col("src") >= 4)
        .orderBy("src", "dst")
    }),
    "q_sink_matrixv2" -> ((s, d) => {
      // the V2 WRITE path in-gate: overwrite-commit a nation-derived
      // edge set into the dense interop format (explicit n), APPEND a
      // disjoint delta (op=2 modify semantics — cells OR in, commit is
      // atomic temp+rename), then read the merged matrix back through
      // the V2 scan and fold to a fingerprint. The oracle computes the
      // same counts closed-form from nation, so a lost delta, a torn
      // write, or an n mismatch hash-mismatches.
      val dir = java.nio.file.Files.createTempDirectory("graft-q-mxsink")
      try {
        val p = dir.resolve("g.txt").toString
        val nat = t(s, d, "nation").select(col("n_nationkey").cast("long").as("k"))
        nat.where(col("k") > 0 && col("k") < 12)
          .select(col("k").as("src"), floor(col("k") / 2).cast("long").as("dst"))
          .write.format("graft-matrix").mode("overwrite").option("n", 12).save(p)
        nat.where(col("k") < 5)
          .select(col("k").as("src"), (col("k") + 7).as("dst"))
          .write.format("graft-matrix").mode("append").save(p)
        s.read.format("graft-matrix").load(p)
          .agg(count(lit(1)).as("n_edges"),
            sum("src").cast("long").as("sum_src"),
            sum("dst").cast("long").as("sum_dst"))
          .localCheckpoint(true) // sever from the reaped temp file
      } finally {
        try {
          val walk = java.nio.file.Files.walk(dir)
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(q => try java.nio.file.Files.deleteIfExists(q)
                          catch { case _: Exception => () })
          finally walk.close()
        } catch { case _: Exception => () }
      }
    }),
    "q_ref_g7_bfs" -> ((s, _) => {
      Traversals.bfs(graft.sources.MatrixIO.readMatrixResource(s, "G7.txt"), 0L)
        .select(col("order").as("ord"), col("level"), col("vertex"))
        .orderBy("ord")
    }),
    "q_ref_g7_bfs_from3" -> ((s, _) => {
      Traversals.bfs(graft.sources.MatrixIO.readMatrixResource(s, "G7.txt"), 3L)
        .select(col("order").as("ord"), col("level"), col("vertex"))
        .orderBy("ord")
    }),
    "q_ref_g7_dfs_leaves" -> ((s, _) => {
      Traversals.dfsLeaves(graft.sources.MatrixIO.readMatrixResource(s, "G7.txt"), 0L)
        .orderBy("vertex")
    }),
    "q_ref_g5_dfs_leaves" -> ((s, _) => {
      Traversals.dfsLeaves(graft.sources.MatrixIO.readMatrixResource(s, "G5.txt"), 0L)
        .orderBy("vertex")
    }),
    "q_graph_bfs_big" -> ((s, d) => {
      // BFS over the full bipartite graph from the smallest order
      // vertex; output level histogram (the traversal itself is the
      // operator under test; the histogram keeps output bounded).
      // GraphX Pregel here: supersteps replan/recompile nothing, where
      // the DataFrame BSP loop pays SQL planning + codegen per level
      // (measured 2.7 s vs 7.2 s cold at sf0.1). The DataFrame loop
      // stays the gate-exercised path for q_graph_bfs / q_ref_g7_*.
      val start = t(s, d, "lineitem")
        .agg(min(col("l_orderkey")).cast("long").as("m")).head().getLong(0) * 2
      Traversals.bfsLevelsPregel(bipartiteEdges(s, d), start)
        .groupBy("level")
        .agg(count(lit(1)).as("cnt"), min(col("vertex")).as("min_v"),
          max(col("vertex")).as("max_v"))
        .orderBy("level")
    }),
    "q_graph_cc_big" -> ((s, d) => {
      // components of the per-customer order chains == customers.
      // GraphX's Pregel CC stays the choice here: re-measured in the
      // bench harness (r10, same noisy window, median-of-reps with
      // per-query GC) at 3.8 s vs 7.3 s for the pointer-jumping
      // DataFrame loop — deep/narrow graphs favour GraphX's in-core
      // supersteps even after the loop's fused-first-round + 2-jump
      // improvements. (An in-session A/B without the harness's GC
      // hygiene shows the OPPOSITE ordering — RDD cache pressure from
      // prior queries inflates GraphX 3x — so only harness numbers
      // decide this.) Traversals.connectedComponents stays the
      // pure-DataFrame path (q_graph_cc + union-find property suite).
      graft.operators.GraphAlgos.connectedComponentsGraphX(chainOrdersEdges(s, d))
        .groupBy("component")
        .agg(count(lit(1)).as("sz"))
        .groupBy("sz")
        .agg(count(lit(1)).as("n_components"))
        .orderBy("sz")
    }),
    "q_graph_bfs" -> ((s, d) => {
      Traversals.bfs(treeEdges(s, d), 0L)
        .select(col("order").as("ord"), col("level"), col("vertex"))
        .orderBy("ord")
    }),
    "q_graph_dfs_leaves" -> ((s, d) => {
      Traversals.dfsLeaves(treeEdges(s, d), 0L).orderBy("vertex")
    }),
    "q_graph_dfs_leaves_big" -> ((s, d) => {
      // DFS-tree leaves on a DATA-scale derivation (r12 VERDICT item
      // 4): the staged directed mod-150 graph — every orders row feeds
      // it. Phase 1 (reachability) and the r13 replay-input reduction
      // run distributed; the sequential replay sees only the reduced
      // reachable adjacency. The recursive-CTE oracle steps the exact
      // same explicit-stack walk.
      Traversals.dfsLeaves(modulusDirected(s, d, 150), 0L).orderBy("vertex")
    }),
    "q_graph_dfs_classes" -> ((s, d) => {
      // The ANY-scale half of the DFS story: order-invariant
      // leaf/internal classification, fully distributed — the operator
      // that answers past dfsReplayMaxEdges, where replay cannot
      // (Traversals.dfsLeafClasses scaladoc has the soundness
      // argument AND the counterexample for the tempting-but-wrong
      // BFS-level rule). Graph: the DIRECTED order→supplier bipartite
      // DAG under a virtual root (-1 → every order vertex), so
      // suppliers are provably-leaf, uniquely-sourced suppliers make
      // their order provably-internal, and shared-supplier orders
      // stay honestly undecided. Closed-form oracle — no sequential
      // simulation anywhere.
      val p = t(s, d, "lineitem")
        .select((col("l_orderkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = p.union(
        p.select(col("src")).distinct().select(lit(-1L).as("src"), col("src").as("dst")))
      Traversals.dfsLeafClasses(edges, -1L).orderBy("vertex")
    }),
    "q_graph_dfs_reduce" -> ((s, d) => {
      // The r14 forest-ancestor reduction MEASURED in-gate (verdict
      // item 5): per-round live-edge counts of the unified
      // certain-ANCESTOR drop rule. Fixture: the mod-150 CHAIN graph
      // (k → k+1 per present orders residue — data-scale scan,
      // saturating vertex set, the modulus-graph convention) with two
      // LAYERS of deep back-edges at k % 31 = 5: k → k−9 and
      // k → k−18. The −9 layer is provably inert on the raw live set
      // but INVISIBLE to the r13 parent rule (no edge targets its own
      // unique in-neighbor); the −18 layer is blocked in round 1
      // because each −9 target sits two-in-neighbored on its chain —
      // round 1's drop MINTS those parents and round 2 clears the
      // −18 layer; round 3's n_dropped = 0 is the fixpoint witness.
      // The oracle replays the identical rounds with a recursive
      // ancestor-closure CTE — the closure and the engine's
      // pointer-jump walk must name the same edge set.
      //
      // The reachability-restricted live set is SESSION-STAGED (r15
      // verdict item: the one r15 addition that skipped the staging
      // convention, and the heaviest headline entry for it at 4.54 s):
      // the derivation scan + the depth-149 BFS — ~150 driver-loop
      // supersteps of pure per-fixture rebuild — run once per orders
      // generation, and bench reps time the REDUCTION ROUNDS, the
      // operator this entry exists to measure. Same memo contract as
      // the modulus edge tables (orders-fingerprint keyed, refresh-
      // safe, session-reaped).
      val live = graphMemo(s, d, "reduce_live150",
          Tables.fingerprint(d, "orders")) {
        val ks = Tables.t(s, d, "orders")
          .select((col("o_orderkey") % 150).cast("long").as("k")).distinct()
        val chain = ks.where(col("k") < 149)
          .select(col("k").as("src"), (col("k") + 1).as("dst"))
        val back1 = ks.where(col("k") % 31 === 5 && col("k") > 9)
          .select(col("k").as("src"), (col("k") - 9).as("dst"))
        val back2 = ks.where(col("k") % 31 === 5 && col("k") > 18)
          .select(col("k").as("src"), (col("k") - 18).as("dst"))
        Traversals.reductionLiveSet(
          chain.union(back1).union(back2), 0L)
      }
      Traversals.certainReductionTraceLive(live, rounds = 3)
        .orderBy("round")
    }),
    "q_graph_dfs_residual" -> ((s, d) => {
      // The undecided residue SETTLED (r13 VERDICT item 4): rule
      // classes + residual replay on the data-scale mod-150 graph
      // (dfs_leaves_big's fixture, so the walk oracle machinery is
      // shared). Output is the operator's honesty audit: per class,
      // the rule-settled count, the exact final count, and the rule
      // fraction in exact ppm (integer division — no float quotient
      // can straddle a round boundary cross-engine). The undecided
      // row's frac_ppm_rule IS the measured order-dependence of this
      // graph; its n_final is 0 because the replay settles everything.
      val r = Traversals.dfsLeafResidual(modulusDirected(s, d, 150), 0L)
      val tot = r.count()
      val byRule = r.groupBy(col("cls_rule").as("cls"))
        .agg(count(lit(1)).as("n_rule"))
      val byFinal = r.groupBy(col("cls_final").as("cls"))
        .agg(count(lit(1)).as("n_final"))
      // FULL outer: a class can exist only on one side (a dense graph
      // has no rule-leaf, yet the replay settles leaves; undecided
      // exists only on the rule side)
      byRule.join(byFinal, Seq("cls"), "full_outer")
        .select(col("cls"),
          coalesce(col("n_rule"), lit(0L)).as("n_rule"),
          coalesce(col("n_final"), lit(0L)).as("n_final"),
          expr(s"coalesce(n_rule, 0L) * 1000000 div $tot").as("frac_ppm_rule"))
        .orderBy("cls")
    }),
    "q_graph_cc" -> ((s, d) => {
      Traversals.connectedComponents(chainEdges(s, d)).orderBy("vertex")
    }),
    "q_graph_bfs_multi" -> ((s, d) => {
      // multi-source BFS (landmark distances): level = min hop distance
      // from EITHER seed — one superstep loop, whole seed set at level 0
      Traversals.bfsLevelsMulti(treeEdges(s, d), Seq(0L, 24L))
        .select(col("vertex"), col("level").cast("int").as("level"))
        .orderBy("vertex")
    }),
    "q_graph_bfs_bidir" -> ((s, d) => {
      // point-to-point distances via bidirectional BFS (meet in the
      // middle): the driver assembles 3 fixture pairs' results — each
      // search is its own bounded superstep loop and the output is 3
      // rows by construction, so the collect is the contract, not a
      // scale leak. Oracle: the 3 pairs' distances from the
      // recursive-CTE distance table.
      import s.implicits._
      val e = treeEdges(s, d)
      Seq((15L, 24L), (0L, 23L), (9L, 12L))
        .map { case (a, b) =>
          (a, b, Traversals.bfsBidirectional(e, a, b).getOrElse(-1L)) }
        .toDF("a", "b", "dist")
        .orderBy("a")
    }),
    "q_graph_ppr" -> ((s, d) => {
      // personalized PageRank from seeds {0, 24}: restart mass returns
      // only to the seeds, so rank localizes around their neighborhoods
      // — the similar-items ranking primitive. Deterministic decimal
      // sums → EXACT 10-iteration-unrolled DuckDB oracle.
      Traversals.personalizedPageRank(treeEdges(s, d), Seq(0L, 24L), iters = 10)
        .select(col("vertex"), round(col("rank"), 6).as("rank"))
        .orderBy("vertex")
    }),
    "q_graph_katz" -> ((s, d) => {
      // Katz centrality (Katz 1953): katz(v) = Σ_k β^k·walks_k(v),
      // the walk-count centrality between degree (k=1 truncation) and
      // eigenvector centrality (k→∞) — the missing member of the
      // centrality family (pagerank/HITS/closeness/harmonic/
      // betweenness/eccentricity all in-gate). β = 1/2 EXACTLY and 4
      // unrolled steps, so katz16 = Σ_k 2^(4−k)·walks_k is an exact
      // integer (the dyadic-β sibling of holt's α=β=½ discipline) and
      // the /16 readout is exact in binary AND decimal — no rounding
      // anywhere. Each step is one src-keyed join + hash agg (the
      // pagerank superstep shape; fixed k, so plan depth is bounded).
      val e = treeEdges(s, d)
      val verts = e.select(col("src").as("vertex"))
        .union(e.select(col("dst").as("vertex"))).distinct()
        .localCheckpoint(true) // walk base + final spine
      var p = verts.withColumn("w", lit(1L))
      var acc: DataFrame = null
      for (k <- 1 to 4) {
        p = e.join(p, e("src") === p("vertex"))
          .groupBy(e("dst").as("vertex")).agg(sum(col("w")).as("w"))
        val contrib = p.select(col("vertex"),
          (col("w") * lit(1L << (4 - k))).as("c"))
        acc = if (acc == null) contrib else acc.union(contrib)
      }
      verts.join(acc.groupBy("vertex").agg(sum(col("c")).as("katz16")),
          Seq("vertex"), "left_outer")
        .select(col("vertex"),
          coalesce(col("katz16"), lit(0L)).as("katz16"),
          (coalesce(col("katz16"), lit(0L)) / lit(16.0)).as("katz"))
        .orderBy("vertex")
    }),
    "q_graph_ppr_multi" -> ((s, d) => {
      // BATCH PPR: independent per-seed PPR vectors for seeds {0, 24}
      // computed in ONE superstep loop (state keyed (seed, vertex) —
      // k seeds cost kx the shuffled rows but 1x the barriers; the
      // recsys/GNN-sampling nightly precompute shape). Each seed's
      // slice is bit-identical to the single-seed operator
      // (spec-pinned), so the oracle is two unrolled single-seed
      // chains unioned.
      Traversals.personalizedPageRankBatch(treeEdges(s, d), Seq(0L, 24L), iters = 10)
        .select(col("seed"), col("vertex"), round(col("rank"), 6).as("rank"))
        .orderBy("seed", "vertex")
    }),
    "q_graph_eccentricity" -> ((s, d) => {
      // per-vertex eccentricity (max hop distance to any reachable
      // vertex) off the SAME landmark distance table as closeness —
      // one multi-root BFS serves every distance-derived metric; the
      // graph diameter/radius are one more agg over this output.
      val e = treeEdges(s, d)
      val roots = e.select(col("src").as("root")).distinct()
      Traversals.multiSourceDistances(e, roots)
        .groupBy(col("root").as("vertex"))
        .agg(max("level").cast("long").as("ecc"))
        .orderBy("vertex")
    }),
    "q_graph_betweenness" -> ((s, d) => {
      // betweenness centrality off the SAME landmark distance table:
      // on a graph with unique shortest paths (the tree fixture), v
      // lies on the s→t path iff d(s,v) + d(v,t) = d(s,t), so bc(v)
      // is a count over the distance-table triple join — no per-path
      // enumeration (Brandes' observation, restated as joins). The
      // count is over ORDERED (s,t) pairs (2× the undirected bc).
      // Scale shape: at 100 TB roots become a sampled landmark set
      // (state O(k·V), the standard approximation); the triple join
      // shuffles on vertex keys only. The distance table feeds three
      // join sides -> pinned (repo read-twice rule).
      val e = treeEdges(s, d)
      val roots = e.select(col("src").as("root")).distinct()
      val dist = Traversals.multiSourceDistances(e, roots).localCheckpoint(true)
      val sv = dist.select(col("root").as("s"), col("vertex").as("v"), col("level").as("a"))
      val vt = dist.select(col("root").as("v2"), col("vertex").as("t"), col("level").as("b"))
      val st = dist.select(col("root").as("s2"), col("vertex").as("t2"), col("level").as("c"))
      val bc = sv.join(vt, col("v") === col("v2"))
        .where(col("s") =!= col("v") && col("t") =!= col("v"))
        .join(st, col("s") === col("s2") && col("t") === col("t2"))
        .where(col("a") + col("b") === col("c"))
        .groupBy(col("v")).agg(count(lit(1)).as("bc"))
      roots.join(bc, col("root") === col("v"), "left_outer")
        .select(col("root").as("vertex"), coalesce(col("bc"), lit(0L)).as("bc"))
        .orderBy("vertex")
    }),
    "q_graph_closeness" -> ((s, d) => {
      // closeness centrality via the landmark-distance table
      // (Traversals.multiSourceDistances): per-root BFS state keyed
      // (root, vertex), ONE superstep loop for all roots. The
      // 25-vertex tree keeps roots = ALL vertices, so sum_dist/n_reach
      // is exact closeness and the recursive-CTE oracle can verify it;
      // at 100 TB the same operator runs with a sampled landmark root
      // set (state O(k·V)) — the standard scalable approximation.
      // Integer outputs (distance sum + reach count), no division —
      // oracle-stable.
      val e = treeEdges(s, d)
      val roots = e.select(col("src").as("root")).distinct()
      Traversals.multiSourceDistances(e, roots)
        .groupBy(col("root").as("vertex"))
        .agg(sum("level").cast("long").as("sum_dist"),
             count(lit(1)).cast("long").as("n_reach"))
        .orderBy("vertex")
    }),
    "q_sql_recursive" -> ((s, d) => {
      // Spark 4's WITH RECURSIVE executed IN-ENGINE (SPARK-24497):
      // BFS reachability over the mirrored heap tree written as the
      // same recursive SQL the DuckDB oracles have used all along —
      // the declarative traversal surface next to the operator-level
      // Traversals.bfs. The level bound caps recursion depth (the
      // tree's diameter is 8); UNION ALL + min(level) is the standard
      // acyclic-reachability shape.
      t(s, d, "nation").createOrReplaceTempView("nation_rec")
      s.sql("""
        WITH RECURSIVE r(vertex, level) AS (
          SELECT CAST(0 AS BIGINT), 0
          UNION ALL
          SELECT e.dst, r.level + 1
          FROM r JOIN (
            SELECT CAST(n_nationkey AS BIGINT) AS src,
                   CAST(FLOOR(n_nationkey / 2) AS BIGINT) AS dst
            FROM nation_rec WHERE n_nationkey > 0
            UNION ALL
            SELECT CAST(FLOOR(n_nationkey / 2) AS BIGINT),
                   CAST(n_nationkey AS BIGINT)
            FROM nation_rec WHERE n_nationkey > 0) e
          ON e.src = r.vertex
          WHERE r.level < 10)
        SELECT vertex, CAST(min(level) AS INT) AS level
        FROM r GROUP BY vertex ORDER BY vertex""")
    }),
    "q_graph_diameter" -> ((s, d) => {
      // exact + effective diameter off the same all-roots distance
      // table as closeness: the true diameter (max pairwise distance)
      // and the 90th-percentile "effective diameter" (the robust
      // small-world statistic — ANF/HyperANF's target), picked with
      // the integer cut rule the quantile family uses (cum*10 >= n*9,
      // no float percentile). All-roots is fixture-exact; at 100 TB
      // the same fold runs over sampled landmark roots.
      val e = treeEdges(s, d)
      val roots = e.select(col("src").as("root")).distinct()
      val dist = Traversals.multiSourceDistances(e, roots)
        .where(col("level") > 0).select(col("level").cast("long").as("dl"))
      val byd = dist.groupBy("dl").agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("dl")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      byd.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
        .agg(max(col("dl")).as("diameter"),
          min(when(col("cum") * 10 >= col("n") * 9, col("dl")))
            .as("eff_diameter_p90"),
          max(col("n")).as("n_pairs"))
    }),
    "q_graph_harmonic" -> ((s, d) => {
      // harmonic centrality off the same all-roots distance table as
      // closeness — the centrality that stays defined on disconnected
      // graphs. Emitted LCM-SCALED: h2520 = Σ floor(2520 / d), and
      // 2520 = lcm(1..10) makes every term exact for d <= 10 (the
      // 25-vertex tree's diameter is 8), so the sum is a plain BIGINT
      // and the oracle needs no float reciprocal sum (order-dependent
      // double addition is exactly what the determinism convention
      // bans). Same 100 TB story as closeness: sampled landmark roots.
      val e = treeEdges(s, d)
      val roots = e.select(col("src").as("root")).distinct()
      Traversals.multiSourceDistances(e, roots)
        .where(col("level") > 0)
        .groupBy(col("root").as("vertex"))
        .agg(sum(expr("2520 DIV level")).cast("long").as("h2520"),
          count(lit(1)).cast("long").as("n_reach"))
        .orderBy("vertex")
    }),
    "q_graph_reciprocity" -> ((s, d) => {
      // directed reciprocity: the fraction of directed edges whose
      // reverse also exists — the directedness fingerprint (1.0 for a
      // mirrored graph, ~0 for a DAG). One self equi-join on the
      // swapped key pair over the pinned distinct edge list; integer
      // counts, one closing division.
      // session-staged directed mod-150 table (feeds both sides + the
      // total; shared with q_graph_hits)
      val e = modulusDirected(s, d, 150)
      val recip = e.as("f").join(e.as("r"),
        col("f.src") === col("r.dst") && col("f.dst") === col("r.src"))
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(recip.agg(count(lit(1)).as("n_reciprocal")))
        .select(col("n_edges"), col("n_reciprocal"),
          round(col("n_reciprocal").cast("double") / col("n_edges"), 4)
            .as("reciprocity"))
    }),
    "q_graph_assortativity" -> ((s, d) => {
      // degree assortativity (Newman 2002) of the data-scale key-
      // derived graph: Pearson correlation of endpoint degrees over
      // the mirrored edge ends. The repo's exact-moments convention:
      // every power sum is an exact BIGINT over integer degrees; the
      // coefficient is reported SQUARED with its sign (r² + sign_num,
      // the q_events_abtest t² precedent) so no sqrt crosses engines.
      // session-staged mod-300 table (feeds sym + the degree agg)
      val und = modulusUnd(s, d, 300)
      val sym = mirror(und.select(col("a").as("src"), col("b").as("dst")))
      val deg = sym.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
      val ends = sym
        .join(broadcast(deg).as("dx"), col("src") === col("dx.v"))
        .join(broadcast(deg).as("dy"), col("dst") === col("dy.v"))
        .select(col("dx.deg").as("x"), col("dy.deg").as("y"))
      val g = ends.agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"), sum(col("y") * col("y")).as("sy2"))
      val num = col("m") * col("sxy") - col("sx") * col("sy")
      val dx = (col("m") * col("sx2") - col("sx") * col("sx")).cast("double")
      val dy = (col("m") * col("sy2") - col("sy") * col("sy")).cast("double")
      g.select(col("m").cast("long").as("m"), num.cast("long").as("num"),
        round(num.cast("double") * num.cast("double") / (dx * dy), 6).as("r2"),
        signum(num.cast("double")).cast("int").as("sign_num"))
    }),
    "q_graph_sssp" -> ((s, d) => {
      // weighted SSSP over the heap tree, weight = (src+dst) % 5 + 1
      val e = treeEdges(s, d)
        .withColumn("w", (col("src") + col("dst")) % 5 + 1)
      Traversals.sssp(e, 0L)
        .select(col("vertex"), col("dist"))
        .orderBy("vertex")
    }),
    "q_graph_degree" -> ((s, d) => {
      treeEdges(s, d).groupBy(col("src").as("vertex"))
        .agg(count(lit(1)).as("degree"))
        .orderBy("vertex")
    }),
    "q_graph_pagerank" -> ((s, d) => {
      // Deterministic PageRank (10 iters, decimal-summed contributions)
      // — EXACT DuckDB oracle (10 unrolled iterations). The GraphX
      // staticPageRank path stays as the library operator
      // (GraphAlgosSpec asserts both agree to float tolerance).
      Traversals.pageRankDeterministic(treeEdges(s, d), iters = 10)
        .select(col("vertex"), round(col("rank"), 6).as("rank"))
        .orderBy("vertex")
    }),
    "q_graph_pagerank_graphx" -> ((s, d) => {
      // The GraphX staticPageRank path IN-GATE (r11 VERDICT item 7):
      // the flagship "GraphX for analytics" operator had only a
      // test-side tolerance check; this entry oracles it. 2 fixed
      // iterations of the same unnormalized recurrence
      // (rank' = 0.15 + 0.85·Σ rank/outdeg, rank₀ = 1) on the 25-node
      // tree, unrolled in the oracle with plain double arithmetic
      // (GraphX's own message type). Cross-engine sum-order float
      // drift is ≤ ulp-scale on ≤3-term messages — far inside the
      // round(,6) grid on this deterministic fixture, so the compare
      // stays exact (same rationale as the decimal-free q_graph_hits
      // deferral, checked empirically at both gate SFs).
      graft.operators.GraphAlgos.pageRank(treeEdges(s, d), iters = 2)
        .select(col("vertex"), round(col("rank"), 6).as("rank"))
        .orderBy("vertex")
    }),
    "q_graph_pagerank_big" -> ((s, d) => {
      // PageRank at DATA scale: 5 deterministic iterations over the
      // 600k-edge (sf0.1) order–supplier bipartite graph — the bench
      // entry that watches per-iteration overhead (join + decimal-sum
      // agg per superstep) as fixtures grow; q_graph_pagerank on the
      // 25-node tree stays the semantics fixture. Output bounded:
      // top-20 by rounded rank, vertex tie-break.
      // staged-artifact form (r12): the (src, dst, odeg) edge table is
      // built once per session over the memoized bipartite graph and
      // shared across runs — the materialized edge view a production
      // pagerank deployment persists (ivf_indexed precedent); ranks
      // are bit-identical to the one-shot wrapper (spec-pinned)
      Traversals.pageRankDeterministicStaged(bipartiteEo(s, d), iters = 5)
        .select(col("vertex"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("vertex")).limit(20)
    }),
    "q_graph_jaccard" -> ((s, d) => {
      // per-edge neighborhood Jaccard (link prediction / edge
      // cleaning) over the same data-scale key-derived graph as
      // q_graph_triangles_big; common-neighbor counts come from the
      // degree-oriented wedge machinery (skew-safe), the oracle from
      // the textbook symmetric-adjacency self-join — different
      // physical strategy, same similarity values. Edge set staged
      // once per session (modulusUnd memo, shared with ktruss/
      // linkpred/triangles_big/assortativity).
      graft.operators.GraphAlgos.jaccardPerEdgeCanon(modulusUnd(s, d, 300))
        .orderBy("src", "dst")
    }),
    "q_graph_squares" -> ((s, d) => {
      // 4-cycle (square) counting — the motif family beyond triangles:
      // every square a–w1–b–w2 is determined by a diagonal pair {a,b}
      // plus 2 of its codeg(a,b) common neighbours, and each square
      // has exactly two diagonals, so #C4 = Σ_pairs C(codeg,2) / 2 —
      // all integer arithmetic, no cycle enumeration. Codegrees come
      // from the same wedge equi-join as link prediction (modulus-
      // bounded graph); output is the top-10 diagonal pairs by squares
      // carried, with the graph total as a broadcast-scalar column.
      // pin rule satisfied by the session memo: und feeds sym twice
      // via the wedge join, staged once for the whole mod-150 family.
      // r20: machinery moved to GraphAlgos.squareDiagTop — identical
      // distributed wedge plan past the dense-local bounds, packed-
      // bitmap codegree enumeration below them (Wave34Spec pins the
      // two paths row-for-row equal).
      graft.operators.GraphAlgos.squareDiagTop(modulusUnd(s, d, 150), topN = 10)
        .orderBy(col("nsq").desc, col("a"), col("b"))
    }),
    "q_graph_ktruss" -> ((s, d) => {
      // 4-truss of the data-scale key-derived graph (edge analogue of
      // q_graph_kcore): 2 fixed peel rounds dropping edges with
      // triangle support < 2, survivors reported with their round-2
      // support. Fixed rounds — not fixpoint — so the oracle unrolls
      // the identical peels (kcore contract); support comes from the
      // degree-oriented wedge machinery (skew-safe at scale), the
      // oracle from the textbook symmetric-adjacency triple join.
      // Edge set from the shared session-staged mod-300 table; the
      // peel never drops the memo's checkpoint blocks (ownsInput=false).
      graft.operators.GraphAlgos
        .trussPeelCanon(modulusUnd(s, d, 300), k = 4, rounds = 2)
        .orderBy("src", "dst")
    }),
    "q_graph_linkpred" -> ((s, d) => {
      // Link prediction over the same data-scale key-derived graph as
      // q_graph_jaccard: for every NON-adjacent pair with at least one
      // common neighbour, score by common-neighbour count (exact int)
      // with preferential attachment deg(a)·deg(b) as the tiebreak —
      // the two classic integer-exact predictors (Adamic-Adar's 1/log
      // weight is deliberately not used: cross-engine float logs break
      // hash parity; CN ordering is what the benchmark literature
      // ranks by anyway). Wedge generation is the same per-center
      // bounded pair expansion as the triangle machinery; candidates
      // anti-join the edge set, degrees broadcast (≤300 vertices by
      // construction at any SF — the modulus bounds the vertex set,
      // not the data). Deterministic top-100 by (cn, pa, a, b).
      // pin rule (basket_pairs precedent): und feeds the wedge join
      // twice (via sym), the anti-join build, and both degree joins —
      // served by the session-staged mod-300 table (≤ |V|²/2 rows by
      // the modulus bound), shared with jaccard/ktruss/triangles_big.
      // r20: machinery moved to GraphAlgos.linkPredictionCanon —
      // identical distributed wedge plan past the dense-local bounds,
      // packed-bitmap candidate enumeration below them (Wave34Spec
      // pins the two paths row-for-row equal).
      graft.operators.GraphAlgos.linkPredictionCanon(modulusUnd(s, d, 300), topN = 100)
        .orderBy(col("cn").desc, col("pa").desc, col("a"), col("b"))
    }),
    "q_graph_hits" -> ((s, d) => {
      // HITS hubs & authorities on a DIRECTED key-derived graph —
      // 2 power iterations in EXACT integer arithmetic (h₀=1;
      // aᵢ=Σ_{u→v}hᵢ₋₁(u); hᵢ=Σ_{u→v}aᵢ(v)): the per-iteration L2
      // normalisation is rank-invariant presentation, so deferring it
      // keeps every score a BIGINT and the oracle exact (the same
      // deferral q_text_lift uses to avoid cross-engine floats). Each
      // half-iteration is one equi-join + one hash agg keyed by
      // vertex — the pagerank superstep shape; the edge list is pinned
      // tiny here (modulus 150) but the plan is partition-wise at any
      // scale. Zero-fill keeps sink/source vertices in the report.
      // pin rule: e feeds the vertex union plus three join/agg passes
      // (a1, h1, a2) — served by the session-staged directed mod-150
      // table (shared with q_graph_reciprocity)
      val e = modulusDirected(s, d, 150)
      val verts = e.select(col("src").as("v"))
        .union(e.select(col("dst").as("v"))).distinct()
      val a1 = e.groupBy(col("dst").as("v")).agg(count(lit(1)).as("a1"))
      val h1 = e.join(a1, e("dst") === a1("v"))
        .groupBy(col("src").as("v")).agg(sum(col("a1")).as("h1"))
      val a2 = e.join(h1, e("src") === h1("v"))
        .groupBy(col("dst").as("v")).agg(sum(col("h1")).as("a2"))
      verts.join(h1.select(col("v"), col("h1")), Seq("v"), "left_outer")
        .join(a2.select(col("v"), col("a2")), Seq("v"), "left_outer")
        .select(col("v").as("vertex"),
          coalesce(col("h1"), lit(0L)).cast("long").as("hub"),
          coalesce(col("a2"), lit(0L)).cast("long").as("auth"))
        .orderBy("vertex")
    }),
    "q_graph_lpa" -> ((s, d) => {
      // Deterministic synchronous label propagation, 2 fixed rounds
      // (most-frequent neighbour label, ties to the smallest) — the
      // community-detection primitive; the oracle unrolls the same two
      // rounds in SQL.
      Traversals.labelPropagation(treeEdges(s, d), iters = 2)
        .orderBy("vertex")
    }),
    "q_graph_vcover" -> ((s, d) => {
      // 2-approximation VERTEX COVER from the maximal matching — the
      // textbook guarantee (Gavril): both endpoints of a maximal
      // matching cover every edge at ≤ 2·OPT. Built on the verified
      // greedy matching over the staged mod-150 graph; the readout
      // carries its own PROOF — n_uncovered counts edges missed by
      // the cover (0 when the bounded rounds reached maximality,
      // reported honestly either way).
      val und = modulusUnd(s, d, 150)
      val m = graft.operators.GraphAlgos.greedyMatchingCanon(und, rounds = 3)
      val cover = m.select(col("a").as("v")).union(m.select(col("b")))
        .distinct().localCheckpoint(true) // feeds the count + two anti-joins
      val uncovered = und
        .join(cover.select(col("v").as("ca")), col("a") === col("ca"), "left_anti")
        .join(cover.select(col("v").as("cb")), col("b") === col("cb"), "left_anti")
      und.agg(count(lit(1)).as("n_edges")).crossJoin(
          cover.agg(count(lit(1)).as("n_cover")))
        .crossJoin(und.select(col("a").as("v")).union(und.select(col("b")))
          .distinct().agg(count(lit(1)).as("n_vertices")))
        .crossJoin(uncovered.agg(count(lit(1)).as("n_uncovered")))
        .select(col("n_edges").cast("long").as("n_edges"),
          col("n_vertices").cast("long").as("n_vertices"),
          col("n_cover").cast("long").as("n_cover"),
          col("n_uncovered").cast("long").as("n_uncovered"))
    }),
    "q_graph_matching" -> ((s, d) => {
      // bounded greedy maximal-matching rounds over the staged mod-150
      // graph (GraphAlgos.greedyMatching — the edge-side sibling of
      // Luby MIS). 3 fixed rounds; output (a, b, round), the parallel
      // pairing schedule. Matching feeds real pipeline work too:
      // deterministic pair assignment for A/B dedup arbitration.
      graft.operators.GraphAlgos
        .greedyMatchingCanon(modulusUnd(s, d, 150), rounds = 3)
        .orderBy("a", "b")
    }),
    "q_graph_mis" -> ((s, d) => {
      // bounded Luby maximal-independent-set rounds over the staged
      // mod-300 graph — the distributed symmetry-breaking primitive
      // (see Traversals.lubyMis). 3 fixed rounds; on this graph the
      // dense hash-priority competition selects most of the MIS in
      // round 1 and the isolated-survivor rule sweeps stragglers.
      // Output (vertex, round) — which round a vertex won in is part
      // of the semantics (it is the parallel schedule depth).
      Traversals.lubyMis(modulusUnd(s, d, 300)
        .select(col("a").as("src"), col("b").as("dst")), rounds = 3)
        .orderBy("vertex")
    }),
    "q_graph_walks" -> ((s, d) => {
      // deterministic graph walks — the DeepWalk/node2vec sampling
      // primitive with hash-argmin choice instead of an RNG: from
      // every vertex of the staged mod-150 graph, 3 steps where
      // step i moves to the neighbour minimizing md5("walk{i}|cur|n")
      // — content-independent, so the walk corpus is bit-reproducible
      // on any cluster (the property RNG-based samplers lose under
      // retries/speculation). Each step is one vertex-keyed join +
      // one argmin hash agg — the same superstep shape as BFS; at
      // 100 TB walks fan out map-side and only the per-walk argmin
      // shuffles. Output: (start, v1, v2, v3), ≤150 rows by modulus.
      val sym = mirror(modulusUnd(s, d, 150)
        .select(col("a").as("src"), col("b").as("dst")))
        .localCheckpoint(true) // three step joins over one tiny table
      def pick(i: Int, cur: String): org.apache.spark.sql.Column =
        min(struct(md5(concat(lit(s"walk$i|"), col(cur).cast("string"),
          lit("|"), col("dst").cast("string"))).as("h"),
          col("dst").as("n"))).getField("n")
      val w1 = sym.groupBy(col("src").as("start"))
        .agg(pick(1, "src").as("v1"))
      val w2 = w1.join(sym, w1("v1") === sym("src"))
        .groupBy(col("start"), col("v1")).agg(pick(2, "v1").as("v2"))
      w2.join(sym, w2("v2") === sym("src"))
        .groupBy(col("start"), col("v1"), col("v2"))
        .agg(pick(3, "v2").as("v3"))
        .orderBy("start")
    }),
    "q_graph_lpa_big" -> ((s, d) => {
      // label propagation at DATA scale: the same deterministic
      // 2-round synchronous LPA as q_graph_lpa (most-frequent
      // neighbour label, ties to the smallest) but over the shared
      // session-staged mod-300 graph (~45k edges at sf0.1) instead of
      // the 25-node tree — the community-detection entry whose
      // per-round cost is a real vertex-keyed join + hash agg. The
      // oracle unrolls the identical two rounds over the mirrored
      // edge CTE. Output bounded by the modulus (≤300 rows at any SF).
      // labelPropagation symmetrizes internally — pass the canonical
      // staged table directly, no pre-mirror
      Traversals.labelPropagation(modulusUnd(s, d, 300)
        .select(col("a").as("src"), col("b").as("dst")), iters = 2)
        .orderBy("vertex")
    }),
    "q_graph_conductance" -> ((s, d) => {
      // conductance φ(c) = cut(c) / min(vol(c), 2m − vol(c)) of the
      // LPA communities — the BOUNDARY-quality sibling of
      // modularity's density readout (a community can score high Q
      // yet leak; φ is the normalized-cut number sweep/partition
      // papers report). Same deterministic 2-round LPA labels, same
      // mirrored tree fixture; cut counts each cross-community edge
      // toward BOTH endpoint communities, vol = degree mass. All
      // terms exact integers; φ in exact integer ppm with the
      // whole-graph-community guard (min = 0 → 0) identical in both
      // engines. m is a driver scalar like modularity's (broadcast-
      // scalar agg at scale).
      val e = treeEdges(s, d)
      val labels = Traversals.labelPropagation(e, iters = 2)
      val und = e.where(col("src") < col("dst"))
        .select(col("src").as("a"), col("dst").as("b")).distinct()
        .localCheckpoint(true)
      val deg = e.groupBy(col("src").as("vertex")).agg(count(lit(1)).as("deg"))
      val m = und.count()
      val la = labels.select(col("vertex").as("a"), col("label").as("la"))
      val lb = labels.select(col("vertex").as("b"), col("label").as("lb"))
      val cross = und.join(la, "a").join(lb, "b")
        .where(col("la") =!= col("lb"))
        .localCheckpoint(true) // both cut projections
      val cut = cross.select(col("la").as("label"))
        .union(cross.select(col("lb").as("label")))
        .groupBy("label").agg(count(lit(1)).as("cut"))
      labels.join(deg, "vertex")
        .groupBy("label")
        .agg(count(lit(1)).as("n_vertices"), sum(col("deg")).as("vol"))
        .join(cut, Seq("label"), "left_outer")
        .select(col("label"), col("n_vertices"),
          coalesce(col("cut"), lit(0L)).as("cut"),
          col("vol").cast("long").as("vol"),
          when(least(col("vol"), lit(2L * m) - col("vol")) === 0, lit(0L))
            .otherwise(expr(s"coalesce(cut, 0L) * 1000000 div " +
              s"least(vol, ${2L * m} - vol)")).as("phi_ppm"))
        .orderBy("label")
    }),
    "q_graph_modularity" -> ((s, d) => {
      // community-quality readout: Newman modularity of the LPA
      // communities (the measurement entry for community detection,
      // like purity for clustering). Q = Σ_c [e_c/m − (d_c/2m)²]
      // computed in INTEGER form — per-community numerator
      // c_num = 4m·e_c − d_c², total Q = Σc_num / 4m² — so every sum
      // is exact and only the closing division floats. Communities
      // from the verified 2-round deterministic LPA; intra-edges via
      // two label joins on the canonical edge list.
      val e = treeEdges(s, d) // mirrored
      val labels = Traversals.labelPropagation(e, iters = 2)
      val und = e.where(col("src") < col("dst"))
        .select(col("src").as("a"), col("dst").as("b")).distinct()
        .localCheckpoint(true)
      val deg = e.groupBy(col("src").as("vertex")).agg(count(lit(1)).as("deg"))
      val m = und.count() // driver scalar: the graph is the 25-node fixture;
      // at scale this is a broadcast scalar agg like the funnel totals
      val dc = labels.join(deg, "vertex")
        .groupBy("label").agg(count(lit(1)).as("n_vertices"),
          sum(col("deg")).as("d_sum"))
      val la = labels.select(col("vertex").as("a"), col("label").as("la"))
      val lb = labels.select(col("vertex").as("b"), col("label").as("lb"))
      val ein = und.join(la, "a").join(lb, "b")
        .where(col("la") === col("lb"))
        .groupBy(col("la").as("label")).agg(count(lit(1)).as("e_in"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      dc.join(ein, Seq("label"), "left_outer")
        .select(col("label"), col("n_vertices").cast("long").as("n_vertices"),
          coalesce(col("e_in"), lit(0L)).cast("long").as("e_in"),
          col("d_sum").cast("long").as("d_sum"))
        .withColumn("c_num",
          lit(4L) * m * col("e_in") - col("d_sum") * col("d_sum"))
        .withColumn("q_contrib",
          round(col("c_num").cast("double") / (4.0 * m * m), 6))
        .withColumn("modularity",
          round(sum(col("c_num")).over(w).cast("double") / (4.0 * m * m), 6))
        .select("label", "n_vertices", "e_in", "d_sum", "q_contrib", "modularity")
        .orderBy("label")
    }),
    "q_graph_coreness" -> ((s, d) => {
      // bounded core DECOMPOSITION (k-sweep): coreness(v) = max k in
      // 2..7 with v in the k-core — the per-vertex peel-depth
      // statistic one level up from q_graph_kcore's single-k
      // membership (the graph-mining "how deep does this vertex sit"
      // feature). Each k-core comes from the verified fixpoint peel;
      // endpoints outside every 2-core report 1 (they have degree
      // ≥ 1 by the edge-derived vertex set). The sweep is bounded by
      // design: cores nest (k-core ⊆ (k-1)-core), so the oracle peels
      // each k from the previous core's fixpoint edge set — and a
      // production run at scale does exactly that incremental chain
      // rather than 6 independent peels of the full graph.
      val n = t(s, d, "nation").select(col("n_nationkey").cast("long").as("k"))
      val e = n.as("a").join(n.as("b"),
          col("a.k") < col("b.k") && (col("a.k") + col("b.k")) % 4 === 0)
        .select(col("a.k").as("src"), col("b.k").as("dst"))
        .localCheckpoint(true) // feeds 6 peel sweeps + the vertex union
      val verts = e.select(col("src").as("vertex"))
        .union(e.select(col("dst"))).distinct()
      val members = (2 to 7).map(k =>
          Traversals.kcore(e, k).withColumn("kk", lit(k.toLong)))
        .reduce(_ unionByName _)
      verts.join(members.groupBy("vertex").agg(max(col("kk")).as("mk")),
          Seq("vertex"), "left_outer")
        .select(col("vertex"),
          coalesce(col("mk"), lit(1L)).cast("long").as("coreness"))
        .orderBy("vertex")
    }),
    "q_graph_kcore" -> ((s, d) => {
      // 6-core of the (a+b)%4 pair graph: two peel rounds drop 6
      // vertices (oracle unrolls four peels — safely past fixpoint)
      val n = t(s, d, "nation").select(col("n_nationkey").cast("long").as("k"))
      val e = n.as("a").join(n.as("b"),
          col("a.k") < col("b.k") && (col("a.k") + col("b.k")) % 4 === 0)
        .select(col("a.k").as("src"), col("b.k").as("dst"))
      Traversals.kcore(e, 6).orderBy("vertex")
    }),
    "q_graph_triangles_big" -> ((s, d) => {
      // triangle counting at DATA scale: the degree-ordered-orientation
      // DataFrame formulation (skew-safe wedge generation, see
      // GraphAlgos.trianglesByMinVertex) over a key-derived graph that
      // grows with the fixture (~1.5k edges at sf0.001, ~45k at sf0.1).
      // The oracle is the textbook id-oriented 3-way self-join — a
      // DIFFERENT physical strategy computing the same triangle set,
      // which is exactly what it should be: the degree orientation is
      // an execution choice, not a semantics change.
      graft.operators.GraphAlgos
        .trianglesByMinVertexCanon(modulusUnd(s, d, 300)).orderBy("vertex")
    }),
    "q_graph_tri_pervertex" -> ((s, d) => {
      // per-vertex triangle participation via GraphX on the (a+b)%4
      // pair graph; exact ints -> SQL oracle
      val n = t(s, d, "nation").select(col("n_nationkey").cast("long").as("k"))
      val e = n.as("a").join(n.as("b"),
          col("a.k") < col("b.k") && (col("a.k") + col("b.k")) % 4 === 0)
        .select(col("a.k").as("src"), col("b.k").as("dst"))
      graft.operators.GraphAlgos.triangleCounts(e)
        .select(col("vertex"), col("triangles").cast("long").as("triangles"))
        .where(col("triangles") > 0)
        .orderBy("vertex")
    }),
    "q_graph_degree_dist" -> ((s, d) => {
      // degree distribution of the DATA-SCALE bipartite graph,
      // log2-binned (the power-law fingerprint — how skew is this
      // graph, does it need salting): two hash aggs over the 600k-
      // edge table (sf0.1), bucket = bit length of degree via integer
      // string ops — no float log anywhere. Output is ≤64 rows at any
      // scale.
      val deg = bipartiteEdges(s, d)
        .groupBy(col("src").as("vertex"))
        .agg(count(lit(1)).as("deg"))
      deg.groupBy(length(bin(col("deg"))).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_vertices"),
             min("deg").cast("long").as("min_deg"),
             max("deg").cast("long").as("max_deg"))
        .orderBy("bucket")
    }),
    "q_graph_densest" -> ((s, d) => {
      // densest-subgraph greedy peel (Charikar 2-approx, Bahmani et
      // al.'s parallel batched rounds) on the DATA-SCALE bipartite
      // graph — the "find the dense core" miner (spam/link farms,
      // community cores). The skewed order–supplier degrees make the
      // trace non-trivial (sf0.1: 148k vertices → 479 → 12 → ∅ in 3
      // peels): round 1 drops the ≤3ρ order side and most edges with
      // it, so the trace PROVES the full graph is its own densest
      // prefix (ρ≈4.0) — bipartite graphs keep no order-free core,
      // and the best-round flag reports exactly that. 5 fixed rounds
      // (unrollable oracle at any SF), peel test cross-multiplied
      // exact (deg·V ≤ 3·E), density in integer ppm — no float ρ.
      graft.operators.GraphAlgos.densestPeelCanon(
        bipartiteEdges(s, d).where(col("src") < col("dst"))
          .select(col("src").as("a"), col("dst").as("b")),
        rounds = 5).orderBy("round")
    }),
    "q_graph_richclub" -> ((s, d) => {
      // rich-club coefficient φ(k) = 2·E_{>k} / (N_{>k}·(N_{>k}−1))
      // (Colizza et al. 2006) — do the high-degree vertices wire to
      // EACH OTHER more than chance? The hub-interconnection
      // fingerprint next to assortativity's correlation readout.
      // Shares the session-staged mod-300 canonical graph. One degree
      // agg + one edges⋈degrees double-join; the 4 thresholds ride a
      // posexplode so the edge table is scanned ONCE for every k.
      // All terms exact integers; φ's division is the only float op.
      val und = modulusUnd(s, d, 300)
      val deg = mirror(und.select(col("a").as("src"), col("b").as("dst")))
        .groupBy(col("src").as("v")).agg(count(lit(1)).as("dg"))
        .localCheckpoint(true) // feeds N_k AND both edge-join sides
      val ks = array(lit(2), lit(4), lit(8), lit(16))
      val nk = deg.select(explode(ks).as("k"), col("dg"))
        .where(col("dg") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_nodes"))
        // φ is undefined below 2 qualifying nodes (denominator 0 →
        // IEEE Inf here vs DuckDB's rendering); drop the degenerate k
        .where(col("n_nodes") >= 2)
      val ek = und
        .join(deg.select(col("v").as("va"), col("dg").as("da")), col("a") === col("va"))
        .join(deg.select(col("v").as("vb"), col("dg").as("db")), col("b") === col("vb"))
        .select(explode(ks).as("k"), col("da"), col("db"))
        .where(col("da") > col("k") && col("db") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_edges"))
      nk.join(ek, Seq("k"), "left_outer")
        .select(col("k"), col("n_nodes"),
          coalesce(col("n_edges"), lit(0L)).as("n_edges"),
          round(coalesce(col("n_edges"), lit(0L)) * lit(2.0) /
            (col("n_nodes") * (col("n_nodes") - 1)), 6).as("phi"))
        .orderBy("k")
    }),
    "q_graph_coproj" -> ((s, d) => {
      // one-mode bipartite PROJECTION with Newman collaboration
      // weighting (Newman 2001, PNAS 98): suppliers co-supplying an
      // order get an edge; next to the raw co-count, each shared
      // order contributes 1/(deg(order)−1) — hub orders are
      // discounted, the standard fix for projection inflation. The
      // order side's degree is schema-bounded (≤ 7 lineitems), so the
      // per-key quadratic is ≤ C(7,2) pairs — the bounded-fanout
      // shape that keeps projections tractable at 100 TB (an
      // unbounded hub key would take the basket_pairs cap). Exactness:
      // deg−1 ∈ 1..6 divides 720, so newman_w·720 = Σ 720/(deg−1) is
      // an EXACT integer — no float sum; the closing /720 is the only
      // float op. Top-50 via TakeOrdered.
      val e = t(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
        .distinct()
        .localCheckpoint(true) // feeds the degree agg AND both join sides
      val deg = e.groupBy(col("o").as("od")).agg(count(lit(1)).as("dg"))
      e.as("a").join(e.as("b"),
          col("a.o") === col("b.o") && col("a.s") < col("b.s"))
        .join(deg, col("a.o") === col("od"))
        .groupBy(col("a.s").as("sa"), col("b.s").as("sb"))
        .agg(count(lit(1)).as("w"),
          sum(expr("720 div (dg - 1)")).cast("long").as("nw720"))
        .select(col("sa"), col("sb"), col("w"),
          round(col("nw720") / lit(720.0), 4).as("newman_w"))
        .orderBy(col("w").desc, col("sa"), col("sb"))
        .limit(50)
    }),
    "q_graph_toposort" -> ((s, d) => {
      // topological levels + DAG path counting — the scheduling-DAG
      // primitive (stage depth = longest path ending at v; np = #
      // distinct paths from the source layer, the dataflow fan-in
      // statistic). Fixture: a LAYERED DAG over orders — vertex
      // 0..199, layer(v) = v/25 (8 layers), edge (o_orderkey%200 →
      // o_custkey%200) kept iff it crosses exactly one layer up, so
      // acyclicity is by construction and depth is pinned at 7
      // supersteps. Each superstep is one vertex-keyed join + hash
      // agg over the PREVIOUS layer's finalized state — the BSP shape
      // of any layer-synchronous DAG pass at 100 TB (supersteps =
      // depth, shuffle keys = vertex ids, state one row per vertex).
      // Both lp and np are integer-exact (np ≤ 25^7 < 2^63). Oracle:
      // recursive-CTE longest path (distinct (v,len) rows, bounded by
      // V·depth) + 7 unrolled layer sums for np.
      val e = t(s, d, "orders")
        .select((col("o_orderkey") % 200).as("src"), (col("o_custkey") % 200).as("dst"))
        .where(floor(col("dst") / 25) === floor(col("src") / 25) + 1)
        .distinct()
        .localCheckpoint(true) // read once per superstep (7×)
      val verts = e.select(col("src").as("vertex"))
        .union(e.select(col("dst"))).distinct()
      var state = verts.select(col("vertex"), lit(0L).as("lp"),
        when(floor(col("vertex") / 25) === 0, lit(1L)).otherwise(lit(0L)).as("np"))
      for (layer <- 1 to 7) {
        val prev = state.where(floor(col("vertex") / 25) === layer - 1)
          .select(col("vertex").as("pv"), col("lp").as("plp"), col("np").as("pnp"))
        val up = e.join(prev, col("src") === col("pv"))
          .groupBy(col("dst").as("uv"))
          .agg(max(col("plp") + 1).as("ulp"), sum(col("pnp")).as("unp"))
        state = state.join(up, col("vertex") === col("uv"), "left_outer")
          .select(col("vertex"),
            coalesce(col("ulp"), col("lp")).as("lp"),
            coalesce(col("unp"), col("np")).as("np"))
      }
      state.select(col("vertex"), col("lp"), col("np").cast("long").as("np"))
        .orderBy("vertex")
    }),
    "q_graph_subtree_sum" -> ((s, d) => {
      // bottom-up subtree aggregation (hierarchical rollup — the
      // org-chart / category-tree OLAP op): per-level upward fold
      // over the heap tree. Depths are closed-form for THIS fixture's
      // parent rule (parent(k) = k/2, so depth = bit length of k —
      // integer string ops, no float log); each
      // superstep groups the deepest unabsorbed level's accumulated
      // sums by parent and adds them one level up, so after
      // depth-many supersteps every vertex holds its full subtree
      // sum. Supersteps = tree depth, each one small hash agg + join
      // — the BSP shape that holds for any forest at 100 TB. Oracle:
      // recursive ancestor-chain CTE.
      val v = t(s, d, "nation").select(col("n_nationkey").cast("long").as("vertex"))
        .withColumn("depth",
          when(col("vertex") === 0, lit(0)).otherwise(length(bin(col("vertex")))).cast("int"))
      val maxD = v.agg(max("depth")).head().getInt(0) // scalar witness
      var acc = v.withColumn("ssum", col("vertex"))
      for (dep <- maxD to 1 by -1) {
        val up = acc.where(col("depth") === dep)
          .select(floor(col("vertex") / 2).cast("long").as("vertex"), col("ssum"))
          .groupBy("vertex").agg(sum("ssum").as("up"))
        acc = acc.join(up, Seq("vertex"), "left_outer")
          .withColumn("ssum", col("ssum") + coalesce(col("up"), lit(0L)))
          .drop("up")
      }
      acc.select(col("vertex"), col("ssum").cast("long").as("subtree_sum"))
        .orderBy("vertex")
    }),
    "q_graph_clustcoef" -> ((s, d) => {
      // global clustering coefficient C = 3·triangles / wedges — the
      // cohesion summary metric. Triangles reuse the distributed
      // triple-join formulation on the mod-4 synthetic graph; wedges
      // are Σ C(deg,2) from ONE degree agg over the mirrored edges.
      // Both terms exact integers, so only the single closing
      // division is floating point — the same IEEE op both engines.
      val n = t(s, d, "nation").select(col("n_nationkey").cast("long").as("k"))
      val e = n.as("a").join(n.as("b"),
          col("a.k") < col("b.k") && (col("a.k") + col("b.k")) % 4 === 0)
        .select(col("a.k").as("u"), col("b.k").as("v"))
        .localCheckpoint(true) // read 4×: triple join + degrees
      val tri = e.as("e1").join(e.as("e2"), col("e1.v") === col("e2.u"))
        .join(e.as("e3"), col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
        .agg(count(lit(1)).as("n_triangles"))
      val wedges = mirror(e.select(col("u").as("src"), col("v").as("dst")))
        .groupBy("src").agg(count(lit(1)).as("dg"))
        .agg(sum(col("dg") * (col("dg") - 1) / lit(2)).cast("long").as("n_wedges"))
      tri.crossJoin(wedges)
        .select(col("n_triangles"), col("n_wedges"),
          round(col("n_triangles") * lit(3.0) / col("n_wedges"), 6).as("cc"))
    }),
    "q_graph_triangles" -> ((s, d) => {
      // Undirected pairs (a<b) with (a+b)%4==0 over nations; count
      // triangles a<b<c via triple self-join (the distributed-join
      // formulation of triangle counting).
      val n = t(s, d, "nation").select(col("n_nationkey").cast("long").as("k"))
      val e = n.as("a").join(n.as("b"),
          col("a.k") < col("b.k") && (col("a.k") + col("b.k")) % 4 === 0)
        .select(col("a.k").as("u"), col("b.k").as("v"))
      val e1 = e.select(col("u").as("a"), col("v").as("b"))
      val e2 = e.select(col("u").as("b2"), col("v").as("c2"))
      val e3 = e.select(col("u").as("a3"), col("v").as("c3"))
      e1.join(e2, col("b") === col("b2"))
        .join(e3, col("a") === col("a3") && col("c2") === col("c3"))
        .agg(count(lit(1)).as("n_triangles"))
    }))

  private val treeEdgeSql =
    """e AS (SELECT n_nationkey::BIGINT AS src, (n_nationkey // 2)::BIGINT AS dst FROM nation WHERE n_nationkey > 0 UNION ALL SELECT (n_nationkey // 2)::BIGINT, n_nationkey::BIGINT FROM nation WHERE n_nationkey > 0)"""

  private val chainEdgeSql =
    """e0 AS (SELECT n_nationkey::BIGINT AS src, (n_nationkey + 1)::BIGINT AS dst FROM nation WHERE n_nationkey < 10 OR (n_nationkey >= 12 AND n_nationkey < 20)), e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)"""

  val oracles: Map[String, String] = Map(
    "q_graph_scc_big" ->
      """WITH o AS (SELECT o_custkey, o_orderkey AS k FROM orders), agg AS (SELECT o_custkey, min(k) AS f, count(*) AS n FROM o GROUP BY o_custkey), jm AS (SELECT o.o_custkey, max(k) AS jmax FROM o JOIN agg USING (o_custkey) WHERE n >= 2 AND k % 23 = 0 AND k <> f GROUP BY o.o_custkey), v AS (SELECT o.o_custkey, k, f FROM o JOIN agg USING (o_custkey) WHERE n >= 2), cv AS (SELECT v.k, CASE WHEN jm.jmax IS NOT NULL AND v.k <= jm.jmax THEN v.f ELSE v.k END AS component FROM v LEFT JOIN jm ON v.o_custkey = jm.o_custkey), szs AS (SELECT component, count(*) AS sz FROM cv GROUP BY component) SELECT sz::BIGINT AS sz, count(*)::BIGINT AS n_components FROM szs GROUP BY sz ORDER BY sz""",
    "q_graph_scc" ->
      """WITH RECURSIVE o AS (SELECT o_orderkey AS k FROM orders), ring AS (SELECT DISTINCT (k % 128) AS src, CASE WHEN (k % 128) % 16 < 15 THEN (k % 128) + 1 ELSE (k % 128) - 15 END AS dst FROM o), dn AS (SELECT DISTINCT ((k*7) % 8) * 16 + (k % 16) AS src, ((k*3) % 8) * 16 + ((k >> 4) % 16) AS dst FROM o WHERE k % 13 = 0 AND (k*7) % 8 < (k*3) % 8), up AS (SELECT DISTINCT ((k*3) % 8) * 16 + (k % 16) AS src, ((k*7) % 8) * 16 + ((k >> 4) % 16) AS dst FROM o WHERE k % 997 = 0 AND (k*7) % 8 < (k*3) % 8), e AS (SELECT src, dst FROM ring UNION SELECT src, dst FROM dn UNION SELECT src, dst FROM up), e2 AS (SELECT src, dst FROM e WHERE src <> dst), r AS (SELECT src AS a, dst AS b FROM e2 UNION SELECT r.a, e2.dst FROM r JOIN e2 ON e2.src = r.b), v AS (SELECT src AS vertex FROM e UNION SELECT dst FROM e), m AS (SELECT a, b FROM r UNION SELECT vertex, vertex FROM v) SELECT m1.a::BIGINT AS vertex, min(m1.b)::BIGINT AS component FROM m m1 JOIN m m2 ON m1.b = m2.a AND m2.b = m1.a GROUP BY m1.a ORDER BY vertex""",
    // same fixture edge CTEs, wedge self-joins expressed directly;
    // cycles div 3 in integer arithmetic
    "q_graph_triads" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders), ring AS (SELECT DISTINCT (k % 128) AS src, CASE WHEN (k % 128) % 16 < 15 THEN (k % 128) + 1 ELSE (k % 128) - 15 END AS dst FROM o), dn AS (SELECT DISTINCT ((k*7) % 8) * 16 + (k % 16) AS src, ((k*3) % 8) * 16 + ((k >> 4) % 16) AS dst FROM o WHERE k % 13 = 0 AND (k*7) % 8 < (k*3) % 8), up AS (SELECT DISTINCT ((k*3) % 8) * 16 + (k % 16) AS src, ((k*7) % 8) * 16 + ((k >> 4) % 16) AS dst FROM o WHERE k % 997 = 0 AND (k*7) % 8 < (k*3) % 8), e AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM ring UNION ALL SELECT src, dst FROM dn UNION ALL SELECT src, dst FROM up) WHERE src <> dst), w AS (SELECT x.src AS a, x.dst AS b, y.dst AS c FROM e x JOIN e y ON x.dst = y.src WHERE x.src <> y.dst), cyc AS (SELECT count(*) // 3 AS cyclic FROM w JOIN e z ON w.c = z.src AND w.a = z.dst), ffd AS (SELECT count(*) AS feedforward FROM w JOIN e z ON w.a = z.src AND w.c = z.dst) SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges, cyclic::BIGINT AS cyclic, feedforward::BIGINT AS feedforward FROM cyc CROSS JOIN ffd""",
    // same fixture + the two 16-edge rails + reachability-closure
    // ground truth as q_graph_scc; core/IN/OUT derived set-
    // theoretically from the closure pairs. The vertex CTE is
    // re-deduped before the census (DISTINCT-FROM-UNION-ALL rule:
    // under WITH RECURSIVE DuckDB may not dedup a plain UNION in a
    // non-recursive CTE — q_graph_scc tolerates the duplicates via
    // its closing GROUP BY, a census does not)
    "q_graph_bowtie" ->
      """WITH RECURSIVE o AS (SELECT o_orderkey AS k FROM orders), ring AS (SELECT DISTINCT (k % 128) AS src, CASE WHEN (k % 128) % 16 < 15 THEN (k % 128) + 1 ELSE (k % 128) - 15 END AS dst FROM o), dn AS (SELECT DISTINCT ((k*7) % 8) * 16 + (k % 16) AS src, ((k*3) % 8) * 16 + ((k >> 4) % 16) AS dst FROM o WHERE k % 13 = 0 AND (k*7) % 8 < (k*3) % 8), up AS (SELECT DISTINCT ((k*3) % 8) * 16 + (k % 16) AS src, ((k*7) % 8) * 16 + ((k >> 4) % 16) AS dst FROM o WHERE k % 997 = 0 AND (k*7) % 8 < (k*3) % 8), rails AS (SELECT i + 16 AS src, i + 48 AS dst FROM (SELECT unnest(range(0, 16)) AS i) UNION ALL SELECT i + 112 AS src, i + 80 AS dst FROM (SELECT unnest(range(0, 16)) AS i)), e AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM ring UNION ALL SELECT src, dst FROM dn UNION ALL SELECT src, dst FROM up UNION ALL SELECT src, dst FROM rails)), e2 AS (SELECT src, dst FROM e WHERE src <> dst), r AS (SELECT src AS a, dst AS b FROM e2 UNION SELECT r.a, e2.dst FROM r JOIN e2 ON e2.src = r.b), v AS (SELECT DISTINCT vertex FROM (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)), m AS (SELECT DISTINCT a, b FROM (SELECT a, b FROM r UNION ALL SELECT vertex, vertex FROM v)), comp AS (SELECT m1.a AS vertex, min(m1.b) AS component FROM m m1 JOIN m m2 ON m1.b = m2.a AND m2.b = m1.a GROUP BY m1.a), core AS (SELECT component FROM (SELECT component, count(*) AS sz FROM comp GROUP BY component ORDER BY sz DESC, component LIMIT 1)), cv AS (SELECT vertex FROM comp WHERE component = (SELECT component FROM core)), fwd AS (SELECT DISTINCT r.b AS vertex FROM r JOIN cv ON r.a = cv.vertex), bwd AS (SELECT DISTINCT r.a AS vertex FROM r JOIN cv ON r.b = cv.vertex), cls AS (SELECT v.vertex, CASE WHEN v.vertex IN (SELECT vertex FROM cv) THEN 'core' WHEN v.vertex IN (SELECT vertex FROM bwd) THEN 'in' WHEN v.vertex IN (SELECT vertex FROM fwd) THEN 'out' ELSE 'other' END AS cls FROM v) SELECT cls, count(*)::BIGINT AS n_vertices, min(vertex)::BIGINT AS first_vertex FROM cls GROUP BY cls ORDER BY cls""",
    "q_graph_mst" ->
      """WITH o AS (SELECT o_custkey, o_orderkey::BIGINT AS k FROM orders), g AS (SELECT o_custkey FROM o GROUP BY o_custkey HAVING count(*) >= 3), c AS (SELECT o.o_custkey, k, lead(k) OVER (PARTITION BY o.o_custkey ORDER BY k) AS nxt FROM o JOIN g USING (o_custkey)), chain AS (SELECT o_custkey, k AS a, nxt AS b FROM c WHERE nxt IS NOT NULL), back AS (SELECT o_custkey, min(k) AS a, max(k) AS b FROM c GROUP BY o_custkey), e AS (SELECT o_custkey, a, b, (a * 7 + b * 13) % 997 + 1 AS w FROM (SELECT * FROM chain UNION ALL SELECT * FROM back) u), r AS (SELECT o_custkey, w, row_number() OVER (PARTITION BY o_custkey ORDER BY w DESC, a DESC, b DESC) AS rn FROM e) SELECT o_custkey, sum(w)::BIGINT AS mst_w FROM r WHERE rn > 1 GROUP BY o_custkey ORDER BY o_custkey""",
    // golden literals per FIXTURES.md (G7 from 0: levels {0},{1,4},
    // {2,5,6},{3}; from 3: chain back up; leaves {3,5,6} / G5 {2,3,4})
    // G7 directed edges (FIXTURES.md) with src >= 4
    "q_source_matrixv2" ->
      """SELECT src::BIGINT AS src, dst::BIGINT AS dst FROM (VALUES (4,0),(4,5),(4,6),(5,4),(6,4)) t(src, dst) ORDER BY src, dst""",
    // base: nation keys 1..11 -> (k, k//2); delta: keys 0..4 -> (k, k+7)
    // (disjoint by construction: k+7 > k//2 on 0..4)
    "q_sink_matrixv2" ->
      """WITH b AS (SELECT n_nationkey AS k FROM nation WHERE n_nationkey > 0 AND n_nationkey < 12), dl AS (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 5) SELECT ((SELECT count(*) FROM b) + (SELECT count(*) FROM dl))::BIGINT AS n_edges, ((SELECT sum(k) FROM b) + (SELECT sum(k) FROM dl))::BIGINT AS sum_src, ((SELECT sum(k // 2) FROM b) + (SELECT sum(k + 7) FROM dl))::BIGINT AS sum_dst""",
    "q_ref_g7_bfs" ->
      """SELECT ord::BIGINT AS ord, level::INT AS level, vertex::BIGINT AS vertex FROM (VALUES (0,0,0),(1,1,1),(2,1,4),(3,2,2),(4,2,5),(5,2,6),(6,3,3)) t(ord, level, vertex) ORDER BY ord""",
    "q_ref_g7_bfs_from3" ->
      """SELECT ord::BIGINT AS ord, level::INT AS level, vertex::BIGINT AS vertex FROM (VALUES (0,0,3),(1,1,2),(2,2,1),(3,3,0),(4,4,4),(5,5,5),(6,5,6)) t(ord, level, vertex) ORDER BY ord""",
    "q_ref_g7_dfs_leaves" ->
      """SELECT vertex::BIGINT AS vertex FROM (VALUES (3),(5),(6)) t(vertex) ORDER BY vertex""",
    "q_ref_g5_dfs_leaves" ->
      """SELECT vertex::BIGINT AS vertex FROM (VALUES (2),(3),(4)) t(vertex) ORDER BY vertex""",
    "q_graph_bfs_big" ->
      """WITH RECURSIVE e0 AS (SELECT DISTINCT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem), e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0), r AS (SELECT (SELECT min(l_orderkey) * 2 FROM lineitem) AS vertex, 0 AS level UNION SELECT e.dst, r.level + 1 FROM r JOIN e ON e.src = r.vertex WHERE r.level < 100), lv AS (SELECT vertex, min(level) AS level FROM r GROUP BY vertex) SELECT level::INT AS level, count(*)::BIGINT AS cnt, min(vertex)::BIGINT AS min_v, max(vertex)::BIGINT AS max_v FROM lv GROUP BY level ORDER BY level""",
    "q_graph_cc_big" ->
      """WITH RECURSIVE ch AS (SELECT o_custkey, o_orderkey AS src, lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS dst FROM orders), e0 AS (SELECT src, dst FROM ch WHERE dst IS NOT NULL), e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0), r AS (SELECT src AS a, src AS b FROM e UNION SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b), comp AS (SELECT a AS vertex, min(b) AS component FROM r GROUP BY a), szs AS (SELECT component, count(*) AS sz FROM comp GROUP BY component) SELECT sz::BIGINT AS sz, count(*)::BIGINT AS n_components FROM szs GROUP BY sz ORDER BY sz""",
    "q_graph_bfs" ->
      s"""WITH RECURSIVE $treeEdgeSql, r AS (SELECT 0::BIGINT AS vertex, 0 AS level UNION SELECT e.dst, r.level + 1 FROM r JOIN e ON e.src = r.vertex WHERE r.level < 30), lv AS (SELECT vertex, min(level) AS level FROM r GROUP BY vertex) SELECT (row_number() OVER (ORDER BY level, vertex) - 1)::BIGINT AS ord, level::INT AS level, vertex FROM lv ORDER BY ord""",
    "q_graph_cc" ->
      s"""WITH RECURSIVE $chainEdgeSql, r AS (SELECT src AS a, src AS b FROM e UNION SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b) SELECT a AS vertex, min(b)::BIGINT AS component FROM r GROUP BY a ORDER BY vertex""",
    // Full sequential-DFS replay as SQL (r10 VERDICT #4: the last
    // no_oracle row). A single-row recursive CTE steps the exact
    // explicit-stack algorithm Traversals.dfsLeaves runs — list-typed
    // (stack, visited) state, one DFS step per iteration: push the
    // smallest unvisited neighbor of the stack top, else pop. A DFS-tree
    // leaf is a reachable vertex that never becomes a push parent —
    // equivalent to dfsLeaves' childCount==0 frames (validated against
    // the G5/G7 goldens, which include cycles and cross edges).
    // Terminates in <= 2|V| steps; fixture-scale only, like the
    // operator's own bounded driver replay.
    "q_graph_dfs_leaves" ->
      s"""WITH RECURSIVE $treeEdgeSql, walk AS (SELECT [0::BIGINT] AS stack, [0::BIGINT] AS visited, NULL::BIGINT AS parent, NULL::BIGINT AS child UNION ALL SELECT CASE WHEN nu IS NULL THEN stack[:-2] ELSE list_append(stack, nu) END, CASE WHEN nu IS NULL THEN visited ELSE list_append(visited, nu) END, CASE WHEN nu IS NULL THEN NULL ELSE stack[-1] END, nu FROM (SELECT stack, visited, (SELECT min(e.dst) FROM e WHERE e.src = stack[-1] AND NOT list_contains(visited, e.dst)) AS nu FROM walk WHERE len(stack) > 0)), reach AS (SELECT DISTINCT child AS vertex FROM walk WHERE child IS NOT NULL UNION SELECT 0::BIGINT), parents AS (SELECT DISTINCT parent FROM walk WHERE parent IS NOT NULL) SELECT vertex FROM reach WHERE vertex NOT IN (SELECT parent FROM parents) ORDER BY vertex""",
    // the SAME explicit-stack walk on the data-scale directed mod-150
    // graph (the reciprocity/HITS edge derivation, start 0)
    "q_graph_dfs_leaves_big" ->
      """WITH RECURSIVE e AS (SELECT DISTINCT (o_orderkey % 150)::BIGINT AS src, (o_custkey % 150)::BIGINT AS dst FROM orders WHERE (o_orderkey % 150) <> (o_custkey % 150)), walk AS (SELECT [0::BIGINT] AS stack, [0::BIGINT] AS visited, NULL::BIGINT AS parent, NULL::BIGINT AS child UNION ALL SELECT CASE WHEN nu IS NULL THEN stack[:-2] ELSE list_append(stack, nu) END, CASE WHEN nu IS NULL THEN visited ELSE list_append(visited, nu) END, CASE WHEN nu IS NULL THEN NULL ELSE stack[-1] END, nu FROM (SELECT stack, visited, (SELECT min(e.dst) FROM e WHERE e.src = stack[-1] AND NOT list_contains(visited, e.dst)) AS nu FROM walk WHERE len(stack) > 0)), reach AS (SELECT DISTINCT child AS vertex FROM walk WHERE child IS NOT NULL UNION SELECT 0::BIGINT), parents AS (SELECT DISTINCT parent FROM walk WHERE parent IS NOT NULL) SELECT vertex FROM reach WHERE vertex NOT IN (SELECT parent FROM parents) ORDER BY vertex""",
    // closed-form order-invariant classification on the rooted
    // bipartite DAG: leaf = never a source of an expanding edge,
    // internal = sole reachable parent of some vertex (or the root
    // with children); everything else is honestly order-dependent
    "q_graph_dfs_classes" ->
      """WITH p AS (SELECT DISTINCT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem), ex AS (SELECT src, dst FROM p UNION ALL SELECT -1::BIGINT AS src, src AS dst FROM (SELECT DISTINCT src FROM p)), r AS (SELECT -1::BIGINT AS vertex UNION SELECT src FROM p UNION SELECT dst FROM p), onlyp AS (SELECT min(src) AS vertex FROM ex GROUP BY dst HAVING count(DISTINCT src) = 1), ints AS (SELECT DISTINCT vertex FROM onlyp UNION SELECT -1::BIGINT) SELECT r.vertex::BIGINT AS vertex, CASE WHEN r.vertex NOT IN (SELECT src FROM ex) THEN 'leaf' WHEN r.vertex IN (SELECT vertex FROM ints) THEN 'internal' ELSE 'undecided' END AS cls FROM r ORDER BY vertex""",
    // rule classes (closed form, reach-restricted) + exact final
    // classes from the same list-state walk as dfs_leaves_big;
    // fraction in exact integer ppm
    "q_graph_dfs_reduce" ->
      """WITH RECURSIVE ks AS MATERIALIZED (SELECT DISTINCT (o_orderkey % 150)::BIGINT AS k FROM orders), e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (SELECT k AS src, k + 1 AS dst FROM ks WHERE k < 149 UNION ALL SELECT k, k - 9 FROM ks WHERE k % 31 = 5 AND k > 9 UNION ALL SELECT k, k - 18 FROM ks WHERE k % 31 = 5 AND k > 18)), r0 AS (SELECT 0::BIGINT AS vertex UNION SELECT e.dst FROM r0 JOIN e ON e.src = r0.vertex), l0 AS MATERIALIZED (SELECT e.src, e.dst FROM e JOIN r0 ON e.src = r0.vertex WHERE e.dst <> 0 AND e.src <> e.dst), f1 AS MATERIALIZED (SELECT dst AS v, min(src) AS p FROM l0 GROUP BY dst HAVING count(*) = 1), a1 AS (SELECT v, p AS an FROM f1 UNION SELECT a1.v, f1.p FROM a1 JOIN f1 ON f1.v = a1.an), l1 AS MATERIALIZED (SELECT l.src, l.dst FROM l0 l WHERE NOT EXISTS (SELECT 1 FROM a1 WHERE a1.v = l.src AND a1.an = l.dst)), f2 AS MATERIALIZED (SELECT dst AS v, min(src) AS p FROM l1 GROUP BY dst HAVING count(*) = 1), a2 AS (SELECT v, p AS an FROM f2 UNION SELECT a2.v, f2.p FROM a2 JOIN f2 ON f2.v = a2.an), l2 AS MATERIALIZED (SELECT l.src, l.dst FROM l1 l WHERE NOT EXISTS (SELECT 1 FROM a2 WHERE a2.v = l.src AND a2.an = l.dst)), f3 AS MATERIALIZED (SELECT dst AS v, min(src) AS p FROM l2 GROUP BY dst HAVING count(*) = 1), a3 AS (SELECT v, p AS an FROM f3 UNION SELECT a3.v, f3.p FROM a3 JOIN f3 ON f3.v = a3.an), l3 AS MATERIALIZED (SELECT l.src, l.dst FROM l2 l WHERE NOT EXISTS (SELECT 1 FROM a3 WHERE a3.v = l.src AND a3.an = l.dst)), c0 AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM l0), c1 AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM l1), c2 AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM l2), c3 AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM l3) SELECT 1::BIGINT AS round, c1.n AS n_live, (c0.n - c1.n)::BIGINT AS n_dropped FROM c0, c1 UNION ALL SELECT 2::BIGINT, c2.n, (c1.n - c2.n)::BIGINT FROM c1, c2 UNION ALL SELECT 3::BIGINT, c3.n, (c2.n - c3.n)::BIGINT FROM c2, c3 ORDER BY round""",
    "q_graph_dfs_residual" ->
      """WITH RECURSIVE e AS (SELECT DISTINCT (o_orderkey % 150)::BIGINT AS src, (o_custkey % 150)::BIGINT AS dst FROM orders WHERE (o_orderkey % 150) <> (o_custkey % 150)), r0 AS (SELECT 0::BIGINT AS vertex UNION SELECT e.dst FROM r0 JOIN e ON e.src = r0.vertex), ex AS (SELECT e.src, e.dst FROM e JOIN r0 ON e.src = r0.vertex WHERE e.dst <> 0), onlyp AS (SELECT min(src) AS vertex FROM ex GROUP BY dst HAVING count(DISTINCT src) = 1), ints AS (SELECT DISTINCT vertex FROM onlyp UNION SELECT DISTINCT 0::BIGINT FROM ex WHERE ex.src = 0), cr AS (SELECT r0.vertex, CASE WHEN r0.vertex NOT IN (SELECT src FROM ex) THEN 'leaf' WHEN r0.vertex IN (SELECT vertex FROM ints) THEN 'internal' ELSE 'undecided' END AS cls_rule FROM r0), walk AS (SELECT [0::BIGINT] AS stack, [0::BIGINT] AS visited, NULL::BIGINT AS parent, NULL::BIGINT AS child UNION ALL SELECT CASE WHEN nu IS NULL THEN stack[:-2] ELSE list_append(stack, nu) END, CASE WHEN nu IS NULL THEN visited ELSE list_append(visited, nu) END, CASE WHEN nu IS NULL THEN NULL ELSE stack[-1] END, nu FROM (SELECT stack, visited, (SELECT min(e.dst) FROM e WHERE e.src = stack[-1] AND NOT list_contains(visited, e.dst)) AS nu FROM walk WHERE len(stack) > 0)), wpar AS (SELECT DISTINCT parent FROM walk WHERE parent IS NOT NULL), cf AS (SELECT r0.vertex, CASE WHEN r0.vertex NOT IN (SELECT parent FROM wpar) THEN 'leaf' ELSE 'internal' END AS cls_final FROM r0), a AS (SELECT cls_rule AS cls, count(*)::BIGINT AS n_rule FROM cr GROUP BY 1), b AS (SELECT cls_final AS cls, count(*)::BIGINT AS n_final FROM cf GROUP BY 1), t AS (SELECT count(*)::BIGINT AS tot FROM r0) SELECT cls, coalesce(a.n_rule, 0)::BIGINT AS n_rule, coalesce(b.n_final, 0)::BIGINT AS n_final, (coalesce(a.n_rule, 0) * 1000000 // t.tot)::BIGINT AS frac_ppm_rule FROM a FULL OUTER JOIN b USING (cls) CROSS JOIN t ORDER BY cls""",
    "q_graph_bfs_multi" ->
      s"""WITH RECURSIVE $treeEdgeSql, r AS (SELECT vertex, 0 AS level FROM (VALUES (0::BIGINT), (24::BIGINT)) s(vertex) UNION SELECT e.dst, r.level + 1 FROM r JOIN e ON e.src = r.vertex WHERE r.level < 30) SELECT vertex, min(level)::INT AS level FROM r GROUP BY vertex ORDER BY vertex""",
    "q_graph_closeness" ->
      s"""WITH RECURSIVE $treeEdgeSql, v AS (SELECT DISTINCT src AS root FROM e), r AS (SELECT root, root AS vertex, 0 AS level FROM v UNION SELECT r.root, e.dst, r.level + 1 FROM r JOIN e ON e.src = r.vertex WHERE r.level < 30), lv AS (SELECT root, vertex, min(level) AS level FROM r GROUP BY root, vertex) SELECT root AS vertex, sum(level)::BIGINT AS sum_dist, count(*)::BIGINT AS n_reach FROM lv GROUP BY root ORDER BY vertex""",
    "q_sql_recursive" ->
      s"""WITH RECURSIVE $treeEdgeSql, r AS (SELECT 0::BIGINT AS vertex, 0 AS level UNION ALL SELECT e.dst, r.level + 1 FROM r JOIN e ON e.src = r.vertex WHERE r.level < 10) SELECT vertex, min(level)::INT AS level FROM r GROUP BY vertex ORDER BY vertex""",
    "q_graph_diameter" ->
      s"""WITH RECURSIVE $treeEdgeSql, v AS (SELECT DISTINCT src AS root FROM e), r AS (SELECT root, root AS vertex, 0 AS level FROM v UNION SELECT r.root, e.dst, r.level + 1 FROM r JOIN e ON e.src = r.vertex WHERE r.level < 30), lv AS (SELECT root, vertex, min(level) AS level FROM r GROUP BY root, vertex), dd AS (SELECT level::BIGINT AS dl, count(*)::BIGINT AS c FROM lv WHERE level > 0 GROUP BY level), cu AS (SELECT dl, c, sum(c) OVER (ORDER BY dl ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, sum(c) OVER () AS n FROM dd) SELECT max(dl)::BIGINT AS diameter, min(CASE WHEN cum * 10 >= n * 9 THEN dl END)::BIGINT AS eff_diameter_p90, max(n)::BIGINT AS n_pairs FROM cu""",
    "q_graph_harmonic" ->
      s"""WITH RECURSIVE $treeEdgeSql, v AS (SELECT DISTINCT src AS root FROM e), r AS (SELECT root, root AS vertex, 0 AS level FROM v UNION SELECT r.root, e.dst, r.level + 1 FROM r JOIN e ON e.src = r.vertex WHERE r.level < 30), lv AS (SELECT root, vertex, min(level) AS level FROM r GROUP BY root, vertex) SELECT root AS vertex, sum(2520 // level)::BIGINT AS h2520, count(*)::BIGINT AS n_reach FROM lv WHERE level > 0 GROUP BY root ORDER BY vertex""",
    "q_graph_reciprocity" ->
      """WITH e AS (SELECT DISTINCT (o_orderkey % 150)::BIGINT AS src, (o_custkey % 150)::BIGINT AS dst FROM orders WHERE o_orderkey % 150 <> o_custkey % 150), r AS (SELECT count(*)::BIGINT AS n_reciprocal FROM e f JOIN e rv ON f.src = rv.dst AND f.dst = rv.src), n AS (SELECT count(*)::BIGINT AS n_edges FROM e) SELECT n.n_edges, r.n_reciprocal, round(r.n_reciprocal::DOUBLE / n.n_edges, 4) AS reciprocity FROM n, r""",
    "q_graph_assortativity" ->
      """WITH und AS (SELECT DISTINCT least(o_orderkey % 300, o_custkey % 300)::BIGINT AS a, greatest(o_orderkey % 300, o_custkey % 300)::BIGINT AS b FROM orders WHERE o_orderkey % 300 <> o_custkey % 300), sym AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und), deg AS (SELECT src AS v, count(*)::BIGINT AS deg FROM sym GROUP BY src), ends AS (SELECT dx.deg AS x, dy.deg AS y FROM sym JOIN deg dx ON sym.src = dx.v JOIN deg dy ON sym.dst = dy.v), g AS (SELECT count(*)::BIGINT AS m, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sx2, sum(y * y)::BIGINT AS sy2 FROM ends) SELECT m, (m * sxy - sx * sy)::BIGINT AS num, round((m * sxy - sx * sy)::DOUBLE * (m * sxy - sx * sy)::DOUBLE / ((m * sx2 - sx * sx)::DOUBLE * (m * sy2 - sy * sy)::DOUBLE), 6) AS r2, sign((m * sxy - sx * sy)::DOUBLE)::INT AS sign_num FROM g""",
    "q_graph_sssp" ->
      s"""WITH RECURSIVE $treeEdgeSql, we AS (SELECT src, dst, (src + dst) % 5 + 1 AS w FROM e), r AS (SELECT 0::BIGINT AS vertex, 0::BIGINT AS dist UNION SELECT we.dst, r.dist + we.w FROM r JOIN we ON we.src = r.vertex WHERE r.dist < 100) SELECT vertex, min(dist)::BIGINT AS dist FROM r GROUP BY vertex ORDER BY vertex""",
    "q_graph_degree" ->
      s"""WITH $treeEdgeSql SELECT src AS vertex, count(*)::BIGINT AS degree FROM e GROUP BY src ORDER BY vertex""",
    "q_graph_lpa" ->
      s"""WITH $treeEdgeSql, v AS (SELECT DISTINCT src AS vertex FROM e), l0 AS (SELECT vertex, vertex AS label FROM v), c1 AS (SELECT e.dst AS vertex, l0.label AS label, count(*) AS cnt FROM e JOIN l0 ON e.src = l0.vertex GROUP BY 1, 2), l1 AS (SELECT vertex, (max({'c': cnt, 'n': -label})).n * -1 AS label FROM c1 GROUP BY vertex), c2 AS (SELECT e.dst AS vertex, l1.label AS label, count(*) AS cnt FROM e JOIN l1 ON e.src = l1.vertex GROUP BY 1, 2), l2 AS (SELECT vertex, (max({'c': cnt, 'n': -label})).n * -1 AS label FROM c2 GROUP BY vertex) SELECT vertex, label::BIGINT AS label FROM l2 ORDER BY vertex""",
    // three unrolled Luby rounds (MATERIALIZED — each round references
    // its predecessor several times; inlining would explode the plan
    // like the coreness chain); same md5 priorities, same
    // edge-winner + isolated-survivor rules, same dead-set removal
    // the matching chain again, then cover endpoints + the uncovered
    // proof count — one scalar row
    "q_graph_vcover" -> {
      def round(r: Int): String = {
        val pe = s"m${r - 1}"
        s"h$r AS MATERIALIZED (SELECT a, b, md5('match|' || a::VARCHAR || '|' || b::VARCHAR) AS h FROM $pe), " +
          s"vm$r AS MATERIALIZED (SELECT v, min(h) AS vmin FROM (SELECT a AS v, h FROM h$r UNION ALL SELECT b, h FROM h$r) GROUP BY v), " +
          s"win$r AS MATERIALIZED (SELECT e.a, e.b FROM h$r e JOIN vm$r x ON e.a = x.v AND e.h = x.vmin JOIN vm$r y ON e.b = y.v AND e.h = y.vmin), " +
          s"mt$r AS MATERIALIZED (SELECT a AS v FROM win$r UNION SELECT b FROM win$r), " +
          s"m$r AS MATERIALIZED (SELECT e.a, e.b FROM $pe e WHERE NOT EXISTS (SELECT 1 FROM mt$r m WHERE m.v = e.a) AND NOT EXISTS (SELECT 1 FROM mt$r m WHERE m.v = e.b))"
      }
      val rounds = (1 to 3).map(round).mkString(", ")
      s"""WITH m0 AS (SELECT DISTINCT least(o_orderkey % 150, o_custkey % 150)::BIGINT AS a, greatest(o_orderkey % 150, o_custkey % 150)::BIGINT AS b FROM orders WHERE o_orderkey % 150 <> o_custkey % 150), $rounds, allwin AS (SELECT a, b FROM win1 UNION ALL SELECT a, b FROM win2 UNION ALL SELECT a, b FROM win3), cover AS (SELECT DISTINCT v FROM (SELECT a AS v FROM allwin UNION ALL SELECT b FROM allwin)), verts AS (SELECT DISTINCT v FROM (SELECT a AS v FROM m0 UNION ALL SELECT b FROM m0)), unc AS (SELECT count(*) AS n FROM m0 e WHERE NOT EXISTS (SELECT 1 FROM cover c WHERE c.v = e.a) AND NOT EXISTS (SELECT 1 FROM cover c WHERE c.v = e.b)) SELECT (SELECT count(*) FROM m0)::BIGINT AS n_edges, (SELECT count(*) FROM verts)::BIGINT AS n_vertices, (SELECT count(*) FROM cover)::BIGINT AS n_cover, unc.n::BIGINT AS n_uncovered FROM unc"""
    },
    // three unrolled greedy-matching rounds (MATERIALIZED, same
    // rationale as the MIS/coreness chains): per-vertex min of the
    // edge priorities, win iff the edge IS both endpoint minima,
    // matched endpoints' edges removed
    "q_graph_matching" -> {
      def round(r: Int): String = {
        val pe = s"m${r - 1}"
        s"h$r AS MATERIALIZED (SELECT a, b, md5('match|' || a::VARCHAR || '|' || b::VARCHAR) AS h FROM $pe), " +
          s"vm$r AS MATERIALIZED (SELECT v, min(h) AS vmin FROM (SELECT a AS v, h FROM h$r UNION ALL SELECT b, h FROM h$r) GROUP BY v), " +
          s"win$r AS MATERIALIZED (SELECT e.a, e.b FROM h$r e JOIN vm$r x ON e.a = x.v AND e.h = x.vmin JOIN vm$r y ON e.b = y.v AND e.h = y.vmin), " +
          s"mt$r AS MATERIALIZED (SELECT a AS v FROM win$r UNION SELECT b FROM win$r), " +
          s"m$r AS MATERIALIZED (SELECT e.a, e.b FROM $pe e WHERE NOT EXISTS (SELECT 1 FROM mt$r m WHERE m.v = e.a) AND NOT EXISTS (SELECT 1 FROM mt$r m WHERE m.v = e.b))"
      }
      val rounds = (1 to 3).map(round).mkString(", ")
      val out = (1 to 3)
        .map(r => s"SELECT a, b, $r AS round FROM win$r").mkString(" UNION ALL ")
      s"""WITH m0 AS (SELECT DISTINCT least(o_orderkey % 150, o_custkey % 150)::BIGINT AS a, greatest(o_orderkey % 150, o_custkey % 150)::BIGINT AS b FROM orders WHERE o_orderkey % 150 <> o_custkey % 150), $rounds SELECT a, b, round::BIGINT AS round FROM ($out) ORDER BY a, b"""
    },
    "q_graph_mis" -> {
      def round(r: Int): String = {
        val pe = s"e${r - 1}"; val plv = s"lv${r - 1}"
        s"nm$r AS MATERIALIZED (SELECT src, min(md5('mis|' || dst::VARCHAR)) AS nmin FROM $pe GROUP BY src), " +
          s"winE$r AS MATERIALIZED (SELECT src AS vertex FROM nm$r WHERE md5('mis|' || src::VARCHAR) < nmin), " +
          s"winI$r AS MATERIALIZED (SELECT lv.vertex FROM $plv lv WHERE NOT EXISTS (SELECT 1 FROM $pe e WHERE e.src = lv.vertex)), " +
          s"win$r AS MATERIALIZED (SELECT vertex FROM winE$r UNION SELECT vertex FROM winI$r), " +
          s"dead$r AS MATERIALIZED (SELECT vertex FROM win$r UNION SELECT e.dst FROM $pe e JOIN winE$r w ON e.src = w.vertex), " +
          s"e$r AS MATERIALIZED (SELECT e.src, e.dst FROM $pe e WHERE NOT EXISTS (SELECT 1 FROM dead$r d WHERE d.vertex = e.src) AND NOT EXISTS (SELECT 1 FROM dead$r d WHERE d.vertex = e.dst)), " +
          s"lv$r AS MATERIALIZED (SELECT vertex FROM $plv EXCEPT SELECT vertex FROM dead$r)"
      }
      val rounds = (1 to 3).map(round).mkString(", ")
      val out = (1 to 3)
        .map(r => s"SELECT vertex, $r AS round FROM win$r").mkString(" UNION ALL ")
      s"""WITH und AS (SELECT DISTINCT least(o_orderkey % 300, o_custkey % 300)::BIGINT AS a, greatest(o_orderkey % 300, o_custkey % 300)::BIGINT AS b FROM orders WHERE o_orderkey % 300 <> o_custkey % 300), e0 AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und), lv0 AS (SELECT DISTINCT src AS vertex FROM e0), $rounds SELECT vertex, round::BIGINT AS round FROM ($out) ORDER BY vertex"""
    },
    // three unrolled hash-argmin steps over the mirrored mod-150 set;
    // min-struct on (md5 hex, neighbour) — binary string collation in
    // both engines, so the argmin picks identically
    "q_graph_walks" ->
      """WITH und AS (SELECT DISTINCT least(o_orderkey % 150, o_custkey % 150)::BIGINT AS a, greatest(o_orderkey % 150, o_custkey % 150)::BIGINT AS b FROM orders WHERE o_orderkey % 150 <> o_custkey % 150), e AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und), w1 AS (SELECT src AS start, (min({'h': md5('walk1|' || src::VARCHAR || '|' || dst::VARCHAR), 'n': dst})).n AS v1 FROM e GROUP BY src), w2 AS (SELECT w1.start, w1.v1, (min({'h': md5('walk2|' || w1.v1::VARCHAR || '|' || e.dst::VARCHAR), 'n': e.dst})).n AS v2 FROM w1 JOIN e ON e.src = w1.v1 GROUP BY w1.start, w1.v1), w3 AS (SELECT w2.start, w2.v1, w2.v2, (min({'h': md5('walk3|' || w2.v2::VARCHAR || '|' || e.dst::VARCHAR), 'n': e.dst})).n AS v3 FROM w2 JOIN e ON e.src = w2.v2 GROUP BY w2.start, w2.v1, w2.v2) SELECT start, v1, v2, v3 FROM w3 ORDER BY start""",
    // same two unrolled LPA rounds over the mirrored mod-300 edge set
    "q_graph_lpa_big" ->
      """WITH und AS (SELECT DISTINCT least(o_orderkey % 300, o_custkey % 300)::BIGINT AS a, greatest(o_orderkey % 300, o_custkey % 300)::BIGINT AS b FROM orders WHERE o_orderkey % 300 <> o_custkey % 300), e AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und), v AS (SELECT DISTINCT src AS vertex FROM e), l0 AS (SELECT vertex, vertex AS label FROM v), c1 AS (SELECT e.dst AS vertex, l0.label AS label, count(*) AS cnt FROM e JOIN l0 ON e.src = l0.vertex GROUP BY 1, 2), l1 AS (SELECT vertex, (max({'c': cnt, 'n': -label})).n * -1 AS label FROM c1 GROUP BY vertex), c2 AS (SELECT e.dst AS vertex, l1.label AS label, count(*) AS cnt FROM e JOIN l1 ON e.src = l1.vertex GROUP BY 1, 2), l2 AS (SELECT vertex, (max({'c': cnt, 'n': -label})).n * -1 AS label FROM c2 GROUP BY vertex) SELECT vertex, label::BIGINT AS label FROM l2 ORDER BY vertex""",
    // the LPA chain through l2, then integer-form modularity terms
    // same 2-round LPA labels, same both-endpoint cut counting, same
    // integer ppm with the min=0 guard
    "q_graph_conductance" ->
      s"""WITH $treeEdgeSql, v AS (SELECT DISTINCT src AS vertex FROM e), l0 AS (SELECT vertex, vertex AS label FROM v), c1 AS (SELECT e.dst AS vertex, l0.label AS label, count(*) AS cnt FROM e JOIN l0 ON e.src = l0.vertex GROUP BY 1, 2), l1 AS (SELECT vertex, (max({'c': cnt, 'n': -label})).n * -1 AS label FROM c1 GROUP BY vertex), c2 AS (SELECT e.dst AS vertex, l1.label AS label, count(*) AS cnt FROM e JOIN l1 ON e.src = l1.vertex GROUP BY 1, 2), l2 AS (SELECT vertex, (max({'c': cnt, 'n': -label})).n * -1 AS label FROM c2 GROUP BY vertex), und AS (SELECT DISTINCT src AS a, dst AS b FROM e WHERE src < dst), mm AS (SELECT count(*)::BIGINT AS m FROM und), cross_ AS (SELECT la.label AS la, lb.label AS lb FROM und JOIN l2 la ON und.a = la.vertex JOIN l2 lb ON und.b = lb.vertex WHERE la.label <> lb.label), cut AS (SELECT label, count(*)::BIGINT AS cut FROM (SELECT la AS label FROM cross_ UNION ALL SELECT lb FROM cross_) GROUP BY label), deg AS (SELECT src AS vertex, count(*)::BIGINT AS deg FROM e GROUP BY src), vol AS (SELECT l2.label, count(*)::BIGINT AS n_vertices, sum(deg.deg)::BIGINT AS vol FROM l2 JOIN deg ON l2.vertex = deg.vertex GROUP BY l2.label) SELECT vol.label::BIGINT AS label, vol.n_vertices, coalesce(cut.cut, 0)::BIGINT AS cut, vol.vol, (CASE WHEN least(vol.vol, 2 * mm.m - vol.vol) = 0 THEN 0 ELSE coalesce(cut.cut, 0) * 1000000 // least(vol.vol, 2 * mm.m - vol.vol) END)::BIGINT AS phi_ppm FROM vol LEFT JOIN cut ON vol.label = cut.label CROSS JOIN mm ORDER BY label""",
    "q_graph_modularity" ->
      s"""WITH $treeEdgeSql, v AS (SELECT DISTINCT src AS vertex FROM e), l0 AS (SELECT vertex, vertex AS label FROM v), c1 AS (SELECT e.dst AS vertex, l0.label AS label, count(*) AS cnt FROM e JOIN l0 ON e.src = l0.vertex GROUP BY 1, 2), l1 AS (SELECT vertex, (max({'c': cnt, 'n': -label})).n * -1 AS label FROM c1 GROUP BY vertex), c2 AS (SELECT e.dst AS vertex, l1.label AS label, count(*) AS cnt FROM e JOIN l1 ON e.src = l1.vertex GROUP BY 1, 2), l2 AS (SELECT vertex, (max({'c': cnt, 'n': -label})).n * -1 AS label FROM c2 GROUP BY vertex), und AS (SELECT DISTINCT src AS a, dst AS b FROM e WHERE src < dst), mm AS (SELECT count(*)::BIGINT AS m FROM und), deg AS (SELECT src AS vertex, count(*)::BIGINT AS deg FROM e GROUP BY src), dc AS (SELECT l2.label, count(*)::BIGINT AS n_vertices, sum(deg.deg)::BIGINT AS d_sum FROM l2 JOIN deg ON l2.vertex = deg.vertex GROUP BY l2.label), ein AS (SELECT la.label, count(*)::BIGINT AS e_in FROM und JOIN l2 la ON und.a = la.vertex JOIN l2 lb ON und.b = lb.vertex WHERE la.label = lb.label GROUP BY la.label), rows_ AS (SELECT dc.label, dc.n_vertices, coalesce(ein.e_in, 0)::BIGINT AS e_in, dc.d_sum, (4 * mm.m * coalesce(ein.e_in, 0) - dc.d_sum * dc.d_sum)::BIGINT AS c_num, mm.m FROM dc LEFT JOIN ein ON dc.label = ein.label CROSS JOIN mm) SELECT label::BIGINT AS label, n_vertices, e_in, d_sum, round(c_num::DOUBLE / (4.0 * m * m), 6) AS q_contrib, round(sum(c_num) OVER ()::DOUBLE / (4.0 * m * m), 6) AS modularity FROM rows_ ORDER BY label""",
    "q_graph_ppr_multi" -> {
      // two independent unrolled single-seed chains (seed 0 and seed
      // 24), unioned — the batch loop's per-seed slices are
      // bit-identical to the single-seed recurrence by construction
      def chain(seed: Long) = {
        val seedCase = s"CASE WHEN v.vertex = $seed THEN 0.15 ELSE 0.0 END"
        val iters = (1 to 10).map { i =>
          s"s${seed}r$i AS (SELECT v.vertex, $seedCase + 0.85 * coalesce(s.m, 0.0) AS rank FROM v LEFT JOIN " +
            s"(SELECT e.dst AS vertex, sum((s${seed}r${i - 1}.rank / od.odeg)::DECIMAL(38,18))::DOUBLE AS m " +
            s"FROM s${seed}r${i - 1} JOIN od ON s${seed}r${i - 1}.vertex = od.src JOIN e ON e.src = od.src GROUP BY e.dst) s " +
            s"ON v.vertex = s.vertex)"
        }.mkString(", ")
        s"s${seed}r0 AS (SELECT vertex, CASE WHEN vertex = $seed THEN 1.0 ELSE 0.0 END::DOUBLE AS rank FROM v), $iters"
      }
      s"""WITH $treeEdgeSql, od AS (SELECT src, count(*)::DOUBLE AS odeg FROM e GROUP BY src), v AS (SELECT DISTINCT vertex FROM (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)), ${chain(0L)}, ${chain(24L)} SELECT seed, vertex, round(rank, 6) AS rank FROM (SELECT 0::BIGINT AS seed, vertex, rank FROM s0r10 UNION ALL SELECT 24::BIGINT, vertex, rank FROM s24r10) ORDER BY seed, vertex"""
    },
    "q_graph_ppr" -> {
      // ten unrolled iterations of the PERSONALIZED recurrence: the
      // reset term is seed-gated, r0 is the seed indicator; same
      // decimal-cast contribution sums as the engine
      val seedCase = "CASE WHEN v.vertex IN (0, 24) THEN 0.15 ELSE 0.0 END"
      val iters = (1 to 10).map { i =>
        s"r$i AS (SELECT v.vertex, $seedCase + 0.85 * coalesce(s.m, 0.0) AS rank FROM v LEFT JOIN " +
          s"(SELECT e.dst AS vertex, sum((r${i - 1}.rank / od.odeg)::DECIMAL(38,18))::DOUBLE AS m " +
          s"FROM r${i - 1} JOIN od ON r${i - 1}.vertex = od.src JOIN e ON e.src = od.src GROUP BY e.dst) s " +
          s"ON v.vertex = s.vertex)"
      }.mkString(", ")
      s"""WITH $treeEdgeSql, od AS (SELECT src, count(*)::DOUBLE AS odeg FROM e GROUP BY src), v AS (SELECT DISTINCT vertex FROM (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)), r0 AS (SELECT vertex, CASE WHEN vertex IN (0, 24) THEN 1.0 ELSE 0.0 END::DOUBLE AS rank FROM v), $iters SELECT vertex, round(rank, 6) AS rank FROM r10 ORDER BY vertex"""
    },
    // four unrolled walk-count steps, integer 2^(4−k) weights, exact
    // dyadic /16 readout — no rounding in either engine
    "q_graph_katz" ->
      s"""WITH $treeEdgeSql, v AS (SELECT DISTINCT vertex FROM (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)), p0 AS (SELECT vertex, 1::BIGINT AS w FROM v), p1 AS (SELECT e.dst AS vertex, sum(p0.w)::BIGINT AS w FROM p0 JOIN e ON e.src = p0.vertex GROUP BY e.dst), p2 AS (SELECT e.dst AS vertex, sum(p1.w)::BIGINT AS w FROM p1 JOIN e ON e.src = p1.vertex GROUP BY e.dst), p3 AS (SELECT e.dst AS vertex, sum(p2.w)::BIGINT AS w FROM p2 JOIN e ON e.src = p2.vertex GROUP BY e.dst), p4 AS (SELECT e.dst AS vertex, sum(p3.w)::BIGINT AS w FROM p3 JOIN e ON e.src = p3.vertex GROUP BY e.dst), a AS (SELECT vertex, w * 8 AS c FROM p1 UNION ALL SELECT vertex, w * 4 FROM p2 UNION ALL SELECT vertex, w * 2 FROM p3 UNION ALL SELECT vertex, w FROM p4), k AS (SELECT vertex, sum(c)::BIGINT AS katz16 FROM a GROUP BY vertex) SELECT v.vertex, coalesce(k.katz16, 0)::BIGINT AS katz16, (coalesce(k.katz16, 0) / 16.0)::DOUBLE AS katz FROM v LEFT JOIN k USING (vertex) ORDER BY vertex""",
    "q_graph_bfs_bidir" ->
      s"""WITH RECURSIVE $treeEdgeSql, p AS (SELECT * FROM (VALUES (15::BIGINT, 24::BIGINT), (0::BIGINT, 23::BIGINT), (9::BIGINT, 12::BIGINT)) v(a, b)), r AS (SELECT a AS root, a AS vertex, 0 AS lvl FROM p UNION SELECT r.root, e.dst, r.lvl + 1 FROM r JOIN e ON e.src = r.vertex WHERE r.lvl < 30), lv AS (SELECT root, vertex, min(lvl) AS lvl FROM r GROUP BY root, vertex) SELECT p.a, p.b, lv.lvl::BIGINT AS dist FROM p JOIN lv ON lv.root = p.a AND lv.vertex = p.b ORDER BY a""",
    "q_graph_eccentricity" ->
      s"""WITH RECURSIVE $treeEdgeSql, v AS (SELECT DISTINCT src AS root FROM e), r AS (SELECT root, root AS vertex, 0 AS level FROM v UNION SELECT r.root, e.dst, r.level + 1 FROM r JOIN e ON e.src = r.vertex WHERE r.level < 30), lv AS (SELECT root, vertex, min(level) AS level FROM r GROUP BY root, vertex) SELECT root AS vertex, max(level)::BIGINT AS ecc FROM lv GROUP BY root ORDER BY vertex""",
    "q_graph_betweenness" ->
      s"""WITH RECURSIVE $treeEdgeSql, v AS (SELECT DISTINCT src AS root FROM e), r AS (SELECT root, root AS vertex, 0 AS level FROM v UNION SELECT r.root, e.dst, r.level + 1 FROM r JOIN e ON e.src = r.vertex WHERE r.level < 30), lv AS (SELECT root, vertex, min(level) AS level FROM r GROUP BY root, vertex), bcp AS (SELECT sv.vertex AS v, count(*) AS bc FROM lv sv JOIN lv vt ON sv.vertex = vt.root JOIN lv st ON st.root = sv.root AND st.vertex = vt.vertex WHERE sv.root <> sv.vertex AND vt.vertex <> sv.vertex AND sv.level + vt.level = st.level GROUP BY sv.vertex) SELECT v.root AS vertex, coalesce(bcp.bc, 0)::BIGINT AS bc FROM v LEFT JOIN bcp ON v.root = bcp.v ORDER BY vertex""",
    "q_graph_pagerank" -> {
      // ten unrolled iterations of the deterministic recurrence;
      // per-edge contributions decimal-cast before summing, mirroring
      // Traversals.pageRankDeterministic exactly.
      // Residual cross-engine risk (r14 ADVICE, theoretical): the
      // engine's fixed18 rounds the EXACT binary expansion half-up at
      // 1e-18 while DuckDB's ::DECIMAL(38,18) rounds the SHORTEST
      // decimal representation — a documented ≤1-unit-of-1e-18
      // divergence per edge. A final rank would have to sit within
      // ~1e-12 of a round(,6) boundary for the engines to straddle;
      // no fixture has produced one (gate green at every SF). If a
      // q_graph_pagerank*/q_graph_ppr* hash flake ever appears, THIS
      // is the first suspect — see FixedPoint.scala's scaladoc.
      val iters = (1 to 10).map { i =>
        s"r$i AS (SELECT v.vertex, 0.15 + 0.85 * coalesce(s.m, 0.0) AS rank FROM v LEFT JOIN " +
          s"(SELECT e.dst AS vertex, sum((r${i - 1}.rank / od.odeg)::DECIMAL(38,18))::DOUBLE AS m " +
          s"FROM r${i - 1} JOIN od ON r${i - 1}.vertex = od.src JOIN e ON e.src = od.src GROUP BY e.dst) s " +
          s"ON v.vertex = s.vertex)"
      }.mkString(", ")
      s"""WITH $treeEdgeSql, od AS (SELECT src, count(*)::DOUBLE AS odeg FROM e GROUP BY src), v AS (SELECT DISTINCT vertex FROM (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)), r0 AS (SELECT vertex, 1.0::DOUBLE AS rank FROM v), $iters SELECT vertex, round(rank, 6) AS rank FROM r10 ORDER BY vertex"""
    },
    "q_graph_pagerank_graphx" -> {
      // two unrolled iterations in PLAIN DOUBLE arithmetic — the
      // GraphX message type; sum-order drift « the round(,6) grid on
      // the ≤3-in-degree tree (see the engine entry's rationale)
      val iters = (1 to 2).map { i =>
        s"r$i AS (SELECT v.vertex, 0.15 + 0.85 * coalesce(s.m, 0.0) AS rank FROM v LEFT JOIN " +
          s"(SELECT e.dst AS vertex, sum(r${i - 1}.rank / od.odeg) AS m " +
          s"FROM r${i - 1} JOIN od ON r${i - 1}.vertex = od.src JOIN e ON e.src = od.src GROUP BY e.dst) s " +
          s"ON v.vertex = s.vertex)"
      }.mkString(", ")
      s"""WITH $treeEdgeSql, od AS (SELECT src, count(*)::DOUBLE AS odeg FROM e GROUP BY src), v AS (SELECT DISTINCT vertex FROM (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)), r0 AS (SELECT vertex, 1.0::DOUBLE AS rank FROM v), $iters SELECT vertex, round(rank, 6) AS rank FROM r2 ORDER BY vertex"""
    },
    "q_graph_pagerank_big" -> {
      // five unrolled iterations of the same decimal-summed recurrence
      // over the bipartite lineitem graph; top-20 by rounded rank
      val iters = (1 to 5).map { i =>
        s"r$i AS (SELECT v.vertex, 0.15 + 0.85 * coalesce(s.m, 0.0) AS rank FROM v LEFT JOIN " +
          s"(SELECT e.dst AS vertex, sum((r${i - 1}.rank / od.odeg)::DECIMAL(38,18))::DOUBLE AS m " +
          s"FROM r${i - 1} JOIN od ON r${i - 1}.vertex = od.src JOIN e ON e.src = od.src GROUP BY e.dst) s " +
          s"ON v.vertex = s.vertex)"
      }.mkString(", ")
      s"""WITH e0 AS (SELECT DISTINCT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem), e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0), od AS (SELECT src, count(*)::DOUBLE AS odeg FROM e GROUP BY src), v AS (SELECT DISTINCT vertex FROM (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)), r0 AS (SELECT vertex, 1.0::DOUBLE AS rank FROM v), $iters SELECT vertex::BIGINT AS vertex, round(rank, 6) AS rank FROM r5 ORDER BY round(rank, 6) DESC, vertex LIMIT 20"""
    },
    "q_graph_coreness" -> {
      // incremental peel chains: each k peels 4 unrolled rounds from
      // the PREVIOUS core's fixpoint edge set (cores nest, so the
      // chained fixpoint equals the full-graph fixpoint the engine
      // computes); membership union -> max k per vertex, absent -> 1
      // MATERIALIZED is load-bearing: each round references its
      // predecessor 3x (edge side + both endpoint-membership joins),
      // so the default CTE inlining would expand the 24-round chain
      // 3^24-fold at plan time; materialization keeps it linear
      def chain(k: Int, prev: String): String =
        (1 to 4).map { i =>
          val p = if (i == 1) prev else s"e${k}_${i - 1}"
          s"k${k}_$i AS MATERIALIZED (SELECT src AS v FROM (SELECT src, count(*) AS c FROM $p GROUP BY src) WHERE c >= $k), " +
            s"e${k}_$i AS MATERIALIZED (SELECT e.src, e.dst FROM $p e JOIN k${k}_$i a ON e.src = a.v JOIN k${k}_$i b ON e.dst = b.v)"
        }.mkString(", ")
      val chains = (2 to 7)
        .map(k => chain(k, if (k == 2) "e0" else s"e${k - 1}_4")).mkString(", ")
      val members = (2 to 7)
        .map(k => s"SELECT DISTINCT src AS vertex, $k AS kk FROM e${k}_4")
        .mkString(" UNION ALL ")
      s"""WITH p0 AS (SELECT a.n_nationkey::BIGINT AS src, b.n_nationkey::BIGINT AS dst FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey AND (a.n_nationkey + b.n_nationkey) % 4 = 0), e0 AS (SELECT src, dst FROM p0 UNION SELECT dst, src FROM p0), $chains, mem AS ($members), verts AS (SELECT DISTINCT src AS vertex FROM e0) SELECT verts.vertex AS vertex, coalesce(max(mem.kk), 1)::BIGINT AS coreness FROM verts LEFT JOIN mem ON verts.vertex = mem.vertex GROUP BY verts.vertex ORDER BY verts.vertex"""
    },
    "q_graph_kcore" -> {
      // four unrolled peel rounds (fixpoint is at two on this graph)
      val peels = (1 to 4).map { i =>
        s"k$i AS (SELECT src AS v FROM (SELECT src, count(*) AS c FROM e${i - 1} GROUP BY src) WHERE c >= 6), " +
          s"e$i AS (SELECT e.src, e.dst FROM e${i - 1} e JOIN k$i a ON e.src = a.v JOIN k$i b ON e.dst = b.v)"
      }.mkString(", ")
      s"""WITH p0 AS (SELECT a.n_nationkey::BIGINT AS src, b.n_nationkey::BIGINT AS dst FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey AND (a.n_nationkey + b.n_nationkey) % 4 = 0), e0 AS (SELECT src, dst FROM p0 UNION SELECT dst, src FROM p0), $peels SELECT DISTINCT src AS vertex FROM e4 ORDER BY vertex"""
    },
    "q_graph_tri_pervertex" ->
      """WITH e AS (SELECT a.n_nationkey::BIGINT AS u, b.n_nationkey::BIGINT AS v FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey AND (a.n_nationkey + b.n_nationkey) % 4 = 0), tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v), pv AS (SELECT a AS vertex FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) SELECT vertex, count(*)::BIGINT AS triangles FROM pv GROUP BY vertex ORDER BY vertex""",
    "q_graph_triangles" ->
      """WITH e AS (SELECT a.n_nationkey::BIGINT AS u, b.n_nationkey::BIGINT AS v FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey AND (a.n_nationkey + b.n_nationkey) % 4 = 0) SELECT count(*)::BIGINT AS n_triangles FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v""",
    "q_graph_degree_dist" ->
      """WITH e0 AS (SELECT DISTINCT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem), e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0), deg AS (SELECT src AS vertex, count(*) AS deg FROM e GROUP BY src) SELECT length(format('{:b}', deg))::INT AS bucket, count(*)::BIGINT AS n_vertices, min(deg)::BIGINT AS min_deg, max(deg)::BIGINT AS max_deg FROM deg GROUP BY bucket ORDER BY bucket""",
    // same canonical bipartite pairs, same 5 unrolled batched-peel
    // rounds with the cross-multiplied integer threshold deg·V > 3·E,
    // same ⌊10⁶·E/V⌋ integer density; n_peeled = nv_r − nv_{r+1}
    // (edge-derived vertex sets — isolation counts as leaving)
    "q_graph_densest" -> {
      val rounds = (1 to 5).map { r =>
        s"m$r AS MATERIALIZED (SELECT count(*)::BIGINT AS ne FROM e${r - 1}), " +
          s"d$r AS MATERIALIZED (SELECT v, count(*)::BIGINT AS dg FROM (SELECT a AS v FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1}) GROUP BY v), " +
          s"n$r AS MATERIALIZED (SELECT count(*)::BIGINT AS nv FROM d$r), " +
          s"k$r AS MATERIALIZED (SELECT v FROM d$r, m$r, n$r WHERE dg * nv > 3 * ne), " +
          s"e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e JOIN k$r x ON e.a = x.v JOIN k$r y ON e.b = y.v)"
      }.mkString(", ")
      val post =
        "n6 AS (SELECT count(*)::BIGINT AS nv FROM (SELECT DISTINCT v FROM (SELECT a AS v FROM e5 UNION ALL SELECT b FROM e5)))"
      val rows = (1 to 5).map { r =>
        val next = if (r == 5) "n6" else s"n${r + 1}"
        s"SELECT $r::INT AS round, n$r.nv AS n_vertices, m$r.ne AS n_edges, (CASE WHEN n$r.nv > 0 THEN (1000000 * m$r.ne) // n$r.nv ELSE 0 END)::BIGINT AS density_ppm, (n$r.nv - $next.nv)::BIGINT AS n_peeled FROM m$r, n$r, $next"
      }.mkString(" UNION ALL ")
      s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT least(l_orderkey * 2, l_suppkey * 2 + 1)::BIGINT AS a, greatest(l_orderkey * 2, l_suppkey * 2 + 1)::BIGINT AS b FROM lineitem), $rounds, $post, st AS ($rows) SELECT round, n_vertices, n_edges, density_ppm, n_peeled, (CASE WHEN row_number() OVER (ORDER BY density_ppm DESC, round) = 1 THEN 1 ELSE 0 END)::INT AS is_best FROM st ORDER BY round"""
    },
    "q_graph_subtree_sum" ->
      """WITH RECURSIVE n AS (SELECT n_nationkey::BIGINT AS k FROM nation), up AS (SELECT k AS v, k AS a FROM n UNION ALL SELECT v, a // 2 FROM up WHERE a > 0) SELECT a AS vertex, sum(v)::BIGINT AS subtree_sum FROM up GROUP BY a ORDER BY vertex""",
    "q_graph_clustcoef" ->
      """WITH e AS (SELECT a.n_nationkey::BIGINT AS u, b.n_nationkey::BIGINT AS v FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey AND (a.n_nationkey + b.n_nationkey) % 4 = 0), tri AS (SELECT count(*)::BIGINT AS n_triangles FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v), m AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e), deg AS (SELECT src, count(*) AS dg FROM m GROUP BY src), w AS (SELECT sum(dg * (dg - 1) // 2)::BIGINT AS n_wedges FROM deg) SELECT n_triangles, n_wedges, round(n_triangles * 3.0 / n_wedges, 6) AS cc FROM tri, w""",
    "q_graph_triangles_big" ->
      """WITH und AS (SELECT DISTINCT least(o_orderkey % 300, o_custkey % 300)::BIGINT AS a, greatest(o_orderkey % 300, o_custkey % 300)::BIGINT AS b FROM orders WHERE o_orderkey % 300 <> o_custkey % 300), tri AS (SELECT e1.a AS x FROM und e1 JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b) SELECT x AS vertex, count(*)::BIGINT AS triangles FROM tri GROUP BY x ORDER BY vertex""",
    "q_graph_squares" ->
      """WITH und AS (SELECT DISTINCT least(o_orderkey % 150, o_custkey % 150)::BIGINT AS a, greatest(o_orderkey % 150, o_custkey % 150)::BIGINT AS b FROM orders WHERE o_orderkey % 150 <> o_custkey % 150), sym AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und), cn AS (SELECT p.dst AS a, q.dst AS b, count(*)::BIGINT AS cn FROM sym p JOIN sym q ON p.src = q.src AND p.dst < q.dst GROUP BY 1, 2), sq AS (SELECT a, b, cn, (cn * (cn - 1)) // 2 AS nsq FROM cn WHERE (cn * (cn - 1)) // 2 > 0), tot AS (SELECT (sum(nsq) // 2)::BIGINT AS total_squares FROM sq) SELECT sq.a, sq.b, sq.cn, sq.nsq, tot.total_squares FROM sq, tot ORDER BY sq.nsq DESC, sq.a, sq.b LIMIT 10""",
    // two unrolled peels; support = common-neighbour count within the
    // round's surviving edge set (left join + coalesce 0 mirrors the
    // engine's "no triangle -> support 0 -> peeled" rule)
    "q_graph_ktruss" ->
      """WITH und AS (SELECT DISTINCT least(o_orderkey % 300, o_custkey % 300)::BIGINT AS a, greatest(o_orderkey % 300, o_custkey % 300)::BIGINT AS b FROM orders WHERE o_orderkey % 300 <> o_custkey % 300), sym0 AS (SELECT a AS v, b AS w FROM und UNION ALL SELECT b, a FROM und), s1 AS (SELECT u.a, u.b, count(*)::BIGINT AS sup FROM und u JOIN sym0 x ON x.v = u.a JOIN sym0 y ON y.v = u.b AND y.w = x.w GROUP BY u.a, u.b), e1 AS (SELECT u.a, u.b FROM und u LEFT JOIN s1 ON s1.a = u.a AND s1.b = u.b WHERE coalesce(s1.sup, 0) >= 2), sym1 AS (SELECT a AS v, b AS w FROM e1 UNION ALL SELECT b, a FROM e1), s2 AS (SELECT u.a, u.b, count(*)::BIGINT AS sup FROM e1 u JOIN sym1 x ON x.v = u.a JOIN sym1 y ON y.v = u.b AND y.w = x.w GROUP BY u.a, u.b) SELECT e1.a AS src, e1.b AS dst, coalesce(s2.sup, 0)::BIGINT AS support FROM e1 LEFT JOIN s2 ON s2.a = e1.a AND s2.b = e1.b WHERE coalesce(s2.sup, 0) >= 2 ORDER BY src, dst""",
    "q_graph_linkpred" ->
      """WITH und AS (SELECT DISTINCT least(o_orderkey % 300, o_custkey % 300)::BIGINT AS a, greatest(o_orderkey % 300, o_custkey % 300)::BIGINT AS b FROM orders WHERE o_orderkey % 300 <> o_custkey % 300), sym AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und), cn AS (SELECT p.dst AS a, q.dst AS b, count(*)::BIGINT AS cn FROM sym p JOIN sym q ON p.src = q.src AND p.dst < q.dst GROUP BY 1, 2), deg AS (SELECT src AS v, count(*)::BIGINT AS deg FROM sym GROUP BY src) SELECT c.a, c.b, c.cn, (da.deg * db.deg)::BIGINT AS pa FROM cn c JOIN deg da ON da.v = c.a JOIN deg db ON db.v = c.b WHERE NOT EXISTS (SELECT 1 FROM und u WHERE u.a = c.a AND u.b = c.b) ORDER BY c.cn DESC, pa DESC, c.a, c.b LIMIT 100""",
    "q_graph_hits" ->
      """WITH e AS (SELECT DISTINCT (o_orderkey % 150)::BIGINT AS src, (o_custkey % 150)::BIGINT AS dst FROM orders WHERE o_orderkey % 150 <> o_custkey % 150), verts AS (SELECT src AS v FROM e UNION SELECT dst FROM e), a1 AS (SELECT dst AS v, count(*)::BIGINT AS a1 FROM e GROUP BY dst), h1 AS (SELECT e.src AS v, sum(a1.a1)::BIGINT AS h1 FROM e JOIN a1 ON e.dst = a1.v GROUP BY e.src), a2 AS (SELECT e.dst AS v, sum(h1.h1)::BIGINT AS a2 FROM e JOIN h1 ON e.src = h1.v GROUP BY e.dst) SELECT verts.v AS vertex, coalesce(h1.h1, 0)::BIGINT AS hub, coalesce(a2.a2, 0)::BIGINT AS auth FROM verts LEFT JOIN h1 ON verts.v = h1.v LEFT JOIN a2 ON verts.v = a2.v ORDER BY vertex""",
    "q_graph_jaccard" ->
      """WITH und AS (SELECT DISTINCT least(o_orderkey % 300, o_custkey % 300)::BIGINT AS a, greatest(o_orderkey % 300, o_custkey % 300)::BIGINT AS b FROM orders WHERE o_orderkey % 300 <> o_custkey % 300), sym AS (SELECT a AS v, b AS w FROM und UNION ALL SELECT b, a FROM und), deg AS (SELECT v, count(*)::BIGINT AS deg FROM sym GROUP BY v), common AS (SELECT u.a, u.b, count(*)::BIGINT AS c FROM und u JOIN sym x ON x.v = u.a JOIN sym y ON y.v = u.b AND y.w = x.w GROUP BY u.a, u.b) SELECT c0.a AS src, c0.b AS dst, round(c::DOUBLE / (da.deg + db.deg - c), 4) AS jac FROM common c0 JOIN deg da ON da.v = c0.a JOIN deg db ON db.v = c0.b ORDER BY src, dst""",
    // same mod-300 canonical graph, same integer E/N terms per k,
    // one closing division
    "q_graph_richclub" ->
      """WITH und AS (SELECT DISTINCT least(o_orderkey % 300, o_custkey % 300)::BIGINT AS a, greatest(o_orderkey % 300, o_custkey % 300)::BIGINT AS b FROM orders WHERE o_orderkey % 300 <> o_custkey % 300), m AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und), deg AS (SELECT src AS v, count(*)::BIGINT AS dg FROM m GROUP BY src), ks AS (SELECT unnest([2, 4, 8, 16]) AS k), nk AS (SELECT k, count(*)::BIGINT AS n_nodes FROM deg CROSS JOIN ks WHERE dg > k GROUP BY k HAVING count(*) >= 2), ek AS (SELECT k, count(*)::BIGINT AS n_edges FROM und JOIN deg da ON und.a = da.v JOIN deg db ON und.b = db.v CROSS JOIN ks WHERE da.dg > k AND db.dg > k GROUP BY k) SELECT nk.k::INT AS k, nk.n_nodes, coalesce(ek.n_edges, 0)::BIGINT AS n_edges, round(coalesce(ek.n_edges, 0) * 2.0 / (nk.n_nodes * (nk.n_nodes - 1)), 6) AS phi FROM nk LEFT JOIN ek ON nk.k = ek.k ORDER BY k""",
    // same bounded per-order pair expansion, same exact 720-scaled
    // Newman weights, one closing division
    "q_graph_coproj" ->
      """WITH e AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem), deg AS (SELECT o, count(*) AS dg FROM e GROUP BY o), p AS (SELECT a.s AS sa, b.s AS sb, d.dg FROM e a JOIN e b ON a.o = b.o AND a.s < b.s JOIN deg d ON a.o = d.o), g AS (SELECT sa, sb, count(*)::BIGINT AS w, sum(720 // (dg - 1))::BIGINT AS nw720 FROM p GROUP BY sa, sb) SELECT sa, sb, w, round(nw720 / 720.0, 4) AS newman_w FROM g ORDER BY w DESC, sa, sb LIMIT 50""",
    // lp: recursive-CTE longest path — UNION-deduped (v, len) rows,
    // bounded by V·depth on the layered fixture; np: 7 unrolled layer
    // sums (path ENUMERATION would be exponential; layer sums are the
    // engine's sweep restated)
    "q_graph_toposort" ->
      ("""WITH RECURSIVE e AS (SELECT DISTINCT (o_orderkey % 200)::BIGINT AS src, (o_custkey % 200)::BIGINT AS dst FROM orders WHERE (o_custkey % 200) // 25 = (o_orderkey % 200) // 25 + 1), verts AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)), p AS (SELECT v, 0::BIGINT AS l FROM verts UNION SELECT e.dst, p.l + 1 FROM p JOIN e ON e.src = p.v), lp AS (SELECT v, max(l)::BIGINT AS lp FROM p GROUP BY v), n0 AS (SELECT v, (CASE WHEN v // 25 = 0 THEN 1 ELSE 0 END)::BIGINT AS np FROM verts), """ +
        (1 to 7).map { k =>
          s"s$k AS (SELECT e.dst, sum(n${k - 1}.np)::BIGINT AS s FROM e JOIN n${k - 1} ON e.src = n${k - 1}.v WHERE n${k - 1}.v // 25 = ${k - 1} GROUP BY e.dst), " +
          s"n$k AS (SELECT n${k - 1}.v, (CASE WHEN n${k - 1}.v // 25 <> $k THEN n${k - 1}.np ELSE coalesce(s$k.s, 0) END)::BIGINT AS np FROM n${k - 1} LEFT JOIN s$k ON s$k.dst = n${k - 1}.v)"
        }.mkString(", ") +
        """ SELECT lp.v AS vertex, lp.lp, n7.np FROM lp JOIN n7 ON lp.v = n7.v ORDER BY vertex"""))
}
