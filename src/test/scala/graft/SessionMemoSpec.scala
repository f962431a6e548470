package graft

import org.apache.spark.storage.RDDBlockId

import graft.operators.Traversals
import graft.queries.SessionMemo

/** Lifecycle guarantees of the shared staged-artifact memo (r12
  * ADVICE): re-entrant builds must not hit ConcurrentHashMap's
  * recursive-update restriction, and a fixture refresh must release —
  * not strand — the superseded entry's storage blocks. */
class SessionMemoSpec extends SparkSpec {

  private def df(n: Int) = {
    import spark.implicits._
    (1 to n).toDF("v").localCheckpoint(true)
  }

  test("a build may consult the same memo for its dependency " +
       "(the bipartiteEo -> bipartiteEdges shape)") {
    val memo = new SessionMemo
    // Many tags sharing one map maximises the chance of same-bin keys,
    // the layout computeIfAbsent-based memos crashed on; with the
    // build-outside-putIfAbsent design every nesting depth is safe.
    (1 to 64).foreach { i =>
      val derived = memo(spark, "/tmp", s"dep_$i", 7L) { df(3) }
      val top = memo(spark, "/tmp", s"top_$i", 7L) {
        memo(spark, "/tmp", s"inner_$i", 7L)(df(2)).union(derived)
          .localCheckpoint(true)
      }
      assert(top.count() === 5)
    }
  }

  test("same key is served from the memo, not rebuilt") {
    val memo = new SessionMemo
    var builds = 0
    def get() = memo(spark, "/tmp", "stable", 1L) { builds += 1; df(4) }
    assert(get().count() === 4)
    assert(get().count() === 4)
    assert(builds === 1)
    assert(memo.entryCount(spark, "/tmp", "stable") === 1)
  }

  test("a fixture refresh (new fingerprint) evicts the stale entry " +
       "AND drops its checkpoint blocks") {
    val memo = new SessionMemo
    val v1 = memo(spark, "/tmp", "refresh", 1L) { df(10) }
    val v1Blocks = Traversals.checkpointRddIds(v1)
    assert(v1Blocks.nonEmpty)
    def blockLive(ids: Set[Int]): Boolean = {
      val bm = org.apache.spark.SparkEnv.get.blockManager.master
      ids.exists(id => bm.getMatchingBlockIds(
        { case RDDBlockId(rid, _) => ids.contains(rid); case _ => false },
        askStorageEndpoints = true).nonEmpty)
    }
    assert(blockLive(v1Blocks), "precondition: v1's checkpoint is stored")
    val v2 = memo(spark, "/tmp", "refresh", 2L) { df(20) }
    assert(v2.count() === 20)
    assert(memo.entryCount(spark, "/tmp", "refresh") === 1,
      "stale fingerprint entry must be removed on refresh")
    // unpersist is async (blocking = false): poll briefly
    val deadline = System.nanoTime() + 10e9.toLong
    while (blockLive(v1Blocks) && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(!blockLive(v1Blocks),
      "superseded entry's localCheckpoint blocks must be unpersisted")
  }

  test("a refresh keeps blocks another live entry's plan still reads") {
    val memo = new SessionMemo
    val base = memo(spark, "/tmp", "shared_base", 1L) { df(6) }
    // persisted-on-top-of-checkpoint, the pageRankEdgeTable shape: its
    // plan leaf IS base's LogicalRDD
    val dependent = memo(spark, "/tmp", "shared_dep", 1L) {
      base.filter(org.apache.spark.sql.functions.col("v") > 1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    assert(dependent.count() === 5)
    // refresh ONLY the base tag; the dependent still references base's
    // checkpoint block, so the release must keep it readable
    val base2 = memo(spark, "/tmp", "shared_base", 2L) { df(8) }
    assert(base2.count() === 8)
    assert(dependent.count() === 5,
      "dependent plan must stay computable after its dependency's tag refreshes")
  }
}
