package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench-selection rule (BASELINE.md "Bench selection
  * rule"): `Bench.headline` and `Bench.benchExcluded` must partition
  * the gate inventory exactly. A new gate entry that is neither
  * headlined nor classified fails here — so a heavy query can never
  * silently drop out of the headline set, and an exclusion always
  * names its category. */
class BenchSelectionSpec extends AnyFunSuite {

  private val validCategories =
    Set("streaming", "commit-io", "fixture-latency", "family-variant")

  test("headline and benchExcluded partition SparkEntry.queries") {
    val h = Bench.headline.toSet
    val x = Bench.benchExcluded.keySet
    val all = SparkEntry.queries.keySet
    val overlap = h intersect x
    assert(overlap.isEmpty,
      s"queries both headlined and excluded: ${overlap.toSeq.sorted.mkString(", ")}")
    val unclassified = all diff (h union x)
    assert(unclassified.isEmpty,
      "gate queries neither headlined nor classified in benchExcluded " +
        s"(classify or headline them): ${unclassified.toSeq.sorted.mkString(", ")}")
    val stale = (h union x) diff all
    assert(stale.isEmpty,
      s"bench names absent from the gate inventory: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every exclusion uses a documented category") {
    val bad = Bench.benchExcluded.filterNot { case (_, c) => validCategories(c) }
    assert(bad.isEmpty, s"unknown exclusion categories: $bad")
  }

  test("streaming entries are excluded as streaming, and only they are") {
    val streamNames = SparkEntry.queries.keySet.filter(_.startsWith("q_stream_"))
    val classed = Bench.benchExcluded.filter(_._2 == "streaming").keySet
    assert(classed == streamNames,
      s"streaming classification drift: classed=$classed stream-named=$streamNames")
  }

  test("headline has no duplicates") {
    val dup = Bench.headline.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    assert(dup.isEmpty, s"duplicate headline entries: ${dup.mkString(", ")}")
  }

  test("per-trigger adjudication rule (r18 verdict item 4)") {
    // packed pair explains the wall → exonerated even with no rerun
    assert(Bench.adjudicate(1.0, -1.0, Some((2.0, 1.8))) === "exonerated_packed")
    // isolated best lands within 1.25x the floor → exonerated
    assert(Bench.adjudicate(1.0, 1.25, None) === "exonerated_isolated")
    assert(Bench.adjudicate(1.0, 1.26, None) === "unexplained")
    // a packed pair the wall does NOT sit under never exonerates
    assert(Bench.adjudicate(1.0, 1.3, Some((2.0, 1.0))) === "unexplained")
    // a degenerate (zero) packed bound never exonerates
    assert(Bench.adjudicate(1.0, 1.3, Some((0.0, 0.0))) === "unexplained")
    // failed isolated reruns are named, not hidden
    assert(Bench.adjudicate(1.0, -1.0, None) === "failed")
    assert(Bench.adjudicate(1.0, -1.0, Some((2.0, 1.0))) === "failed")
  }

  test("packedFamily: superstep four + iterative headliners, all headlining") {
    assert(Bench.superstepFamily.subsetOf(Bench.packedFamily))
    Seq("q_graph_cc_big", "q_graph_dfs_classes", "q_graph_ktruss",
        "q_graph_linkpred")
      .foreach(n => assert(Bench.packedFamily(n), s"$n missing from packedFamily"))
    // tracking happens in the suite loop — a non-headline member
    // would silently never record its packed pairs
    Bench.packedFamily.foreach(n =>
      assert(Bench.headline.contains(n), s"packedFamily entry $n not in headline"))
  }

  test("BASELINE.md's bench-selection paragraph states the ACTUAL counts") {
    // r12 VERDICT caught the doc drifting (it said headline=144 —
    // the EXCLUDED count — and family-variant=85 vs actual 89). The
    // paragraph's numbers are now parsed out of the doc and compared
    // to the code, so the two can't diverge silently again.
    val text = scala.io.Source.fromFile("BASELINE.md", "UTF-8").mkString
    val section = text.substring(text.indexOf("## Bench selection rule"))
      .split("\n## ", 2)(0)
    def documented(re: String): Int = {
      val m = re.r.findFirstMatchIn(section)
      assert(m.isDefined, s"BASELINE.md selection paragraph lost pattern: $re")
      m.get.group(1).toInt
    }
    assert(documented("""`Bench\.headline`, (\d+) entries""") === Bench.headline.size,
      s"documented headline count != Bench.headline.size (${Bench.headline.size})")
    val actualByCat = Bench.benchExcluded.groupBy(_._2).view.mapValues(_.size).toMap
    Seq("streaming" -> """streaming\*\* —[\s\S]*?\((\d+) entries\)""",
        "commit-io" -> """commit-io\*\* —[\s\S]*?\((\d+) entries\)""",
        "fixture-latency" -> """fixture-latency\*\* —[\s\S]*?\((\d+) entries\)""",
        "family-variant" -> """family-variant\*\* —[\s\S]*?\((\d+) entries\)""")
      .foreach { case (cat, re) =>
        assert(documented(re) === actualByCat(cat),
          s"documented $cat count != actual ${actualByCat(cat)}")
      }
  }
}
