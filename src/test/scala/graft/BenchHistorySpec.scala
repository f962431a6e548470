package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The bench's outlier-isolation trigger arms from cross-round per-query
  * minima parsed out of past artifacts. Round 10 proved the parse can rot
  * silently: the driver wraps bench stdout as an ESCAPED JSON string, the
  * r10 regex only matched raw quotes, histMin came back empty, and the
  * one number that most needed an in-artifact exoneration
  * (q_graph_pagerank_big, 19.4 s vs a 6.5 s steady state) never got its
  * isolated rerun. These tests pin the parse against both artifact forms
  * and against the real driver artifacts in the repo. */
class BenchHistorySpec extends AnyFunSuite {

  test("parseMins reads raw bench_out-style artifact lines") {
    val raw = """{"metric":"total","queries":{"q_foo":1.500,"q_bar":0.250},""" +
      """"queries_min":{"q_foo":1.200,"q_bar":0.210},"failed":[],"sf":"/d/sf0.1"}"""
    val got = Bench.parseMins(raw).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    assert(got("q_foo") == 1.2)
    assert(got("q_bar") == 0.21)
  }

  test("parseMins reads driver-wrapped ESCAPED artifact tails and drops -1 sentinels") {
    // exactly the shape of BENCH_r{N}.json: the bench line embedded in a
    // JSON string field, every quote backslash-escaped
    val wrapped = """{"n":10,"rc":0,"tail":"{\"queries\":{\"q_foo\":19.355,""" +
      """\"q_bad\":-1.0,\"q_bar\":0.204},\"sf\":\"/d/sf0.1\"}\n"}"""
    val got = Bench.parseMins(wrapped).toMap
    assert(got("q_foo") == 19.355)
    assert(got("q_bar") == 0.204)
    assert(!got.contains("q_bad"), "failed-query -1 sentinel must not become a minimum")
  }

  test("historicalMinima filters by scale marker in both raw and escaped forms") {
    val dir = Files.createTempDirectory("benchhist").toFile
    // escaped artifact at sf0.1, raw artifact at sf0.01 — asking for
    // sf0.1 must see only the first
    Files.writeString(new java.io.File(dir, "BENCH_r98.json").toPath,
      """{"tail":"{\"queries\":{\"q_x\":5.0},\"sf\":\"/t/sf0.1\"}"}""")
    Files.writeString(new java.io.File(dir, "bench_out.json").toPath,
      """{"queries":{"q_x":0.5},"sf":"/t/sf0.01"}""")
    val at01 = Bench.historicalMinima("sf0.1", dir)
    assert(at01 == Map("q_x" -> 5.0))
    val at001 = Bench.historicalMinima("sf0.01", dir)
    assert(at001 == Map("q_x" -> 0.5))
  }

  test("historicalMinima merges the self-maintained minima file") {
    val dir = Files.createTempDirectory("benchhist2").toFile
    Files.writeString(new java.io.File(dir, "BENCH_r98.json").toPath,
      """{"tail":"{\"queries\":{\"q_x\":5.0,\"q_y\":2.0},\"sf\":\"/t/sf0.1\"}"}""")
    Files.writeString(new java.io.File(dir, "bench_minima_sf0.1.json").toPath,
      """{"q_x":1.0,"q_z":3.0}""")
    val got = Bench.historicalMinima("sf0.1", dir)
    assert(got == Map("q_x" -> 1.0, "q_y" -> 2.0, "q_z" -> 3.0))
  }

  test("the REAL driver artifacts in the repo parse to non-empty minima at sf0.1") {
    // regression canary: if the driver changes its artifact wrapping
    // again, this fails by name instead of the trigger silently disarming
    val repo = new java.io.File(".")
    val have = Option(repo.listFiles()).getOrElse(Array.empty)
      .exists(_.getName.matches("BENCH_r\\d+\\.json"))
    assume(have, "no driver artifacts present (fresh clone?)")
    val mins = Bench.historicalMinima("sf0.1", repo)
    assert(mins.nonEmpty, "driver artifacts matched zero query entries — wrapping changed again?")
    assert(mins.contains("q_graph_pagerank_big"),
      "pagerank_big missing from parsed cross-round minima")
    // r10's driver artifact alone carries 19.355; bench_out/minima pull it
    // to the demonstrated steady state — either way it must be a real time
    assert(mins("q_graph_pagerank_big") > 0 && mins("q_graph_pagerank_big") < 25)
  }
}
