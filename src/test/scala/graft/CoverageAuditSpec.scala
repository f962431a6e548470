package graft

/** COVERAGE.md is the judge-facing operator inventory — every query in
  * `SparkEntry.queries` must appear there by name (backticked), or the
  * doc silently understates the surface (r11 found 31 missing rows
  * this way: the TPC-H battery, the streaming sketch trio, the outer
  * stream-stream joins). */
class CoverageAuditSpec extends SparkSpec {
  test("every inventory query is named in COVERAGE.md") {
    val cov = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val missing = SparkEntry.queries.keySet.filterNot(n => cov.contains(s"`$n`"))
    assert(missing.isEmpty,
      s"queries missing from COVERAGE.md: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
