package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The r16 auto-sizing rules for the two measured fixed-knob scale
  * envelopes (r15 verdict items 1-2), pinned three ways: the integer
  * formula's values at the measured operating points, its equivalence
  * with the SQL form both oracles embed, and the production entries
  * reproducing their fixed siblings at fixture scale.
  */
class AutoKnobSpec extends SparkSpec {
  import spark.implicits._

  test("autoPlanesPerBand: measured operating points and clamp edges") {
    // fixture SFs (embeddings 500 / 500 / 2000) and sf1's 20 k all
    // land in the 8-plane clamp — the oracle-identity guarantee for
    // q_dedup_embed_auto at every gate SF
    for (n <- Seq(1L, 500L, 2000L, 20000L, 24576L))
      assert(Similarity.autoPlanesPerBand(n) === 8, s"n=$n")
    // first count past the clamp boundary grows the geometry
    assert(Similarity.autoPlanesPerBand(24577L) === 9)
    // sf10's 200 k picks the MEASURED scale knob (LshScaleProbe r15:
    // p=12 cuts 453M candidates to 45M and completes)
    assert(Similarity.autoPlanesPerBand(200000L) === 12)
    // upper clamp: past 96·2^16 the knob saturates loudly in scaladoc
    assert(Similarity.autoPlanesPerBand(96L * (1L << 16)) === 16)
    assert(Similarity.autoPlanesPerBand(Long.MaxValue / 4) === 16)
  }

  test("autoPlanesPerBand equals the SQL formula both engines embed") {
    // the oracle re-derives p as greatest(8, least(16,
    // length(bin((n-1) div 96)))) — the exact bit-length identity the
    // Scala rule uses; sweep counts across all clamp regions,
    // including the exact boundary n = 96·2^p
    val ns = Seq(1L, 95L, 96L, 97L, 500L, 2000L, 20000L, 24576L, 24577L,
      100000L, 196608L, 196609L, 200000L, 1000000L, 6291456L, 6291457L)
    val sql = ns.toDF("n").select(col("n"),
        greatest(lit(8), least(lit(16),
          length(expr("bin((n - 1) div 96)")))).cast("int").as("p"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (n <- ns)
      assert(sql(n) === Similarity.autoPlanesPerBand(n), s"n=$n")
  }

  test("autoCellCount: measured operating points, clamps, SQL identity") {
    for (n <- Seq(1L, 500L, 2000L, 4000L))
      assert(Similarity.autoCellCount(n) === 8, s"n=$n") // all fixture SFs
    assert(Similarity.autoCellCount(4001L) === 9)
    assert(Similarity.autoCellCount(20000L) === 40)   // sf1
    assert(Similarity.autoCellCount(200000L) === 400) // sf10
    assert(Similarity.autoCellCount(3000000L) === 4096) // broadcast cap
    val ns = Seq(1L, 500L, 4000L, 4001L, 20000L, 200000L, 2048000L, 3000000L)
    val sql = ns.toDF("n").select(col("n"),
        greatest(lit(8L), least(lit(4096L), expr("(n + 499) div 500")))
          .cast("int").as("k"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (n <- ns) assert(sql(n) === Similarity.autoCellCount(n), s"n=$n")
  }

  test("q_dedup_embed_auto reproduces the fixed entry at fixture scale") {
    // the gate pins the fixed 4×8 geometry as q_dedup_embed's oracle
    // semantics; the auto rule must pick exactly that geometry at
    // fixture corpus sizes, so the production path changes NOTHING a
    // fixture-scale user sees (r15 verdict item 1's "spec-pinned")
    val d = TestSpark.sfDir
    val fixed = graft.queries.PipelineQueries.queries("q_dedup_embed")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val auto = graft.queries.PipelineQueries.queries("q_dedup_embed_auto")(spark, d)
      .collect()
    assert(auto.nonEmpty)
    assert(auto.forall(_.getAs[Int]("planes") === 8))
    val autoPairs = auto.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(autoPairs === fixed)
  }

  test("q_dedup_semantic_auto reproduces the fixed entry at fixture scale") {
    val d = TestSpark.sfDir
    val fixed = graft.queries.PipelineQueries.queries("q_dedup_semantic")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val auto = graft.queries.PipelineQueries.queries("q_dedup_semantic_auto")(spark, d)
      .collect()
    assert(auto.nonEmpty)
    assert(auto.forall(_.getAs[Int]("cells") === 8))
    val autoRows = auto.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(autoRows === fixed)
  }

  test("autoSampleModulus: measured operating points and SQL identity") {
    // fixture SFs (500 / 500 / 2000) all land at m = 1 — the sampled
    // path REPRODUCES the full path there (oracle-identity); sf1's
    // 20 k picks m = 2 (~10 k sample, under the measured 20 k-fits /
    // 50 k-refuses decimal envelope); sf10's 200 k picks m = 16
    // (~12.5 k sample — the 4/16 fixed RATE this rule replaced gave a
    // 50 k sample there, which re-overflowed Decimal(24,12), measured)
    for (n <- Seq(1L, 500L, 2000L, 12500L))
      assert(Similarity.autoSampleModulus(n) === 1L, s"n=$n")
    assert(Similarity.autoSampleModulus(12501L) === 2L)
    assert(Similarity.autoSampleModulus(20000L) === 2L)  // sf1
    assert(Similarity.autoSampleModulus(200000L) === 16L) // sf10
    assert(Similarity.autoSampleModulus(2000000L) === 160L)
    val ns = Seq(1L, 500L, 2000L, 12500L, 12501L, 20000L, 200000L, 2000000L)
    val sql = ns.toDF("n").select(col("n"),
        greatest(lit(1L), expr("(n + 12499) div 12500")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (n <- ns) assert(sql(n) === Similarity.autoSampleModulus(n), s"n=$n")
  }

  test("autoBloomBits: power-of-two sizing, clamps, SQL identity") {
    // smallest power of two >= 16n, clamped [2^14, 2^24]: fixture
    // corpora land on the floor; 47k keys (the measured fixed-m
    // saturation point) get 2^20; the 24-bit slice-width cap holds
    import graft.operators.Dedup
    for (n <- Seq(1L, 469L, 1024L))
      assert(Dedup.autoBloomBits(n) === 16384L, s"n=$n")
    assert(Dedup.autoBloomBits(1025L) === 32768L)
    assert(Dedup.autoBloomBits(46875L) === 1048576L) // sf0.1 corpus
    assert(Dedup.autoBloomBits(2048L) === 32768L)    // exact 16n power of two
    assert(Dedup.autoBloomBits(100000000L) === (1L << 24)) // width cap
    val ns = Seq(1L, 469L, 1024L, 1025L, 2048L, 46875L, 468750L, 100000000L)
    val sql = ns.toDF("n").select(col("n"),
        greatest(lit(16384L), least(lit(16777216L),
          expr("shiftleft(1L, length(bin(16 * n - 1)))"))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (n <- ns) assert(sql(n) === Dedup.autoBloomBits(n), s"n=$n")
  }

  test("q_dedup_bloom: no false negatives, census adds up") {
    val d = TestSpark.sfDir
    val row = graft.queries.PipelineQueries.queries("q_dedup_bloom")(spark, d)
      .collect().head
    val nArr = row.getAs[Long]("n_arrivals")
    val flagged = row.getAs[Long]("n_flagged")
    val trueDup = row.getAs[Long]("n_true_dup")
    val fp = row.getAs[Long]("n_false_pos")
    assert(nArr > 0)
    // a Bloom filter NEVER misses a present key: every true digest-dup
    // has all its positions set by its corpus twin
    assert(flagged >= trueDup)
    assert(flagged === trueDup + fp)
    assert(row.getAs[Long]("m_bits") === 16384L) // fixture floor clamp
  }

  test("autoTwoLevelFanout: operating points, clamps, SQL identity") {
    // fixture SFs (500 / 500 / 2000) and everything to n = 8000 land
    // on the 16-leaf floor — k1 = 4, the fixed sibling's geometry
    // (oracle-identity at every gate SF); sf1's 20 k picks 8, sf10's
    // 200 k picks 32 (1024 leaves, ~195 vectors each); the 2^24-leaf
    // cap bounds each level at 4096 — the flat family's broadcast cap
    // applied per level
    for (n <- Seq(1L, 500L, 2000L, 8000L))
      assert(Similarity.autoTwoLevelFanout(n) === 4, s"n=$n")
    assert(Similarity.autoTwoLevelFanout(8001L) === 8)
    assert(Similarity.autoTwoLevelFanout(20000L) === 8)    // sf1
    assert(Similarity.autoTwoLevelFanout(200000L) === 32)  // sf10
    assert(Similarity.autoTwoLevelFanout(Long.MaxValue / 4) === 4096) // cap
    val ns = Seq(1L, 500L, 2000L, 8000L, 8001L, 20000L, 200000L,
      2000000L, 8388608000L, Long.MaxValue / 4)
    val sql = ns.toDF("n").select(col("n"),
        expr("shiftleft(1, (length(bin(greatest(16L, least(16777216L, " +
          "(n + 499) div 500)) - 1)) + 1) div 2)").cast("int").as("k1"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (n <- ns) assert(sql(n) === Similarity.autoTwoLevelFanout(n), s"n=$n")
  }

  test("q_embed_ivf_2level_auto reproduces the fixed entry at fixture scale") {
    // the auto rule picks k1 = 4 at fixture corpus sizes, so the
    // production path is the fixed 4×4 entry plus the k1 column —
    // pinned row-for-row (the q_dedup_embed_auto convention)
    val d = TestSpark.sfDir
    val fixed = graft.queries.PipelineQueries.queries("q_embed_ivf_2level")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val auto = graft.queries.PipelineQueries.queries("q_embed_ivf_2level_auto")(spark, d)
      .collect()
    assert(auto.nonEmpty)
    assert(auto.forall(_.getAs[Int]("k1") === 4))
    val autoRows = auto.map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(autoRows === fixed)
  }

  test("q_ivm_join: four-term maintenance equals the direct recompute") {
    // the algebraic identity the gate oracle asserts cross-engine,
    // pinned engine-side too: maintained view == full recompute,
    // bit-for-bit (decimal sums are grouping-independent)
    val d = TestSpark.sfDir
    import org.apache.spark.sql.functions.{col => c}
    val o = graft.queries.Tables.t(spark, d, "orders")
    val li = graft.queries.Tables.t(spark, d, "lineitem")
    val direct = li.join(o, c("l_orderkey") === c("o_orderkey"))
      .groupBy(c("o_orderpriority"))
      .agg(sum((c("l_extendedprice") * (lit(1) - c("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val ivm = graft.queries.RelationalQueries.queries("q_ivm_join")(spark, d)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(ivm === direct)
  }

  test("q_embed_pca_sampled reproduces the full entry at fixture scale") {
    // m = 1 at fixture corpus sizes, so the sampled path is the FULL
    // path plus the modulus column — pinned bit-for-bit (the
    // q_dedup_embed_auto convention). The sampled path must also
    // center with the SAMPLE count, not the corpus count: eigenvalue
    // = ‖Mv‖/n³ scales ~n⁻¹ per the Y'Y construction, so a full-count
    // denominator would be ~m³ off once m > 1. Exact equality with
    // DuckDB is the gate's job; here we pin the fixture identity.
    val d = TestSpark.sfDir
    val full = graft.queries.PipelineQueries.queries("q_embed_pca")(spark, d)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    val out = graft.queries.PipelineQueries.queries("q_embed_pca_sampled")(spark, d)
      .collect()
    assert(out.length === 64)
    assert(out.forall(_.getAs[Int]("modulus") === 1))
    val sampled = out.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(sampled === full)
  }
}
