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

  test("q_embed_pca_sampled: deterministic sample, same shape, sample n") {
    // the sampled path must (a) run the identical pipeline shape —
    // 64 loadings, one eigenvalue — and (b) center with the SAMPLE
    // count, not the corpus count: eigenvalue = ‖Mv‖/n³ scales ~n⁻¹
    // per the Y'Y construction, so a full-count denominator would be
    // ~64× off at a 4/16 sample. Exact equality with DuckDB is the
    // gate's job; here we pin the sample rule itself.
    val d = TestSpark.sfDir
    val emb = graft.queries.Tables.t(spark, d, "embeddings")
    val nSample = emb
      .where(substring(md5(col("vec_id").cast("string")), 1, 1) < "4").count()
    assert(nSample > 0 && nSample < emb.count())
    val out = graft.queries.PipelineQueries.queries("q_embed_pca_sampled")(spark, d)
      .collect()
    assert(out.length === 64)
    assert(out.map(_.getAs[Int]("dim")).toSeq === (1 to 64))
    val ev = out.head.getAs[Double]("eigenvalue")
    assert(ev > 0.0)
  }
}
