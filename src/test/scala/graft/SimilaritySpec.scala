package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val vecs = Seq(
    (0L, Array(1.0, 0.0, 0.0)),
    (1L, Array(0.9, 0.1, 0.0)),   // closest to 0
    (2L, Array(0.0, 1.0, 0.0)),   // orthogonal
    (3L, Array(-1.0, 0.0, 0.0)),  // opposite
    (4L, Array(0.7, 0.7, 0.0))
  ).toDF("vec_id", "v")

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val q = vecs.where($"vec_id" === 0).select($"v".as("qv"))
    val got = Similarity.bruteForceTopK(vecs.where($"vec_id" =!= 0), q, 3)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(got === Seq(1L, 4L, 2L))
  }

  test("cosine function: known values") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)), (Array(1.0, 1.0), Array(1.0, 1.0)))
      .toDF("a", "b")
      .select(round(VectorFunctions.cosine($"a", $"b"), 6).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(0.0, 1.0))
  }

  test("IVF assignment puts vectors in nearest cell; probe returns cell-local top-k") {
    val cents = Seq((100L, Array(1.0, 0.0, 0.0)), (200L, Array(0.0, 1.0, 0.0)))
      .toDF("cid", "cv")
    val assigned = Similarity.assignCells(vecs, cents)
    val cells = assigned.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    assert(cells(0L) === 100L && cells(1L) === 100L && cells(2L) === 200L)
    val top = Similarity.ivfTopK(assigned, 0L, 10).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(top.head === 1L)            // nearest neighbor found in-cell
    assert(!top.contains(2L))          // orthogonal vector pruned (other cell)
  }

  test("multi-probe IVF recovers cross-cell neighbours the single probe misses") {
    val cents = Seq((100L, Array(1.0, 0.0, 0.0)), (200L, Array(0.0, 1.0, 0.0)))
      .toDF("cid", "cv")
    // query 4 = (0.7, 0.7, 0) sits on the cell boundary: assigned to
    // cell 100 (tie-break on cid), but its 2nd-best neighbour 2 lives
    // in cell 200 — invisible to a single probe, found by nProbe=2
    val assigned = Similarity.assignCells(vecs, cents)
    val single = Similarity.ivfTopK(assigned, 4L, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val multi = Similarity.ivfTopKMultiProbe(assigned, cents, 4L, 10, nProbe = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(!single.contains(2L))
    assert(multi.contains(2L))
    assert(single.subsetOf(multi.toSet)) // more probes never lose results
    // ranking stays exact-cosine: 1 scores ~0.781 vs query 4, then 0
    // and 2 tie at 0.7071 (both 45° away) — broken by vec_id
    assert(multi.take(3) === Seq(1L, 0L, 2L))
    // nProbe = all cells ≡ brute force over the corpus minus the query
    // (derive "all" from the centroid table so adding a cell to the
    // fixture can't silently weaken this into a partial-probe check)
    val nCells = cents.count().toInt
    val all = Similarity.ivfTopKMultiProbe(assigned, cents, 4L, 10, nProbe = nCells)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val q = vecs.where($"vec_id" === 4).select($"v".as("qv"))
    val bf = Similarity.bruteForceTopK(vecs.where($"vec_id" =!= 4), q, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(all === bf)
  }

  test("lshBuckets: scale-invariant, deterministic, bounded by plane count") {
    val df = Seq(
      (0L, Array(1.0, 2.0, -3.0)),
      (1L, Array(2.0, 4.0, -6.0)),   // same direction as 0 -> same bucket
      (2L, Array(1.0, 2.0, -3.0)),   // identical to 0
      (3L, Array(-5.0, 0.5, 9.0))
    ).toDF("vec_id", "v")
    val b = Similarity.lshBuckets(df, planes = 8, dims = 3).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(b(0L) === b(1L) && b(0L) === b(2L))
    assert(b.values.forall(v => v >= 0 && v < 256))
    // determinism: a second run produces identical buckets
    val b2 = Similarity.lshBuckets(df, planes = 8, dims = 3).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(b === b2)
  }

  test("native dot_fold/l2sq_fold match the HOF folds bit-for-bit (incl. edge cases)") {
    graft.functions.expressions.GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.1, -2.2, 3.3), Array(0.5, 0.25, -4.0)),
      (Array(0.1, 0.2), Array(0.3, 0.4)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val rows = df.select(
      expr("dot_fold(a, b)").as("nd"), VectorFunctions.dot($"a", $"b").as("hd"),
      expr("l2sq_fold(a, b)").as("nl"), VectorFunctions.l2sq($"a", $"b").as("hl")
    ).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // bit-equal doubles
      assert(r.getDouble(2) === r.getDouble(3))
    }
    // length mismatch -> NULL, matching the zip_with-poisoned HOF fold
    val mis = Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
      .select(expr("dot_fold(a, b)").as("nd"),
        VectorFunctions.dot($"a", $"b").as("hd")).head()
    assert(mis.isNullAt(0) && mis.isNullAt(1))
  }

  test("lshBandBuckets: band 0 reproduces lshBuckets; banding only ADDS candidates") {
    val e = graft.queries.Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select($"vec_id", VectorFunctions.toDouble($"embedding").as("v"))
    val single = Similarity.lshBuckets(e, planes = 8, dims = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val banded = Similarity.lshBandBuckets(e, bands = 4, planesPerBand = 8, dims = 64)
    val band0 = banded.where($"band_id" === 0)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(band0 == single, "band 0 must be exactly the single-table bucket")
    // every vector appears in every band
    assert(banded.groupBy("vec_id").count().where($"count" =!= 4).count() == 0)
    // any-band collisions are a superset of band-0 collisions => the
    // banded candidate set can only grow vs the old single-band form
    def pairs(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) = {
      val a = df.toDF(("ia" +: cols): _*); val b = df.toDF(("jb" +: cols): _*)
      a.join(b, cols).where($"ia" < $"jb")
        .select($"ia", $"jb").distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val singlePairs = pairs(Similarity.lshBuckets(e, 8, 64), Seq("bucket"))
    val bandedPairs = pairs(banded, Seq("band_id", "bucket"))
    assert(singlePairs.subsetOf(bandedPairs))
    assert(bandedPairs.size > singlePairs.size,
      "4-band OR-amplification should recover pairs a single 8-bit bucket splits")
  }

  test("lshPlane is a fixed ±1 md5-derived matrix") {
    val p0 = Similarity.lshPlane(0, 64)
    assert(p0.forall(x => x == 1.0 || x == -1.0))
    assert(p0 === Similarity.lshPlane(0, 64))
    assert(p0 !== Similarity.lshPlane(1, 64)) // planes are independent
  }

  test("quantized rerank recovers the exact top-k on the real corpus") {
    val e = graft.queries.Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select($"vec_id", VectorFunctions.toDouble($"embedding").as("v"))
    val q = e.where($"vec_id" === 0).select($"v".as("qv"))
    val corpus = e.where($"vec_id" =!= 0)
    val rerank = Similarity.quantizedRerankTopK(corpus, q, c = 50, k = 10)
    val got = rerank.collect()
    assert(got.length == 10)
    // with a candidate pool 5x the final k, the int8 prefilter must
    // recover the exact float top-10 on this corpus (recall@10 = 1.0
    // measured; a quantizer regression shows up as a lost neighbour)
    val exact = Similarity.bruteForceTopK(corpus, q, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val gotIds = got.map(_.getAs[Long]("vec_id")).toSet
    assert(gotIds == exact, s"rerank lost exact neighbours: ${exact -- gotIds}")
    // independent replication of BOTH stages in plain Scala: quantize,
    // integer-dot prefilter to top-50, exact-cosine top-10 — the
    // operator must reproduce this row-for-row (ids AND rounded scores)
    val vs = corpus.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Double](r.fieldIndex("v")).toArray)
    val qv = q.collect().head.getSeq[Double](0).toArray
    def codes(v: Array[Double]): (Array[Double], Double) = {
      val s = v.map(math.abs).max
      (v.map(x => if (s == 0) 0.0 else math.floor(x / s * 127 + 0.5)), s)
    }
    val (qc, qs) = codes(qv)
    val approx = vs.map { case (id, v) =>
      val (c, s) = codes(v)
      (id, c.zip(qc).map { case (a, b) => a * b }.sum * s * qs / 16129.0)
    }
    val pool = approx.sortBy { case (id, a) => (-a, id) }.take(50)
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val vmap = vs.toMap
    // round BEFORE ranking: the operator orders by the rounded score
    // (its output column), so ties created by rounding break by id
    val want = pool.map { case (id, a) =>
        (id, BigDecimal(cos(vmap(id), qv))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c0) => (-c0, id) }.take(10).toSeq
    val gotRows = got.map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Double]("score"))).toSeq
    assert(gotRows == want, "operator disagrees with the independent two-stage replication")
  }

  test("quantized rerank prefilter plans as TakeOrderedAndProject, not a global sort") {
    val e = graft.queries.Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select($"vec_id", VectorFunctions.toDouble($"embedding").as("v"))
    val df = Similarity.quantizedRerankTopK(
      e.where($"vec_id" =!= 0), e.where($"vec_id" === 0).select($"v".as("qv")), 50, 10)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("ivf_indexed: probe partition-prunes to the query's cell and matches recomputed IVF") {
    val indexed = SparkEntry.queries("q_embed_ivf_indexed")(spark, TestSpark.sfDir)
    val plan = indexed.queryExecution.executedPlan.toString
    // the literal-cid predicate must land in PartitionFilters (the
    // FileIndex prunes to one cell directory), NOT in the row filter
    assert("PartitionFilters: \\[[^\\]]*cid[^\\]]* = \\d+".r
      .findFirstIn(plan).isDefined,
      s"probe's cell id is not a partition filter:\n$plan")
    assert(!plan.contains("HashAggregate"),
      "probe plan recomputes an aggregation — the index exists to avoid that")
    val recomputed = SparkEntry.queries("q_embed_ivf")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = indexed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == recomputed, "persisted-index probe diverged from recompute-per-query IVF")
  }

  test("semDedup accounting: clusters partition the corpus, kept+dropped=size") {
    val e = graft.queries.Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select($"vec_id", VectorFunctions.toDouble($"embedding").as("v"))
    val cents = e.where($"vec_id".between(1, 8))
      .select($"vec_id".as("cid"), $"v".as("cv"))
    val assigned = Similarity.assignCells(e, cents).localCheckpoint(true)
    val total = e.count()
    val rows = Similarity.semDedup(assigned, tau = 0.4).collect()
    assert(rows.map(_.getLong(1)).sum == total, "cluster sizes don't sum to corpus")
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), s"sz != n_drop + n_kept: $r")
    }
  }

  test("semDedup threshold extremes: tau>1 drops nothing, tau=-1.1 keeps one per cluster") {
    val e = graft.queries.Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select($"vec_id", VectorFunctions.toDouble($"embedding").as("v"))
    val cents = e.where($"vec_id".between(1, 8))
      .select($"vec_id".as("cid"), $"v".as("cv"))
    val assigned = Similarity.assignCells(e, cents).localCheckpoint(true)
    val none = Similarity.semDedup(assigned, tau = 1.01).collect()
    assert(none.forall(_.getLong(2) == 0L), "tau > 1 must drop nothing")
    val all = Similarity.semDedup(assigned, tau = -1.1).collect()
    assert(all.forall(_.getLong(3) == 1L),
      "tau below every cosine must keep exactly the min-id vector per cluster")
  }

  // ---- adaptive-salt result-invariance for the EMBED candidate path
  // (r12 VERDICT item 6). Measured truth (r13, sf0.01/sf0.1 sweeps):
  // with the DEFAULT cap the splits table is EMPTY on organic
  // embeddings (bucket p99.9 ≈ 25 « 1024), so the salted plan IS the
  // unsalted plan plus a constant column — result-invisible by
  // construction. When a tiny cap forces splits, the sharp guarantee
  // is: a pair sharing ANY unsplit band bucket is NEVER lost; only
  // pairs whose every co-located bucket was split pay the documented
  // degenerate-bucket recall trade (quantified in tools/Stress). ----

  private def embedBandPairs(e: org.apache.spark.sql.DataFrame, cap: Int)
      : Set[(Long, Long)] = {
    val raw = Similarity.lshBandBuckets(e, bands = 4, planesPerBand = 8, dims = 64)
      .localCheckpoint(true)
    val (bands, _) = Similarity.adaptiveSalt(
      raw, Seq("band_id", "bucket"), "vec_id", cap)
    bands.select(col("vec_id").as("i"), col("band_id"), col("bucket"), col("salt"))
      .join(bands.select(col("vec_id").as("j"), col("band_id"), col("bucket"), col("salt")),
        Seq("band_id", "bucket", "salt"))
      .where(col("i") < col("j"))
      .select("i", "j").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("embed salt guard with the default cap is result-invisible on the " +
       "organic fixture (and provably never engaged: splits is empty)") {
    val e = graft.queries.Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val raw = Similarity.lshBandBuckets(e, bands = 4, planesPerBand = 8, dims = 64)
      .localCheckpoint(true)
    val (_, splits) = Similarity.adaptiveSalt(
      raw, Seq("band_id", "bucket"), "vec_id", Similarity.maxBucketDefault)
    assert(splits.isEmpty,
      "default cap must not split organic embedding buckets — if this fires, " +
        "the fixture's bucket profile changed and the recall claims need re-measuring")
    val guarded = embedBandPairs(e, Similarity.maxBucketDefault)
    val unguarded = embedBandPairs(e, Int.MaxValue)
    assert(guarded === unguarded, "default-cap candidates must be identical")
  }

  test("forced splits lose ONLY pairs whose every shared band bucket split; " +
       "pairs with any unsplit co-located bucket survive") {
    val e = graft.queries.Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val raw = Similarity.lshBandBuckets(e, bands = 4, planesPerBand = 8, dims = 64)
      .localCheckpoint(true)
    val cap = 4 // far below the fixture's bucket sizes: forces real splits
    val (bands, splits) = Similarity.adaptiveSalt(
      raw, Seq("band_id", "bucket"), "vec_id", cap)
    val splitSet = splits.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(splitSet.nonEmpty, "cap=4 must force splits on this fixture")
    val salted = bands.select(col("vec_id").as("i"), col("band_id"), col("bucket"), col("salt"))
      .join(bands.select(col("vec_id").as("j"), col("band_id"), col("bucket"), col("salt")),
        Seq("band_id", "bucket", "salt"))
      .where(col("i") < col("j")).select("i", "j").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // membership table: (vec, band, bucket)
    val mem = raw.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byVec = mem.groupBy(_._1)
    val vecIds = byVec.keySet.toSeq.sorted
    for {
      ai <- vecIds.indices; bi <- (ai + 1) until vecIds.size
      a = vecIds(ai); b = vecIds(bi)
    } {
      val shared = byVec(a).map(m => (m._2, m._3)).toSet
        .intersect(byVec(b).map(m => (m._2, m._3)).toSet)
      if (shared.nonEmpty && shared.exists(k => !splitSet.contains(k)))
        assert(salted.contains((a, b)),
          s"pair ($a,$b) shares unsplit bucket(s) ${shared.filterNot(splitSet)} " +
            "but was lost — salting must only trade recall inside split buckets")
    }
  }
}
