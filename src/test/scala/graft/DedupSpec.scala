package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // Hand-built corpus: 0/1 identical, 2 near-dup of 0 (one word changed),
  // 3 unrelated, 4 too short to shingle.
  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today", "en", "s1", 49L),
    (1L, "the quick brown fox jumps over the lazy dog today", "en", "s1", 49L),
    (2L, "the quick brown fox jumps over the lazy cat today", "en", "s1", 49L),
    (3L, "completely different words appear in this one document here", "en", "s1", 59L),
    (4L, "tiny doc", "en", "s1", 8L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("simhashHammingPairs: band-LSH finds EXACTLY the all-pairs hamming ball") {
    val corpus = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents")
    val viaLsh = Dedup.simhashHammingPairs(corpus, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sig = Dedup.simhashWidePerDoc(corpus).localCheckpoint(true)
    val allPairs = sig.as("a").join(sig.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("int").as("dist"))
      .where(col("dist") <= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaLsh === allPairs, "pigeonhole: 4 bands must be complete for dist <= 3")
    assert(viaLsh.nonEmpty, "fixture corpus should contain at least one near-dup pair")
    // identical docs 0/1 in the hand corpus sit at distance 0
    val hand = Dedup.simhashHammingPairs(docs, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(hand.contains((0L, 1L, 0)))
  }

  test("minhashPairsBetween: batch×corpus pairs only, consistent with symmetric pairs") {
    val sig = Dedup.minhashSignatures(docs).localCheckpoint(true)
    val batch = sig.where(col("doc_id") === 0)      // "arriving" doc 0
    val corpus = sig.where(col("doc_id") =!= 0)
    val got = Dedup.minhashPairsBetween(batch, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every pair crosses the boundary: new side always doc 0
    assert(got.nonEmpty && got.forall(_._1 == 0L))
    // doc 1 is an identical copy of doc 0 -> est 1.0 must survive
    assert(got.exists(p => p._2 == 1L && p._3 == 1.0))
    // asymmetric result == symmetric pairs restricted to the boundary
    val sym = Dedup.minhashPairs(docs, sigOpt = Some(sig)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => p._1 == 0L || p._2 == 0L)
      .map(p => if (p._1 == 0L) p else (p._2, p._1, p._3)).toSet
    assert(got.toSet == sym)
  }

  test("exact dedup groups identical texts") {
    val groups = Dedup.exact(docs).collect()
    assert(groups.length === 4) // 0/1 collapse
    val dup = groups.find(_.getAs[Long]("cnt") == 2L).get
    assert(dup.getAs[Long]("keeper") === 0L)
  }

  test("minhash signatures: identical texts get identical sigs; short docs absent") {
    val sigs = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](r.fieldIndex("sig")).toList).toMap
    assert(sigs.keySet === Set(0L, 1L, 2L, 3L)) // doc 4 has <3 tokens
    assert(sigs(0L) === sigs(1L))
    assert(sigs(0L) !== sigs(3L))
    assert(sigs(0L).length === 16)
  }

  test("minhash LSH pairs: finds the dup and the near-dup, not the unrelated") {
    val pairs = Dedup.minhashPairs(docs, minEst = 0.25).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("est")))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 === 1.0)
    assert(!keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash: identical docs share a bucket; hamming-close for near-dups") {
    val rows = Dedup.simhashBuckets(docs).collect()
    val bucketOf = rows.flatMap { r =>
      val h = r.getAs[Long]("simhash")
      Seq.fill(r.getAs[Long]("cnt").toInt)(h)
    }
    assert(rows.map(_.getAs[Long]("cnt")).sum === 5)
    val dupBucket = rows.find(_.getAs[Long]("cnt") >= 2)
    assert(dupBucket.isDefined && dupBucket.get.getAs[Long]("keeper") === 0L)
  }

  test("minhash estimate tracks exact ngram jaccard on a graded near-dup corpus") {
    import spark.implicits._
    // doc_i replaces the last i words of a 40-word base text: jaccard
    // degrades in known steps
    val base = (1 to 40).map(i => s"w$i")
    val graded = (0 to 6).map { i =>
      val words = base.dropRight(i * 3) ++ (1 to i * 3).map(j => s"x${i}_$j")
      (i.toLong, words.mkString(" "), "en", "s", words.mkString(" ").length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val exact = Dedup.ngramJaccardPairs(graded, minJac = 0.0).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jac")).toMap
    val est = Dedup.minhashPairs(graded, minEst = 0.0).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("est")).toMap
    // every LSH candidate's estimate is within MinHash(16) sampling error
    // of the exact jaccard of the same pair
    est.foreach { case (pair, e) =>
      val j = exact.getOrElse(pair, 0.0)
      assert(math.abs(e - j) <= 0.35, s"pair $pair: est $e vs exact $j")
    }
    // adjacent grades (high true jaccard) must be found as candidates
    assert(est.contains((0L, 1L)) && exact((0L, 1L)) > 0.6)
  }

  test("ngram jaccard: dup pair scores 1.0, near-dup scores high, unrelated absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, minJac = 0.15).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jac")).toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs((0L, 2L)) > 0.4 && pairs((0L, 2L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  // ---- mega-bucket guards (adversarial: every doc identical, so every
  // band bucket holds the WHOLE corpus — unguarded, the band self-join
  // is a full n² cross product) -----------------------------------------

  lazy val constantCorpus = (0L until 400L).map(i =>
    (i, "the quick brown fox jumps over the lazy dog every single day", "en", "s1", 61L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("minhash band self-join stays bounded on an all-identical corpus") {
    val cap = 40
    val n = 400L
    val got = Dedup.minhashBandCandidates(constantCorpus, k = 16, bands = 4,
      maxBucket = cap).count()
    // bound: per band, ceil(n/cap) sub-buckets of ~cap members each →
    // ≤ n·cap/2 pairs per band (vs n(n-1)/2 ≈ 79.8k unguarded); bands
    // overlap after distinct, so the union is ≤ bands · n · cap / 2
    val bound = 4L * n * cap / 2
    assert(got > 0, "guarded self-join must still emit intra-sub-bucket pairs")
    assert(got <= bound, s"guarded pairs $got exceed the O(n·cap) bound $bound")
    assert(got < n * (n - 1) / 2, s"guard did not engage: $got = full cross product")
  }

  test("lshTruthPairs df cap: stopword-shingle corpus stays bounded, exclusion counted") {
    // adversarial truth corpus (r14 VERDICT item 3): every doc shares
    // an 8-word sentence, so its 3-gram shingles are corpus-ubiquitous
    // — unguarded, the sampled truth self-join is |sample|² on those
    // shingles. Two leading per-doc tokens sort BEFORE the common
    // words ('a0…' < 'c…'), keeping each doc's min shingle unique so
    // the 1/8 content-keyed sample stays per-doc uniform.
    val common = "common words that appear inside every single document"
    val stopCorpus = (0L until 600L).map(i =>
      (i, f"a$i%04d b$i%04d $common", "en", "s1", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val capped = graft.queries.PipelineQueries
      .lshTruthPairs(spark, stopCorpus, dfCap = 8)
    val cappedRows = capped.collect()
    val nCapped = capped.select(max("n_sh_capped")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.toString.toLong)).getOrElse(0L)
    val uncapped = graft.queries.PipelineQueries
      .lshTruthPairs(spark, stopCorpus, dfCap = Int.MaxValue)
    val nUncapped = uncapped.count()
    // ~75 sampled docs all pair through the shared shingles uncapped
    assert(nUncapped > 500,
      s"fixture not adversarial enough: uncapped truth join only $nUncapped pairs")
    assert(cappedRows.length < nUncapped / 10,
      s"df cap did not bound the join: ${cappedRows.length} vs uncapped $nUncapped")
    // the exclusion is REPORTED, not silent — when any pair survives;
    // with zero surviving pairs the empty table is itself the evidence
    if (cappedRows.nonEmpty)
      assert(nCapped > 0, "ubiquitous shingles excluded but n_sh_capped = 0")
  }

  test("lshTruthPairs df cap is a no-op on the organic fixture (capped == uncapped)") {
    val fixture = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_a", "doc_b", "decile")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val capped = graft.queries.PipelineQueries.lshTruthPairs(spark, fixture, dfCap = 256)
    assert(rows(capped) ===
      rows(graft.queries.PipelineQueries.lshTruthPairs(spark, fixture, dfCap = Int.MaxValue)))
    assert(capped.select(max("n_sh_capped")).head().getLong(0) === 0L,
      "organic fixture unexpectedly has a df>256 shingle — cap no longer a no-op")
  }

  test("default cap is a no-op on organic buckets (pairs identical with and without)") {
    val guarded = Dedup.minhashPairs(docs, k = 16, bands = 4, minEst = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val unguarded = Dedup.minhashPairs(docs, k = 16, bands = 4, minEst = 0.25,
      maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(guarded === unguarded)
  }

  test("batch×corpus salting is EXACT: same pairs with a tiny cap as with none") {
    // 40 identical corpus docs + 5 identical batch docs of the same
    // text: every batch doc must pair with every corpus doc, cap or no
    // cap — between-join salting is a skew guard, not a recall trade
    val corpus = (100L until 140L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog every single day", "en", "s1", 61L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch = (0L until 5L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog every single day", "en", "s1", 61L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val cSig = Dedup.minhashSignatures(corpus).localCheckpoint(true)
    val bSig = Dedup.minhashSignatures(batch).localCheckpoint(true)
    def run(cap: Int) = Dedup.minhashPairsBetween(bSig, cSig, prePinned = true,
        maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val tiny = run(8)
    assert(tiny === run(Int.MaxValue))
    assert(tiny.size === 5 * 40, s"expected every batch×corpus pair, got ${tiny.size}")
  }

  test("candOpt: a supplied candidate table yields identical pairs; mismatched banding fails fast") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "the quick brown fox jumps over the lazy cat today"),
      (4L, "completely different words about spark dataframes here"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs)
    val cand = Dedup.minhashBandCandidates(docs, sigOpt = Some(sig))
    def pairsOf(c: Option[org.apache.spark.sql.DataFrame]) =
      Dedup.minhashPairs(docs, minEst = 0.25, sigOpt = Some(sig), candOpt = c)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairsOf(Some(cand)) === pairsOf(None),
      "memoized-candidate path diverged from the inline path")
    // the metadata stamp must reject a candidate table built with
    // different banding (a silent mismatch changes recall, not results)
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashPairs(docs, bands = 2, sigOpt = None, candOpt = Some(cand)).collect()
    }
    assert(e.getMessage.contains("minhash_bands"))
  }

  test("corpusBandIndex: indexed batch×corpus pairs identical to the inline path; stamp enforced") {
    import spark.implicits._
    val docs = (0L until 60L).map { i =>
      val base = s"alpha beta gamma delta epsilon zeta eta theta token$i"
      (i, if (i % 3 == 0) base.replace(s"token$i", "token0") else base)
    }.toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs).localCheckpoint(true)
    val batch = sig.where($"doc_id" % 5 === 0)
    val corpus = sig.where($"doc_id" % 5 =!= 0)
    val idx = Dedup.corpusBandIndex(corpus)
    def run(i: Option[org.apache.spark.sql.DataFrame]) =
      Dedup.minhashPairsBetween(batch, corpus, prePinned = true, corpusIndexOpt = i)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaIdx = run(Some(idx))
    assert(viaIdx === run(None), "index path diverged from inline path")
    assert(viaIdx.nonEmpty, "fixture should produce at least one cross pair")
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashPairsBetween(batch, corpus, bands = 2, prePinned = true,
        corpusIndexOpt = Some(idx)).collect()
    }
    assert(e.getMessage.contains("minhash_bands"))
  }

  test("boilerplate profile: coverage bounded, every doc reported, frequent shingle flagged") {
    import spark.implicits._
    // doc 1/2/3 share the same 5-token template (every 3-gram df=3);
    // doc 4 is unique text; doc 5 too short to shingle
    val docs = Seq(
      (1L, "click here to read more"),
      (2L, "click here to read more"),
      (3L, "click here to read more"),
      (4L, "entirely novel words appear once"),
      (5L, "hi")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateProfile(docs, shingleN = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), "every doc must report a row")
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) == ((3L, 3L, 1.0, 1)), s"template doc $id: ${got(id)}")
    }
    assert(got(4L) == ((3L, 0L, 0.0, 0)), s"unique doc: ${got(4L)}")
    assert(got(5L) == ((0L, 0L, 0.0, 0)), s"short doc: ${got(5L)}")
    // raising minDocs beyond the corpus degrades to all-zero boilerplate
    val none = Dedup.boilerplateProfile(docs, shingleN = 3, minDocs = 99)
      .collect()
    assert(none.forall(_.getLong(2) == 0L))
  }
}
