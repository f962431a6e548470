package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for the training-data pipeline: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: everything is formulated as explode → codegen'd
  * hash-aggregate → key-equi-join. Higher-order-function folds are
  * deliberately avoided on the hot paths — Spark evaluates lambda
  * functions interpreted (no whole-stage codegen), and nesting them
  * re-evaluates the inner array per component; exploding shingles to
  * rows keeps every md5/min/sum inside WholeStageCodegen and turns the
  * signature computation into a single partial+final aggregation.
  * (Measured on sf0.1: 155 s as nested HOFs → ~4 s exploded.)
  * Candidate generation is LSH-band (or bucket) equi-join — never an
  * unbucketed O(n²) comparison — so the shuffle keys are band hashes
  * whose bucket sizes stay small, which survives a 100 TB corpus.
  *
  * The pair generators pin their signature/shingle tables (read
  * 3× within one returned plan) with an eager `localCheckpoint`
  * rather than `cache()`: checkpoint blocks are dropped by the
  * ContextCleaner once the plan becomes unreachable, whereas
  * per-invocation `cache()` entries live in the CacheManager forever
  * (round-2 bench logs showed the resulting "Asked to cache already
  * cached data" pile-up across gate runs). A self-join MUST pin one
  * side or the whole upstream executes once per side.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep min doc_id per group.
    * Output: (h, keeper, cnt). */
  def exact(docs: DataFrame, text: Column = col("text")): DataFrame =
    docs.groupBy(substring(md5(text), 1, 16).as("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("cnt"))

  /** Word n-gram shingles as ROWS — `(doc_id, g)`, one row per
    * shingle — via codegen'd posexplode + window `lead`, NOT the
    * column-level [[graft.functions.TextFunctions.wordShingles]]
    * array: Spark evaluates higher-order-function lambdas interpreted,
    * and the nested transform/concat_ws measured 12.6 s for 5 000 docs
    * at sf0.1 vs ~1 s for this formulation. Same strings, same
    * semantics; the window shuffle is by doc_id (bounded partitions). */
  def shingleRows(docs: DataFrame, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = docs.select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "tok")
    val parts = (0 until n).map(i =>
      if (i == 0) col("tok") else lead(col("tok"), i).over(w))
    toks
      .select(col("doc_id") +: parts.zipWithIndex.map { case (c, i) => c.as(s"t$i") }: _*)
      .where(col(s"t${n - 1}").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", (0 until n).map(i => col(s"t$i")): _*).as("g"))
  }

  /** Auto-sized Bloom-filter bit count from the corpus key count —
    * the ingest-side membership pre-filter's capacity knob
    * (q_dedup_bloom): m = the smallest power of two ≥ bitsPerKey·n,
    * clamped to [2¹⁴, 2²⁴]. At bitsPerKey = 16 with k = 3 probe
    * positions the fill rate stays ≈ 1 − e^(−3/16) ≈ 0.17 and the
    * false-positive rate ≈ 0.17³ ≈ 0.5% at ANY corpus size — a FIXED
    * m saturates instead (measured shape: 47 k keys × 3 into 2¹⁴ bits
    * → fill 0.9998, FPR ≈ 100%, the filter does nothing). Power-of-
    * two so the modulo of the 24-bit md5 hex slices is unbiased; the
    * 2²⁴ cap is the slice WIDTH envelope (6 hex chars = 24 bits per
    * probe position — refusing the clamp loudly here would refuse
    * ~1 M-key corpora that still work at 16 bpk, so the cap holds and
    * the documented past-2²⁴ path is wider slices / more md5 calls,
    * like autoPlanesPerBand's targetBucket lever past 2¹⁶·96).
    * Integer-exact for the oracle: greatest(16384, least(16777216,
    * 1 << length(bin(bitsPerKey·n − 1)))). */
  def autoBloomBits(n: Long, bitsPerKey: Long = 16L,
                    minBits: Long = 1L << 14, maxBits: Long = 1L << 24): Long = {
    require(n > 0, s"corpus count must be positive, got $n")
    require(bitsPerKey > 0, s"bitsPerKey must be positive, got $bitsPerKey")
    val target = bitsPerKey * n
    val pow2 = java.lang.Long.highestOneBit(math.max(1L, target - 1)) << 1
    math.min(maxBits, math.max(minBits, pow2))
  }

  /** Per-doc MinHash signature: k components, component `s` = the
    * lexicographic min over word-3-gram shingles of an independent
    * 32-bit hash of the shingle (min of a uniform hash ⇒ classic
    * MinHash bound). The k hashes are derived from ceil(k/4) md5
    * calls, not k: one md5 is 32 hex chars = four independent 8-char
    * (32-bit) chunks, so component s reads chunk s%4 of
    * md5("(s/4)|" + shingle). md5 is the hot-path cost of the whole
    * dedup family — computing 4 digests per shingle instead of 16 cut
    * the sf0.1 signature stage measurably, and the 32-bit chunk
    * collision odds (~n_shingles/2^32 per component) are noise at
    * corpus scale. The bases are projected ONCE per shingle row before
    * the aggregate so codegen cannot re-evaluate them per component.
    * Docs with fewer than `n` tokens have no shingles and are absent.
    * Output: (doc_id, sig: array<string> of length k, 8-char hex
    * chunks). */
  def minhashSignatures(docs: DataFrame, k: Int = 16, shingleN: Int = 3): DataFrame = {
    val nBases = (k + 3) / 4
    val shr = shingleRows(docs, shingleN)
      .select(col("doc_id") +:
        (0 until nBases).map(b => md5(concat(lit(s"$b|"), col("g"))).as(s"m$b")): _*)
    val aggs = (0 until k).map(s =>
      min(substring(col(s"m${s / 4}"), (s % 4) * 8 + 1, 8)).as(s"c$s"))
    shr.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(s => col(s"c$s")): _*).as("sig", sigMetadata(k, shingleN)))
  }

  /** Schema metadata stamped on the `sig` column so a memoized
    * signature table built with one (k, shingleN) cannot be silently
    * reused by a caller expecting another — a mismatched k would skew
    * every `est` fraction rather than fail. */
  private def sigMetadata(k: Int, shingleN: Int) =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("minhash_k", k.toLong).putLong("minhash_shingle_n", shingleN.toLong).build()

  /** Fails fast when a caller-supplied signature table carries a
    * different (k, shingleN) than the caller expects. Tables without
    * the metadata stamp (hand-built) are accepted as-is — the contract
    * is only enforceable for tables produced by [[minhashSignatures]]. */
  private def requireSig(sig: DataFrame, k: Int, shingleN: Int): Unit = {
    val md = sig.schema("sig").metadata
    if (md.contains("minhash_k"))
      require(md.getLong("minhash_k") == k.toLong,
        s"signature table was built with k=${md.getLong("minhash_k")} but caller expects k=$k")
    if (md.contains("minhash_shingle_n"))
      require(md.getLong("minhash_shingle_n") == shingleN.toLong,
        s"signature table was built with shingleN=${md.getLong("minhash_shingle_n")} " +
          s"but caller expects shingleN=$shingleN")
  }

  /** THE band-key expression, shared by every MinHash pair generator
    * (symmetric, asymmetric, and the DuckDB `bands` CTE twin): explode
    * a signature table into (id, band_id, bkey) where bkey
    * concatenates the band's k/bands fixed-width 8-hex-char
    * components (fixed width ⇒ concatenation is unambiguous). ONE
    * definition so a keying change cannot desynchronize the paths. */
  private def bandRows(sig: DataFrame, k: Int, bands: Int,
                       idAs: String): DataFrame = {
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"bands ($bands) must divide k ($k); otherwise band keys degenerate " +
        "and candidate generation becomes an O(n^2) cross join")
    val rowsPerBand = k / bands
    sig.select(col("doc_id"), posexplode(
        array((0 until bands).map(b =>
          concat_ws("", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))).toIndexedSeq: _*)))
      .toDF(idAs, "band_id", "bkey")
  }

  /** Matching-component fraction of two k-component signatures — the
    * MinHash Jaccard estimate, shared by both pair scorers. */
  private def estColumn(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1.0).otherwise(0.0)),
      lit(0.0), (acc, x) => acc + x) / k.toDouble

  /** MinHash+LSH candidate pairs (no estimate filter): docs sharing
    * any signature band become candidates. This is THE scalable
    * candidate generator — bucket sizes track true near-dup density,
    * not corpus size, so downstream per-pair scoring (Jaccard
    * estimate, edit distance) stays off the cross product. Pass the
    * cached signature table via `sigOpt` to share it with estimate
    * scoring. Output: (doc_a, doc_b) distinct. */
  def minhashBandCandidates(docs: DataFrame, k: Int = 16, bands: Int = 4,
                            sigOpt: Option[DataFrame] = None,
                            shingleN: Int = 3,
                            maxBucket: Int = Similarity.maxBucketDefault): DataFrame = {
    sigOpt.foreach(requireSig(_, k, shingleN))
    val sig = sigOpt.getOrElse(
      minhashSignatures(docs, k, shingleN).localCheckpoint(true))
    // ADAPTIVE mega-bucket guard (see Similarity.adaptiveSalt): a
    // degenerate bucket — every doc identical — would otherwise
    // cross-join with itself O(n²); salting bounds it at
    // O(n × maxBucket) per band, and the salt join is only paid when
    // splitCounts actually finds an oversized bucket
    val raw = bandRows(sig, k, bands, "doc_id")
    val (bandDf, _) =
      Similarity.adaptiveSalt(raw, Seq("band_id", "bkey"), "doc_id", maxBucket)
    bandDf.as("a").join(bandDf.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bkey") === col("b.bkey") &&
          col("a.salt") === col("b.salt") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a", candMetadata(k, bands, shingleN)),
        col("b.doc_id").as("doc_b")).distinct()
  }

  /** Stamp on `doc_a` of a [[minhashBandCandidates]] table, mirroring
    * [[sigMetadata]]: a memoized/persisted candidate table built with
    * one (k, bands, shingleN) must not be silently reused by a caller
    * expecting another — mismatched banding changes the candidate SET,
    * which skews recall rather than failing. */
  private def candMetadata(k: Int, bands: Int, shingleN: Int) =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("minhash_k", k.toLong).putLong("minhash_bands", bands.toLong)
      .putLong("minhash_shingle_n", shingleN.toLong).build()

  /** [[requireSig]]'s twin for banded artifacts (candidate tables,
    * corpus band indexes): enforceable only for tables produced by the
    * stamping builders (others lack the stamp and are accepted
    * as-is). */
  private def requireStamp(df: DataFrame, colName: String,
                           k: Int, bands: Int, shingleN: Int): Unit = {
    val md = df.schema(colName).metadata
    Seq(("minhash_k", k), ("minhash_bands", bands), ("minhash_shingle_n", shingleN))
      .foreach { case (key, want) =>
        if (md.contains(key))
          require(md.getLong(key) == want.toLong,
            s"banded table was built with $key=${md.getLong(key)} " +
              s"but caller expects $key=$want")
      }
  }

  private def requireCand(cand: DataFrame, k: Int, bands: Int, shingleN: Int): Unit =
    requireStamp(cand, "doc_a", k, bands, shingleN)

  /** Incremental-ingest dedup: near-dup pairs BETWEEN a new batch and
    * an existing corpus — never corpus×corpus. This is the production
    * arrival shape: the corpus signature table is computed once (and
    * persisted / memoized), and each arriving batch band-joins against
    * it, so ingest cost tracks the BATCH size while the corpus is
    * touched only through its (narrow) signature bands. Inputs are
    * signature TABLES from [[minhashSignatures]] (doc_id, sig);
    * metadata-stamped tables are validated against (k, shingleN).
    * Output: (new_id, corpus_id, est) for est >= minEst.
    *
    * `prePinned`: each side is read twice (band explode + estimate
    * join), so by default both are localCheckpointed here per the
    * file-header self-join rule. Callers passing slices of an
    * ALREADY-pinned table (the session memo, a persisted production
    * signature store) pass `prePinned = true` to skip the redundant
    * re-materialization. */
  /** Salted corpus band index — THE persistable corpus-side artifact
    * of incremental dedup: `(band_id, bkey, salt, corpus_id, nsplit)`
    * with `nsplit` non-null only for oversized (salted) buckets. A
    * production pipeline computes this once per corpus generation
    * (right next to the signature table) and every arriving batch
    * probes it through [[minhashPairsBetween]]'s `corpusIndexOpt`,
    * skipping the per-arrival band explode + bucket-count agg + salt
    * join. Salt assignment comes from the ONE [[Similarity
    * .saltMembers]] definition (nsplit re-joined after), so the index
    * and inline paths cannot drift. Stamped like candidate tables. */
  def corpusBandIndex(corpusSig: DataFrame, k: Int = 16, bands: Int = 4,
                      shingleN: Int = 3,
                      maxBucket: Int = Similarity.maxBucketDefault): DataFrame = {
    requireSig(corpusSig, k, shingleN)
    val cRaw = bandRows(corpusSig, k, bands, "corpus_id")
    val (salted, splits) =
      Similarity.adaptiveSalt(cRaw, Seq("band_id", "bkey"), "corpus_id", maxBucket)
    // build-time split census, stamped into the index metadata: the
    // probe path reads `has_splits` from the schema instead of firing
    // a per-arrival splits-scan job — that eager isEmpty action (one
    // distinct over the whole index per ingest) was the measured
    // q_dedup_incremental floor drift (r14 verdict item 1). splits is
    // the pinned splitCounts table, so this isEmpty is a micro-job
    // paid ONCE per corpus generation, next to the index build itself.
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(candMetadata(k, bands, shingleN))
      .putBoolean("has_splits", !splits.isEmpty).build()
    salted
      .join(splits, Seq("band_id", "bkey"), "left_outer")
      .select(col("band_id"), col("bkey"), col("salt"),
        col("corpus_id").as("corpus_id", md),
        col("nsplit"))
  }

  def minhashPairsBetween(batchSig: DataFrame, corpusSig: DataFrame,
                          k: Int = 16, bands: Int = 4, minEst: Double = 0.25,
                          shingleN: Int = 3, prePinned: Boolean = false,
                          maxBucket: Int = Similarity.maxBucketDefault,
                          corpusIndexOpt: Option[DataFrame] = None): DataFrame = {
    requireSig(batchSig, k, shingleN); requireSig(corpusSig, k, shingleN)
    val bSig = if (prePinned) batchSig else batchSig.localCheckpoint(true)
    val cSig = if (prePinned) corpusSig else corpusSig.localCheckpoint(true)
    // skew guard: a degenerate corpus bucket (constant column) is
    // salted into ≤maxBucket sub-buckets and each batch row probes
    // every sub-bucket — per-join-key fan-in is bounded WITHOUT losing
    // pairs (this join's output is its semantics; only the symmetric
    // self-join may shed intra-bucket pairs). A caller-persisted
    // [[corpusBandIndex]] supplies the salted members + splits
    // pre-built; otherwise they are derived inline from cSig.
    // probe side mirrors the adaptive guard: with no oversized corpus
    // bucket there is nothing to replicate across, so the batch bands
    // take a constant salt 0 instead of the explode + splits join.
    // The split decision must cost ZERO per-arrival jobs on the
    // persisted-index path: an index from [[corpusBandIndex]] carries
    // its build-time census in the `has_splits` metadata stamp (an
    // un-stamped caller-built index pays one isEmpty scan — accepted,
    // it's outside the stamping builders' contract).
    val bRaw = bandRows(bSig, k, bands, "new_id")
    val (salted, probe) = corpusIndexOpt.map { idx =>
      requireStamp(idx, "corpus_id", k, bands, shingleN)
      val md = idx.schema("corpus_id").metadata
      val hasSplits =
        if (md.contains("has_splits")) md.getBoolean("has_splits")
        else !idx.where(col("nsplit").isNotNull).isEmpty
      val p =
        if (!hasSplits) bRaw.withColumn("salt", lit(0))
        else Similarity.probeAllSalts(bRaw,
          idx.where(col("nsplit").isNotNull)
            .select("band_id", "bkey", "nsplit").distinct(),
          Seq("band_id", "bkey"))
      (idx.drop("nsplit"), p)
    }.getOrElse {
      val cRaw = bandRows(cSig, k, bands, "corpus_id")
      val (s0, splits) =
        Similarity.adaptiveSalt(cRaw, Seq("band_id", "bkey"), "corpus_id", maxBucket)
      // splits is adaptiveSalt's pinned tiny table — this isEmpty is a
      // micro-job on an already-materialized checkpoint, not a scan
      val p =
        if (splits.isEmpty) bRaw.withColumn("salt", lit(0))
        else Similarity.probeAllSalts(bRaw, splits, Seq("band_id", "bkey"))
      (s0, p)
    }
    val cand = probe
      .join(salted, Seq("band_id", "bkey", "salt"))
      // a doc id present on BOTH sides (a re-ingested batch — routine
      // production retry) would band-join with itself and survive as a
      // bogus (x, x, 1.0) "near-dup"; the symmetric path's doc_a <
      // doc_b guard doesn't exist here, so exclude self-pairs
      .where(col("new_id") =!= col("corpus_id"))
      .select("new_id", "corpus_id").distinct()
    cand
      .join(bSig.select(col("doc_id").as("new_id"), col("sig").as("sig_a")), "new_id")
      .join(cSig.select(col("doc_id").as("corpus_id"), col("sig").as("sig_b")), "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        estColumn(col("sig_a"), col("sig_b"), k).as("est0"))
      .where(col("est0") >= minEst)
      .select(col("new_id"), col("corpus_id"), round(col("est0"), 4).as("est"))
  }

  /** MinHash+LSH near-dup candidate pairs with estimated Jaccard:
    * [[minhashBandCandidates]] scored by the fraction of matching
    * signature components. Output: (doc_a, doc_b, est) for
    * est >= minEst.
    *
    * `sigOpt`: a pre-computed (and pinned) signature table for `docs`
    * — the signature aggregation is the dominant cost of the whole
    * dedup family, and four gate queries score/cluster the SAME
    * corpus, so callers running several dedup variants should compute
    * it once (see PipelineQueries' session memo) and pass it here. */
  def minhashPairs(docs: DataFrame, k: Int = 16, bands: Int = 4,
                   minEst: Double = 0.25,
                   sigOpt: Option[DataFrame] = None,
                   shingleN: Int = 3,
                   maxBucket: Int = Similarity.maxBucketDefault,
                   candOpt: Option[DataFrame] = None): DataFrame = {
    sigOpt.foreach(requireSig(_, k, shingleN))
    val sig = sigOpt.getOrElse(
      minhashSignatures(docs, k, shingleN).localCheckpoint(true))
    // candOpt: a persisted/memoized candidate table (the production
    // pattern — compute the candidate graph once, rescore many times
    // with different thresholds); validated against (k, bands,
    // shingleN) via the metadata stamp, same contract as sigOpt
    val pairs = candOpt.map { c => requireCand(c, k, bands, shingleN); c }
      .getOrElse(minhashBandCandidates(docs, k, bands, Some(sig), shingleN, maxBucket))
    val sa = sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        estColumn(col("sig_a"), col("sig_b"), k).as("est0"))
      .where(col("est0") >= minEst)
      .select(col("doc_a"), col("doc_b"), round(col("est0"), 4).as("est"))
  }

  /** Per-doc 16-bit SimHash over distinct tokens (see
    * [[graft.functions.TextFunctions.simhash16]] for the per-row form;
    * this is the exploded codegen formulation of the same function).
    * Output: (doc_id, simhash: long). */
  def simhashPerDoc(docs: DataFrame): DataFrame = {
    val tk = docs.select(col("doc_id"),
      explode(array_distinct(tokens(col("text")))).as("tok"))
    val votes = (0 until 16).map(b =>
      sum(when(substring(md5(col("tok")), b + 1, 1) >= "8", 1).otherwise(-1)).as(s"s$b"))
    tk.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Exact-collision SimHash buckets. Output: (simhash, cnt, keeper). */
  def simhashBuckets(docs: DataFrame): DataFrame =
    simhashPerDoc(docs)
      .groupBy("simhash")
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))

  /** Per-doc WIDE (60-bit) SimHash for hamming-ball search: bit `s`
    * votes on hex char `s % 30` of md5("(s/30)|" + tok) — two digests
    * per token, projected once before the aggregate (the minhash
    * chunking trick). 60 bits, not 64, so every `1L << s` term and the
    * DuckDB BIGINT twin stay far from signed overflow. The 16-bit
    * [[simhashPerDoc]] is kept for exact-collision bucketing parity
    * with `TextFunctions.simhash16`. Output: (doc_id, simhash). */
  def simhashWidePerDoc(docs: DataFrame): DataFrame = {
    val tk = docs.select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
      .select(col("doc_id"),
        md5(concat(lit("0|"), col("tok"))).as("m0"),
        md5(concat(lit("1|"), col("tok"))).as("m1"))
    val votes = (0 until 60).map(s =>
      sum(when(substring(col(s"m${s / 30}"), s % 30 + 1, 1) >= "8", 1)
        .otherwise(-1)).as(s"s$s"))
    tk.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(s => when(col(s"s$s") > 0, lit(1L << s)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs within a hamming BALL, not just exact
    * collisions: band-LSH candidates rescored by popcount. The 60-bit
    * [[simhashWidePerDoc]] splits into 4 bands of 15 bits; by
    * pigeonhole, any pair with hamming distance <= 3 flips bits in at
    * most 3 bands and therefore collides on at least one — so the band
    * equi-join finds EVERY such pair (the all-pairs oracle is exactly
    * equivalent) while the 2^15-value band keys keep bucket sizes
    * tracking near-dup density, not corpus size (a narrow hash would
    * make this O(n²/buckets)). Rescoring is one codegen'd
    * `bit_count(xor)` per candidate. Output: (doc_a, doc_b, dist) for
    * dist <= maxDist. */
  def simhashHammingPairs(docs: DataFrame, maxDist: Int = 3,
                          sigOpt: Option[DataFrame] = None): DataFrame = {
    require(maxDist < 4,
      s"band-LSH over 4 bands only guarantees completeness for dist < 4")
    // the wide-signature aggregation (2 md5/token over the whole
    // corpus) dominates this operator; a production pipeline computes
    // it once and persists it, so callers can inject that table via
    // sigOpt (same contract as minhashPairs) — the default pins a
    // fresh one because the band self-join reads it twice
    val sig = sigOpt.getOrElse(simhashWidePerDoc(docs).localCheckpoint(true))
    simhashBandPairs(sig).where(col("dist") <= maxDist)
  }

  /** Band-LSH candidate pairs over a [[simhashWidePerDoc]] table —
    * pairs colliding on at least one of the 4 × 15-bit bands, with
    * their popcount hamming distance, NO ball threshold. This is the
    * candidate surface [[simhashHammingPairs]] filters. `probeEvery`
    * restricts the SMALLER-id side of each pair to every k-th doc —
    * the sampled-audit shape the accuracy readout uses: on a
    * clone-heavy corpus the unthresholded candidate set is quadratic
    * inside mega-buckets (3.47M pairs at sf0.1 on the 31-word
    * fixture), and a measurement doesn't need every pair, it needs an
    * unbiased deterministic sample probed against the FULL index.
    * `probeEvery = 1` keeps completeness (the dedup path's contract).
    * Output: (doc_a, doc_b, dist). */
  def simhashBandPairs(sig: DataFrame, probeEvery: Long = 1L): DataFrame = {
    val banded = sig.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 15).bitwiseAND(lit(0x7FFFL))): _*)))
      .toDF("doc_id", "simhash", "band_id", "bkey")
    val probes =
      if (probeEvery <= 1L) banded else banded.where(col("doc_id") % probeEvery === 0)
    probes.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(ha ^ hb)").cast("int").as("dist"))
  }

  /** Exact n-gram Jaccard between candidate pairs sharing a
    * (lang, source, length-band) bucket. Shingle SETS are materialised
    * once per doc (codegen'd [[shingleRows]] → `collect_list`), then
    * bucket pairs score with codegen'd `array_intersect`/`array_union`
    * — measured 2.5× faster at sf0.1 than the shingle-row self-join
    * (pair count is bucket-bounded, so per-pair array work beats
    * exploding the join on shingle keys). Output: (doc_a, doc_b, jac)
    * for jac >= minJac. */
  /** The bucketed shingle-set table [[ngramJaccardPairs]] self-joins:
    * one (doc_id, lang, source, length-band, shingle-set) row per doc.
    * Computed once and persisted in a production pipeline (the
    * shingle explode + set aggregation is the operator's dominant
    * cost) — callers inject it via `setsOpt`. */
  def ngramShingleSets(docs: DataFrame, shingleN: Int = 3): DataFrame =
    shingleRows(docs, shingleN).distinct()
      .groupBy("doc_id").agg(collect_list(col("g")).as("gs"))
      .join(docs.select(col("doc_id"), col("lang"), col("source"),
        floor(col("n_chars") / 100).as("band")), "doc_id")

  def ngramJaccardPairs(docs: DataFrame, shingleN: Int = 3,
                        minJac: Double = 0.15,
                        setsOpt: Option[DataFrame] = None): DataFrame = {
    // pin: the self-join below reads gs twice — unpinned, the whole
    // shingle explode + set aggregation would execute once per side
    val gs = setsOpt.getOrElse(ngramShingleSets(docs, shingleN).localCheckpoint(true))
    val a = gs.select(col("doc_id").as("doc_a"), col("lang"), col("source"),
      col("band"), col("gs").as("ga"))
    val b = gs.select(col("doc_id").as("doc_b"), col("lang"), col("source"),
      col("band"), col("gs").as("gb"))
    a.join(b, Seq("lang", "source", "band"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb"))).cast("double")).as("jac0"))
      .where(col("jac0") >= minJac)
      .select(col("doc_a"), col("doc_b"), round(col("jac0"), 4).as("jac"))
  }

  /** Asymmetric n-gram CONTAINMENT pairs: `c(A,B) = |A∩B| /
    * min(|A|,|B|)` — the near-superset detector that symmetric
    * Jaccard structurally under-scores (a doc pasted verbatim inside
    * a 10× larger one has jac ≤ 0.1 but containment 1.0; pretraining
    * pipelines dedup quote-expansions and boilerplate-wrapped copies
    * this way). Candidate generation and the pinned shingle-set table
    * are shared with [[ngramJaccardPairs]] — same blocking, same
    * scale shape, only the denominator differs. */
  def ngramContainmentPairs(docs: DataFrame, shingleN: Int = 3,
                            minCont: Double = 0.5,
                            setsOpt: Option[DataFrame] = None): DataFrame = {
    val gs = setsOpt.getOrElse(ngramShingleSets(docs, shingleN).localCheckpoint(true))
    val a = gs.select(col("doc_id").as("doc_a"), col("lang"), col("source"),
      col("band"), col("gs").as("ga"))
    val b = gs.select(col("doc_id").as("doc_b"), col("lang"), col("source"),
      col("band"), col("gs").as("gb"))
    a.join(b, Seq("lang", "source", "band"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
          least(size(col("ga")), size(col("gb"))).cast("double")).as("c0"))
      .where(col("c0") >= minCont)
      .select(col("doc_a"), col("doc_b"), round(col("c0"), 4).as("containment"))
  }

  /** Corpus-frequency boilerplate profile (the CCNet / RefinedWeb
    * "remove lines repeated across documents" pass, re-expressed on
    * word shingles since the fixture corpus is single-line): a
    * shingle is boilerplate when it occurs in >= `minDocs` DISTINCT
    * documents; each doc reports how much of it is boilerplate.
    * Output: (doc_id, n_sh, n_boiler, boiler_frac, flagged) — flagged
    * docs are the template-heavy ones a curation pass drops or strips.
    *
    * Scale shape: shingles explode to rows once; the document
    * frequency is ONE partial+final hash agg keyed by shingle; the
    * doc↔frequency attach is an equi-join on the shingle hash whose
    * key cardinality is the corpus vocabulary of n-grams — no window
    * over the corpus, no per-doc collect. At 100 TB the frequent-set
    * side (df >= minDocs, a tiny fraction by Zipf) can broadcast as a
    * semi-join; here it rides the same shuffle as the count. */
  def boilerplateProfile(docs: DataFrame, shingleN: Int = 3,
                         minDocs: Int = 3): DataFrame = {
    // pin: the shingle rows feed both the df-count side and the
    // per-doc attach (repo read-twice rule)
    val sh = shingleRows(docs, shingleN)
      .select(col("doc_id"), md5(col("g")).as("h")).localCheckpoint(true)
    val df_ = sh.select(col("doc_id"), col("h")).distinct()
      .groupBy("h").agg(count(lit(1)).as("nd"))
    val stats = sh.join(df_, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("nd") >= minDocs, 1L).otherwise(0L)).as("n_boiler"))
    // left-join back so shingle-less (short) docs still report a row
    docs.select(col("doc_id")).join(stats, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        round(coalesce(col("n_boiler") / col("n_sh"), lit(0.0)), 4)
          .as("boiler_frac"))
      .withColumn("flagged", (col("boiler_frac") > 0.5).cast("int"))
      .orderBy("doc_id")
  }
}
