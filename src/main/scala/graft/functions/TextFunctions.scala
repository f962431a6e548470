package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline operators
  * (dedup, language-ID, quality scoring, fingerprinting). Everything is
  * built from codegen'd built-ins with **cross-engine-deterministic**
  * semantics: hashes are md5 (identical in every engine), folds are
  * explicit left folds, tokenisation is a plain `\s+` split — so each
  * operator can carry an exact DuckDB oracle.
  */
object TextFunctions {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles (space-joined), 1-based sliding window.
    * (Guarded: Spark's `sequence(1, 0)` counts *down*, so short docs
    * must short-circuit to an empty array.) */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*)))
  }

  /** One MinHash component: the lexicographic min of md5(seed|shingle).
    * min-of-md5-strings is a uniform random permutation per seed, so the
    * classic MinHash collision bound applies, and both engines agree
    * byte-for-byte (md5 + string min are engine-independent). */
  def minhashComponent(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(s"$seed|"), s))))

  /** Full signature as array<string> of `k` components. */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(minhashComponent(shingles, _)): _*)

  /** 16-bit SimHash over *distinct* tokens: bit b is set iff
    * sum over tokens of (high-bit of hex nibble b of md5(token) ? +1 : -1)
    * is positive. Pure string/arithmetic ops → exact oracle parity. */
  def simhash16(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val bits = (0 until 16).map { b =>
      val vote = aggregate(toks, lit(0),
        (acc, t) => acc + when(substring(md5(t), b + 1, 1) >= "8", 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Polynomial rolling-hash document fingerprint:
    * fold of `acc*31 + ascii(char) mod 1e9+7` over the raw text. */
  def fingerprint(text: Column): Column = {
    val codes = transform(sequence(lit(1), length(text)),
      i => ascii(substring(text, i, lit(1))).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L)
  }

  /** Ratio of non-alphanumeric-non-space chars to total chars. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  private val stopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val stopwordsEs = Seq("el", "la", "de", "y", "en", "es", "un", "que")
  private val stopwordsDe = Seq("der", "die", "das", "und", "ist", "ein", "zu", "den")
  private val stopwordsFr = Seq("le", "la", "de", "et", "est", "un", "que", "les")

  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*)))

  /** Stopword ratio against the English list (quality signal). */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text, stopwordsEn).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Heuristic n-gram/stopword language ID over {en,es,de,fr}, argmax of
    * per-language stopword hits, ties broken in that fixed order. */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, stopwordsEn)
    val es = stopwordHits(text, stopwordsEs)
    val de = stopwordHits(text, stopwordsDe)
    val fr = stopwordHits(text, stopwordsFr)
    val m = greatest(en, es, de, fr)
    when(m === 0, "und").when(en === m, "en").when(es === m, "es")
      .when(de === m, "de").otherwise("fr")
  }

  /** Composite quality score in [0,1]: length saturation, low punctuation,
    * presence of stopwords, sane mean token length. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val meanTok = length(regexp_replace(trim(lower(text)), "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")
    val tokScore = when(meanTok.between(3.0, 9.0), 1.0).otherwise(0.5)
    round((lenScore * 0.3 + punctScore * 0.3 + stopScore * 0.2 + tokScore * 0.2), 4)
  }
}
