package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom-filter join pruning — the runtime-filter primitive
  * that matters at 100 TB: when a selective dimension filters a huge
  * fact-side join, shipping a KB-sized bit set to every fact task and
  * dropping non-candidate rows BEFORE the shuffle turns an
  * all-fact-rows exchange into a matching-rows exchange. Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` does this
  * opportunistically; this operator makes the pattern explicit,
  * deterministic (md5-derived bit positions, so a DuckDB twin can
  * verify the end-to-end join result), and composable with any
  * downstream operator.
  *
  * Semantics contract: the filter can only produce false POSITIVES
  * (extra candidate rows), never false negatives, so
  * `prefilter → exact join` computes exactly the unfiltered join —
  * which is what the `q_join_bloom` oracle (a plain semi-join, no
  * bloom) verifies end to end.
  *
  * Scale shape: the build side is one distributed projection +
  * `bit_or` hash-aggregate over ≤ m/64 word groups; only the finished
  * ≤ m/64-word filter is collected — it IS the broadcast object, the
  * same driver-side shape as Spark's runtime bloom pruning (a
  * DynamicPruning literal) or any `broadcast()` dimension. The probe
  * side is pure codegen'd per-row arithmetic (md5 + shift/mask against
  * an array literal) — no join, no shuffle, no UDF.
  */
object BloomPrune {

  /** The `h` deterministic bit positions of `key`: position `j` reads
    * the first 8 hex chars (32 bits) of md5("j|" + key) mod `mBits`.
    * Shared by build and probe so they can never desynchronize. */
  private def bitPositions(key: Column, mBits: Int, h: Int): Seq[Column] =
    (0 until h).map(j =>
      (conv(substring(md5(concat(lit(s"$j|"), key.cast("string"))), 1, 8), 16, 10)
        .cast("long") % mBits).cast("int"))

  /** Build the filter over the distinct keys of `keys(keyCol)`:
    * `mBits` bits packed into an `Array[Long]` of mBits/64 words.
    * Distributed: explode each key into its `h` positions, map to
    * (word, mask), `bit_or`-aggregate per word (≤ mBits/64 groups —
    * partial-aggregated, so the shuffle carries at most one row per
    * word per input partition regardless of key count). */
  def build(keys: DataFrame, keyCol: String, mBits: Int = 1 << 14,
            h: Int = 3): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits ($mBits) must be a positive multiple of 64")
    val rows = keys
      // NULL keys never match an equi-/semi-join, and a null key would
      // null every hash position and NPE the primitive word fold below
      .where(col(keyCol).isNotNull)
      .select(explode(array(bitPositions(col(keyCol), mBits, h): _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), col("pos") % 64).as("m"))
      .groupBy("w").agg(bit_or(col("m")).as("bits"))
      .collect()
    val words = new Array[Long](mBits / 64)
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Membership probe as a codegen'd Column: true iff all `h` bits of
    * `key` are set in `words`. The word table rides along as an array
    * literal (broadcast in the plan), so the predicate is scan-side
    * arithmetic with no join. `mBits`/`h` must match [[build]]. */
  def mightContain(words: Array[Long], mBits: Int, h: Int, key: Column): Column = {
    require(words.length * 64 == mBits,
      s"filter has ${words.length * 64} bits but caller expects $mBits")
    val lut = array(words.map(lit(_)).toIndexedSeq: _*)
    bitPositions(key, mBits, h)
      .map(p => call_function("shiftright",
          element_at(lut, (p / 64 + 1).cast("int")), p % 64)
        .bitwiseAND(lit(1L)) === lit(1L))
      .reduce(_ && _)
  }
}
