package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives an sf1-SCALE dataset (10× sf0.1) for the r12-VERDICT-item-2
  * scaling measurement: the 100×-scale story previously rested on plan
  * shape + 10× in-memory stress probes; this materializes a real 10×
  * dataset on disk so the heavy bench entries get one measured larger-SF
  * datapoint (wall time + slope vs sf0.1, recorded in BASELINE.md).
  *
  * Derivation = 10 key-shifted copies of each sf0.1 fact table (the
  * tools/Stress union pattern, persisted): keys are offset per copy so
  * copies stay disjoint where the semantics need disjointness
  * (orders/lineitems/customers/users/docs/vectors), while dimension
  * tables pass through unchanged. Content columns that would otherwise
  * become exact 10× clones get a deterministic per-copy variation
  * (documents text suffix; embedding per-copy jitter — cosine is
  * scale-invariant, so a multiplicative change alone would NOT vary
  * direction) so the dedup/similarity entries measure scale, not a
  * degenerate all-duplicate corpus. Customer names are re-derived from
  * the shifted key in the fixture's exact format so er_match blocks
  * stay realistic instead of 10-deep identical-name stacks. */
object ScaleGen {
  /** args: [outDir] [srcDir] [keyOffsetPerCopy] [variantTag] [chainLevel]
    * Defaults derive sf1 (10x sf0.1). For sf10, chain: derive sf1
    * first, then `ScaleGen /tmp/sf10 /tmp/sf1 100000000 w 1` — the key
    * offset must clear the SOURCE's whole key range (sf1 keys reach
    * ~96M, so 100M per copy), the variant tag keeps the per-copy
    * text/vector variation from colliding with the tags the source
    * generation already appended, and the chain level (0 for the
    * first derivation, 1 for the second, …) makes each level's
    * embedding-jitter epsilon family EXPLICITLY distinct (r15 advice:
    * deriving the scale from tag.hashCode%5 let two tags in the same
    * residue class silently reproduce the bit-identical-duplicate
    * bug). */
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sf1")
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("scalegen").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()

    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until 10).map(i => shift(df, i)).reduce(_ union _)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name -> ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    val K = if (args.length > 2) args(2).toLong
            else 10000000L // key offset per copy — clears every sf0.1 key range
    val tag = if (args.length > 3) args(3) else "variant"

    // dims: unchanged
    Seq("region", "nation", "part", "supplier").foreach { t =>
      write(t, spark.read.parquet(s"$src/$t.parquet"))
    }
    val orders = spark.read.parquet(s"$src/orders.parquet")
    write("orders", copies(orders) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * K))
        .withColumn("o_custkey", col("o_custkey") + lit(i * K))
    })
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    write("lineitem", copies(li) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * K))
    })
    val cust = spark.read.parquet(s"$src/customer.parquet")
    write("customer", copies(cust) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * K))
        // fixture name format: 'Customer#' + 9-digit zero-padded key
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
    })
    val ev = graft.queries.Tables.events(spark, src)
    write("events", copies(ev) { (df, i) =>
      // event_id offset scales WITH K (r15 review): the old fixed 1e9
      // collided on chained runs — sf1's event_ids already reach ~9e9,
      // so the sf10 derivation must stride past the whole source range
      // (K·100 = 1e9 for the default sf1 run, 1e10 for the chained one)
      df.withColumn("event_id", col("event_id") + lit(i * K * 100L))
        .withColumn("user_id", col("user_id") + lit(i * K))
    })
    val docs = spark.read.parquet(s"$src/documents.parquet")
    write("documents", copies(docs) { (df, i) =>
      val shifted = df.withColumn("doc_id", col("doc_id") + lit(i * K))
      val varied =
        if (i == 0) shifted
        else if (i < 3)
          // near-dup clones: shingle-PRESERVING suffix append — the
          // cross-copy signal the dedup family measures at scale
          shifted.withColumn("text", concat(col("text"), lit(s" $tag$i")))
        else
          // shingle-FRESH clones (r16, r15 verdict item 5): suffix
          // every 3rd whitespace token, so every word-3-gram contains
          // a rewritten token and the copy shares NO shingle with its
          // source or siblings. Without this, every derived doc kept
          // its source's 3-grams, so at sf10 every doc shared a
          // shingle with the eval slice and the decontamination
          // entries measured a degenerate drop-everything corpus at
          // exactly the scale the measurement exists for. Family size
          // stays 3 per level (copy 0 + two near-dups), so the
          // eval-overlap rate stays organic while dedup still has
          // real cross-copy work.
          // split on \s+ (the shingle tokenizer's rule — a tab-joined
          // pair must not survive as one unrewritten split-token; on
          // the single-space fixtures this is byte-identical to the
          // ' ' split, so the r16 sf1/sf10 measurements stand) and
          // rewrite the last token of a SHORT doc: < 3 tokens has no
          // j%3==2 index, which left copies 3..9 bit-identical to
          // their source (r16 review) — no 3-grams there, but the
          // exact-dup families it created were still wrong. Docs with
          // >= 3 tokens keep the exact previous rewrite.
          // tokenize ONCE per row (r16 review: size(split(..)) inside
          // the transform lambda re-ran the full-document regex split
          // per token — O(tokens²·len) on the generator's hot path)
          shifted.withColumn("toks", expr("split(text, '\\\\s+')"))
            .withColumn("text",
              expr(s"array_join(transform(toks, (t, j) -> " +
                s"IF(j % 3 = 2 OR (size(toks) < 3 AND j = size(toks) - 1), " +
                s"concat(t, '$tag$i'), t)), ' ')"))
            .drop("toks")
      varied.withColumn("n_chars", length(col("text")).cast("long"))
    })
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    // chain-level-dependent jitter scale (r15 review): a pure
    // function of i commutes across chained runs — base+eps(s)+eps(i)
    // equals base+eps(i)+eps(s), so the (s=0,i=k) and (s=k,i=0)
    // copies came out bit-identical (cos = 1.0 exact duplicates).
    // The scale comes from an EXPLICIT chain-level argument (r15
    // advice: tag.hashCode%5 reduces to char-sum%5, so two different
    // tags in one residue class silently reproduced the collision).
    val level = if (args.length > 4) args(4).toInt else 0
    require(level >= 0 && level <= 9, s"chainLevel must be 0-9, got $level")
    val tscale = 0.003 * (1.0 + level * 0.3)
    write("embeddings", copies(emb) { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * K))
        // per-copy direction jitter: add i-dependent epsilon to one
        // dimension band so copies are near- but not exact duplicates
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else expr(s"transform(embedding, (x, j) -> cast(x + ((j * 31 + $i * 7) % 11 - 5) * $tscale * $i as float))"))
    })
    spark.stop()
  }
}
