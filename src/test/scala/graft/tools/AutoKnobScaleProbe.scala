package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** r16 closing measurement for the three fixed-knob scale envelopes
  * (r15 verdict items 1-3): runs the PRODUCTION auto-knob gate
  * entries at a scaled corpus (default /tmp/sf10, 100× the bench SF)
  * and prints the numbers BASELINE.md records:
  *
  *  1. q_dedup_embed_auto — does the auto-sized LSH geometry COMPLETE
  *     where the fixed 4×8 geometry measurably spilled out (453 M
  *     candidates at 200 k vectors, r15)? Chosen p, analytic candidate
  *     volume Σ C(n_b,2) at fixed vs auto geometry, wall time, output
  *     pairs.
  *  2. recall delta of the auto geometry vs the fixed one, measured —
  *     per-pair band collision depends only on the pair's two vectors
  *     and the (deterministic, data-independent) md5 planes, never on
  *     the rest of the corpus, so recall measured on a deterministic
  *     row sample IS the full-corpus per-pair recall. Sample = first
  *     two md5 hex digits of vec_id < "08" (exact 1/32); truth = all
  *     in-sample pairs with round(cos,4) ≥ 0.4 by a blocked quadratic
  *     (sample² ≈ 20 M pairs at sf10 — affordable ONCE, in a probe;
  *     never in an operator).
  *  3. q_dedup_semantic_auto — chosen k, analytic within-cell pair
  *     volume Σ C(n_c,2) at fixed k=8 vs auto k, wall time.
  *  4. q_embed_pca vs q_embed_pca_sampled — the full path's loud
  *     decimal refusal at n ≈ 10⁵ and the sampled path's completion
  *     at the same corpus, plus the top-component agreement (cosine of
  *     the two loading vectors) at the largest SF where BOTH complete.
  *
  * r17 additions: section `bands` measures the RECALL lever the
  * autoPlanesPerBand scaladoc names — bands 4 vs 8 at the auto-p
  * operating point, per-cos-band recall + full-corpus candidate
  * volume + timed full pass (r16 verdict item 4); section `ivf2`
  * times q_embed_ivf_2level_auto's corpus-derived geometry at scale
  * (r16 verdict item 5).
  *
  * args: [sfDir] [alsoFullPca(0|1)] [section(all|lsh|cell|pca|bands|ivf2)]
  * (defaults /tmp/sf10 1 all) */
object AutoKnobScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf10")
    val alsoFullPca = args.length < 2 || args(1) == "1"
    val section = if (args.length > 2) args(2) else "all"
    def in(s: String) = section == "all" || section == s
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("auto-knob-scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[auto-knob] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
      .localCheckpoint(true)
    val n = e.count()
    val pAuto = Similarity.autoPlanesPerBand(n)
    val kAuto = Similarity.autoCellCount(n)
    println(s"[auto-knob] corpus n=$n -> planes=$pAuto cells=$kAuto")

    // -- 1. analytic candidate volumes + timed production run --------
    if (in("lsh")) {
    def candVolume(planes: Int): Long =
      Similarity.lshBandBuckets(e, bands = 4, planesPerBand = planes, dims = 64)
        .groupBy("band_id", "bucket").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).cast("long")).head().getLong(0)
    val volFixed = timed("cand_volume_p8_analytic")(candVolume(8))
    val volAuto =
      if (pAuto == 8) volFixed else timed(s"cand_volume_p${pAuto}_analytic")(candVolume(pAuto))
    println(s"[auto-knob] candidate volume: p=8 -> $volFixed, p=$pAuto -> $volAuto")
    val nPairs = timed("q_dedup_embed_auto_full_run") {
      graft.SparkEntry.queries("q_dedup_embed_auto")(spark, d).count()
    }
    println(s"[auto-knob] q_dedup_embed_auto output pairs: $nPairs")

    // -- 2. measured per-pair recall, fixed vs auto geometry ---------
    val sample = e
      .where(substring(md5(col("vec_id").cast("string")), 1, 2) < "08")
      .localCheckpoint(true)
    val nS = sample.count()
    println(f"[auto-knob] recall sample n=$nS (~${nS.toDouble * nS / 2 / 1e6}%.1f M truth pairs scored)")
    val truth = timed("truth_pairs_blocked_quadratic") {
      val a = sample.select(col("vec_id").as("i"), col("v").as("va"))
      val b = sample.select(col("vec_id").as("j"), col("v").as("vb"))
      val p = a.crossJoin(b).where(col("i") < col("j"))
        .where(expr("round(cosine_sim(va, vb), 4) >= 0.4"))
        .select("i", "j").localCheckpoint(true)
      p
    }
    val nTruth = truth.count()
    def confirmed(planes: Int): Long = {
      val raw = Similarity
        .lshBandBuckets(sample, bands = 4, planesPerBand = planes, dims = 64)
      val cand = raw.select(col("vec_id").as("i"), col("band_id"), col("bucket"))
        .join(raw.select(col("vec_id").as("j"), col("band_id"), col("bucket")),
          Seq("band_id", "bucket"))
        .where(col("i") < col("j")).select("i", "j").distinct()
      cand.join(truth, Seq("i", "j"), "left_semi").count()
    }
    val recFixed = timed("recall_p8")(confirmed(8))
    val recAuto = if (pAuto == 8) recFixed else timed(s"recall_p$pAuto")(confirmed(pAuto))
    println(f"[auto-knob] truth pairs (cos>=0.4): $nTruth; " +
      f"recall p=8: $recFixed (${recFixed * 100.0 / math.max(1L, nTruth)}%.2f%%), " +
      f"p=$pAuto: $recAuto (${recAuto * 100.0 / math.max(1L, nTruth)}%.2f%%)")
    }

    // -- 3. semantic dedup: analytic cell volumes + timed run --------
    if (in("cell")) {
    def cellVolume(k: Int): Long = {
      val cents = e.where(col("vec_id").between(1, k))
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      Similarity.assignCells(e, cents)
        .groupBy("cid").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).cast("long")).head().getLong(0)
    }
    val cvFixed = timed("cell_volume_k8_analytic")(cellVolume(8))
    val cvAuto =
      if (kAuto == 8) cvFixed else timed(s"cell_volume_k${kAuto}_analytic")(cellVolume(kAuto))
    println(s"[auto-knob] within-cell pair volume: k=8 -> $cvFixed, k=$kAuto -> $cvAuto")
    timed("q_dedup_semantic_auto_full_run") {
      graft.SparkEntry.queries("q_dedup_semantic_auto")(spark, d).count()
    }
    }

    // -- 4. pca: full path's refusal vs sampled path's completion ----
    if (in("pca")) {
    if (alsoFullPca) {
      try {
        timed("q_embed_pca_full") {
          graft.SparkEntry.queries("q_embed_pca")(spark, d).count()
        }
        println("[auto-knob] q_embed_pca: COMPLETED at this SF")
      } catch {
        case t: Throwable =>
          val msg = Option(t.getMessage).getOrElse(t.toString).linesIterator
            .take(2).mkString(" / ")
          println(s"[auto-knob] q_embed_pca: REFUSED (expected at n>=~1e5): $msg")
      }
    }
    val sampled = timed("q_embed_pca_sampled") {
      graft.SparkEntry.queries("q_embed_pca_sampled")(spark, d)
        .select("dim", "loading").collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
    }
    println(s"[auto-knob] q_embed_pca_sampled loadings head: ${sampled.take(4).mkString(", ")}")
    // agreement with the full path where both complete (caller runs
    // this probe at sf1 for the delta; at sf10 full refuses)
    try {
      val full = graft.SparkEntry.queries("q_embed_pca")(spark, d)
        .select("dim", "loading").collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
      val dot = full.zip(sampled).map { case (a, b) => a * b }.sum
      val na = math.sqrt(full.map(x => x * x).sum)
      val nb = math.sqrt(sampled.map(x => x * x).sum)
      println(f"[auto-knob] full-vs-sampled top-component |cos| = ${math.abs(dot / (na * nb))}%.6f")
    } catch {
      case _: Throwable =>
        println("[auto-knob] full-vs-sampled agreement: full path unavailable at this SF (see refusal above)")
    }
    }

    // -- 5. the BANDS recall lever at the auto-p operating point -----
    // (r16 verdict item 4: autoPlanesPerBand's scaladoc names `bands`
    // as the recall knob; this measures the (bands, recall, cost)
    // triple at the sf10 operating point p = pAuto.) Recall is per
    // cosine band — threshold-band [0.4, 0.6) where the p=12 price
    // concentrates, mid (0.6, 0.9), and clone-grade >= 0.9 — on the
    // same 1/32 deterministic sample as section 2 (per-pair collision
    // depends only on the pair, so sample recall IS corpus recall);
    // cost is the FULL-corpus analytic candidate volume and a timed
    // full candidate->rescore pass at each bands setting.
    if (in("bands")) {
      val sample = e
        .where(substring(md5(col("vec_id").cast("string")), 1, 2) < "08")
        .localCheckpoint(true)
      val truthB = timed("bands_truth_pairs") {
        val a = sample.select(col("vec_id").as("i"), col("v").as("va"))
        val b = sample.select(col("vec_id").as("j"), col("v").as("vb"))
        a.crossJoin(b).where(col("i") < col("j"))
          .select(col("i"), col("j"),
            expr("round(cosine_sim(va, vb), 4)").as("cos"))
          .where(col("cos") >= 0.4)
          .withColumn("cosband",
            when(col("cos") >= 0.9, "c_ge_0.9")
              .when(col("cos") >= 0.6, "c_0.6_0.9")
              .otherwise("c_0.4_0.6"))
          .select("i", "j", "cosband").localCheckpoint(true)
      }
      val totals = truthB.groupBy("cosband").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"[auto-knob] bands truth pairs by cos band: $totals")
      def recallByBand(bands: Int): Map[String, Long] = {
        val raw = Similarity
          .lshBandBuckets(sample, bands = bands, planesPerBand = pAuto, dims = 64)
        val cand = raw.select(col("vec_id").as("i"), col("band_id"), col("bucket"))
          .join(raw.select(col("vec_id").as("j"), col("band_id"), col("bucket")),
            Seq("band_id", "bucket"))
          .where(col("i") < col("j")).select("i", "j").distinct()
        truthB.join(cand, Seq("i", "j"), "left_semi")
          .groupBy("cosband").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      def candVolumeB(bands: Int): Long =
        Similarity.lshBandBuckets(e, bands = bands, planesPerBand = pAuto, dims = 64)
          .groupBy("band_id", "bucket").agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * (col("c") - 1) / 2).cast("long")).head().getLong(0)
      def timedFullPass(bands: Int): (Long, Double) = {
        val t0 = System.nanoTime()
        val raw = Similarity
          .lshBandBuckets(e, bands = bands, planesPerBand = pAuto, dims = 64)
          .localCheckpoint(true)
        val (bt, _) = Similarity.adaptiveSalt(raw,
          Seq("band_id", "bucket"), "vec_id", Similarity.maxBucketDefault)
        val cand = bt.select(col("vec_id").as("i"), col("band_id"), col("bucket"), col("salt"))
          .join(bt.select(col("vec_id").as("j"), col("band_id"), col("bucket"), col("salt")),
            Seq("band_id", "bucket", "salt"))
          .where(col("i") < col("j")).select("i", "j").distinct()
        val np = cand
          .join(e.select(col("vec_id").as("i"), col("v").as("va")), "i")
          .join(e.select(col("vec_id").as("j"), col("v").as("vb")), "j")
          .where(expr("round(cosine_sim(va, vb), 4) >= 0.4")).count()
        (np, (System.nanoTime() - t0) / 1e9)
      }
      Seq(4, 8).foreach { b =>
        val vol = timed(s"bands${b}_cand_volume_analytic")(candVolumeB(b))
        val rec = recallByBand(b)
        val recStr = Seq("c_0.4_0.6", "c_0.6_0.9", "c_ge_0.9").map { k =>
          val t = totals.getOrElse(k, 0L); val r = rec.getOrElse(k, 0L)
          f"$k: $r/$t (${if (t == 0) 0.0 else r * 100.0 / t}%.2f%%)"
        }.mkString(", ")
        val (np, dt) = timedFullPass(b)
        println(f"[auto-knob] bands=$b p=$pAuto: cand_volume=$vol " +
          f"full_pass=${dt}%.1f s pairs>=0.4=$np recall{$recStr}")
      }
    }

    // -- 6. two-level IVF auto geometry at scale ----------------------
    // (r16 verdict item 5's sf10 row: the corpus-derived (k1, k2).)
    if (in("ivf2")) {
      val k1 = Similarity.autoTwoLevelFanout(n)
      println(s"[auto-knob] ivf2: n=$n -> k1=k2=$k1 (${k1 * k1} leaves)")
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val out = graft.SparkEntry.queries("q_embed_ivf_2level_auto")(spark, d).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[auto-knob] ivf2 rep$rep: top-${out.length} in $dt%.2f s " +
          s"(k1 on rows: ${out.headOption.map(_.getAs[Int]("k1")).getOrElse(-1)})")
      }
    }
    spark.stop()
  }
}
