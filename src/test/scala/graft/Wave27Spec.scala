package graft

import org.apache.spark.sql.functions._

/** Property checks for the r12 wave beyond their DuckDB oracles:
  * PII redaction completeness, utf8 injection accounting, upsample
  * factor realization, data-card internal consistency, and data-scale
  * LPA label sanity. */
class Wave27Spec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, d)

  test("q_text_pii: every doc contributes exactly one email and one ip; no residue") {
    val r = run("q_text_pii").collect()
    r.foreach { row =>
      assert(row.getAs[Long]("n_emails") == row.getAs[Long]("n_docs"),
        s"source ${row.getAs[String]("source")}: email count != doc count")
      assert(row.getAs[Long]("n_ips") == row.getAs[Long]("n_docs"))
    }
    // residue check: after the scrub no email/IP pattern survives
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val red = spark.read.parquet(s"$d/documents.parquet")
      .withColumn("txt", concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com from 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7")))
      .withColumn("red", regexp_replace(
        regexp_replace(col("txt"), email, "<EMAIL>"),
        "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))
    assert(red.where(expr(s"red rlike '$email'")).count() == 0L,
      "redacted text still matches the email pattern")
  }

  test("q_text_utf8: multibyte docs are exactly the doc_id % 7 == 0 docs") {
    val got = run("q_text_utf8").agg(
      sum("n_multibyte_docs"), sum("n_docs"), sum("n_bytes"), sum("n_chars")).head()
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val want = docs.where(col("doc_id") % 7 === 0).count()
    assert(got.getLong(0) == want)
    // injected tail: +2 chars and +5 bytes per marked doc
    val baseChars = docs.agg(sum(length(col("text")))).head().getLong(0)
    assert(got.getLong(3) == baseChars + 2 * want, "char accounting")
    assert(got.getLong(2) == baseChars + 5 * want,
      "byte accounting (fixture all-ASCII, tail é€ = 5 bytes)")
  }

  test("q_mix_upsample: realized factor lands within the fractional band") {
    run("q_mix_upsample").collect().foreach { row =>
      val src = row.getAs[String]("source")
      val f = 1.0 + (src.stripPrefix("src").toInt % 4) * 0.5
      val realized = row.getAs[Double]("realized")
      // integer part guaranteed; fractional part is a deterministic
      // ~50% doc subset, so realized is within 0.5 of the target
      assert(realized >= math.floor(f) && realized <= math.ceil(f),
        s"$src: realized $realized outside [${math.floor(f)}, ${math.ceil(f)}] for factor $f")
      assert(row.getAs[Long]("n_emitted") >= row.getAs[Long]("n_docs"))
    }
  }

  test("q_pipeline_datacard agrees with q_text_dupe_stats on the dup census") {
    val card = run("q_pipeline_datacard")
      .select("source", "n_docs", "dup_ratio").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val census = run("q_text_dupe_stats")
      .select("source", "n_docs", "dup_ratio").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(card == census, "datacard and dupe census disagree")
  }

  test("q_feature_hash: buckets in [0,16) and counts conserve the token volume") {
    val r = run("q_feature_hash")
    assert(r.where(col("bucket") < 0 || col("bucket") >= 16).count() == 0L)
    val emitted = r.agg(sum("cnt")).head().getLong(0)
    val toks = spark.read.parquet(s"$d/documents.parquet")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .where(col("t") =!= "").count()
    assert(emitted == toks, s"bucket counts $emitted != token volume $toks")
  }

  test("q_graph_walks: every step follows an existing edge") {
    val w = run("q_graph_walks").collect()
    val und = spark.read.parquet(s"$d/orders.parquet")
      .select((col("o_orderkey") % 150).as("x"), (col("o_custkey") % 150).as("y"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).cast("long").as("a"),
        greatest(col("x"), col("y")).cast("long").as("b"))
      .distinct().collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    w.foreach { row =>
      val p = Seq("start", "v1", "v2", "v3").map(c => row.getAs[Long](c))
      p.sliding(2).foreach { case Seq(u, v) =>
        assert(und.contains((u, v)), s"walk step $u->$v is not an edge")
      }
    }
    assert(w.nonEmpty)
  }

  test("q_join_dpp: the fact scan carries a dynamic partition pruning filter") {
    // build the same staged layout the query uses and pin the plan:
    // the partitioned fact scan must show dynamicpruningexpression —
    // i.e. the dim's runtime year set reaches the FileIndex, so
    // even-year directories are never read
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp-spec").toString
    try {
      val orders = spark.read.parquet(s"$d/orders.parquet")
      orders.withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/fact")
      orders.select(year(col("o_orderdate")).as("y")).distinct()
        .withColumn("parity", pmod(col("y"), lit(2)))
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").where(col("parity") === 1)
      val plan = fact.join(dim, fact("o_year") === dim("y"))
        .groupBy(col("o_year")).agg(count(lit(1)))
        .queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"expected dynamicpruningexpression in the fact scan, got:\n$plan")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(p => try java.nio.file.Files.deleteIfExists(p)
                        catch { case _: Throwable => () })
      } finally walk.close()
    }
  }

  test("q_layout_compaction: 64 fragments compact to 2 data files, content intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-spec")
    try {
      val docs = spark.read.parquet(s"$d/documents.parquet")
      docs.repartition(64).write.mode("overwrite").parquet(s"$dir/frag")
      def dataFiles(p: String) =
        Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
          .count(_.getName.endsWith(".parquet"))
      assert(dataFiles(s"$dir/frag") == 64, "fragmented layout not fragmented")
      spark.read.parquet(s"$dir/frag").repartition(2)
        .write.mode("overwrite").parquet(s"$dir/compact")
      assert(dataFiles(s"$dir/compact") == 2, "compaction produced wrong file count")
      val a = docs.select("doc_id").collect().map(_.getLong(0)).sorted
      val b = spark.read.parquet(s"$dir/compact")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(a.sameElements(b), "compaction lost or duplicated rows")
    } finally {
      val walk = java.nio.file.Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(p => try java.nio.file.Files.deleteIfExists(p)
                        catch { case _: Throwable => () })
      } finally walk.close()
    }
  }

  test("q_agg_cramers: chi2 over the full grid, v2 in [0, 1]") {
    val r = run("q_agg_cramers").head()
    assert(r.getAs[Long]("n") > 0)
    val v2 = r.getAs[Double]("v2")
    assert(v2 >= 0.0 && v2 <= 1.0 + 1e-9, s"v2 $v2 out of range")
  }

  test("q_sample_systematic: per-source pick count ~ total/stride and picks are weighted") {
    val r = run("q_sample_systematic")
    val bySrc = r.groupBy("source").agg(count(lit(1)).as("picks")).collect()
    bySrc.foreach { row =>
      val p = row.getAs[Long]("picks")
      // stride = total DIV 10 → between 10 and 11 boundary crossings
      assert(p >= 10 && p <= 11, s"${row.getString(0)}: $p picks, want ~10")
    }
  }

  test("q_graph_coreness: consistent with q_graph_kcore membership at k=6") {
    val core6 = run("q_graph_kcore").collect().map(_.getAs[Long]("vertex")).toSet
    val cn = run("q_graph_coreness").collect()
      .map(r => r.getAs[Long]("vertex") -> r.getAs[Long]("coreness")).toMap
    cn.foreach { case (v, c) =>
      assert(core6.contains(v) == (c >= 6),
        s"vertex $v coreness $c vs 6-core membership ${core6.contains(v)}")
    }
    assert(cn.values.forall(c => c >= 1 && c <= 7))
  }

  test("lubyMis/greedyMatching invariants hold across seeded random graphs") {
    import spark.implicits._
    (1 to 4).foreach { seed =>
      // deterministic "random" graph family: 24 vertices, edges from
      // two affine maps — structure varies with the seed, no RNG
      val e = (0L until 24L).flatMap(i => Seq(
          (i, (i * (5 + seed) + 1) % 24), (i, (i * (7 + 2 * seed) + 3) % 24)))
        .filter { case (a, b) => a != b }.toDF("src", "dst")
      val und = e.collect().flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).toSet
      val mis = graft.operators.Traversals.lubyMis(e, rounds = 8).collect()
        .map(_.getAs[Long]("vertex")).toSet
      mis.foreach(a => mis.foreach(b =>
        assert(a == b || !und.contains((a, b)), s"seed $seed: MIS not independent")))
      (und.map(_._1) -- mis).foreach { v =>
        assert(und.exists { case (a, b) => a == v && mis.contains(b) },
          s"seed $seed: MIS not maximal at $v")
      }
      val m = graft.operators.GraphAlgos.greedyMatching(e, rounds = 8).collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
      val touched = m.flatMap { case (a, b) => Seq(a, b) }
      assert(touched.length == touched.distinct.length, s"seed $seed: not a matching")
      val sel = touched.toSet
      und.foreach { case (a, b) =>
        assert(sel.contains(a) || sel.contains(b), s"seed $seed: matching not maximal")
      }
    }
  }

  test("lubyMis: independent every round, maximal with enough rounds") {
    import spark.implicits._
    // deterministic random-ish graph: 40 vertices, edges by modulus
    val e = (0L until 40L).flatMap(i => Seq((i, (i * 7 + 3) % 40), (i, (i * 11 + 5) % 40)))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val mis = graft.operators.Traversals.lubyMis(e, rounds = 10).collect()
      .map(r => r.getAs[Long]("vertex") -> r.getAs[Long]("round"))
    val sel = mis.map(_._1).toSet
    assert(mis.length == sel.size, "a vertex was selected twice")
    val und = e.collect().flatMap(r => Seq((r.getLong(0), r.getLong(1)),
      (r.getLong(1), r.getLong(0)))).toSet
    // independence: no selected pair is adjacent
    sel.foreach(a => sel.foreach(b =>
      assert(a == b || !und.contains((a, b)), s"selected $a and $b are adjacent")))
    // maximality (true MIS at 10 rounds on 40 vertices): every
    // non-selected vertex has a selected neighbour
    val verts = und.map(_._1)
    (verts -- sel).foreach { v =>
      assert(und.exists { case (a, b) => a == v && sel.contains(b) },
        s"non-selected $v has no selected neighbour — not maximal")
    }
  }

  test("greedyMatching: a matching every round, maximal with enough rounds") {
    import spark.implicits._
    val e = (0L until 40L).flatMap(i => Seq((i, (i * 7 + 3) % 40), (i, (i * 11 + 5) % 40)))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val m = graft.operators.GraphAlgos.greedyMatching(e, rounds = 10).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val touched = m.flatMap { case (a, b) => Seq(a, b) }
    assert(touched.length == touched.distinct.length,
      "a vertex appears in two matched edges — not a matching")
    // maximality: no surviving edge has both endpoints unmatched
    val sel = touched.toSet
    val und = e.collect().map(r => (math.min(r.getLong(0), r.getLong(1)),
      math.max(r.getLong(0), r.getLong(1)))).toSet
    und.foreach { case (a, b) =>
      assert(sel.contains(a) || sel.contains(b),
        s"edge ($a,$b) has both endpoints unmatched — not maximal")
    }
  }

  test("UDF ladder contrast: the SQL UDF inlines, the Scala UDF stays opaque") {
    val sqlPlan = run("q_udf_sql").queryExecution.executedPlan.toString
    assert(!sqlPlan.contains("BatchEvalPython") && !sqlPlan.toLowerCase.contains("scalaudf"),
      s"SQL-language UDF was NOT inlined:\n$sqlPlan")
    val scalaPlan = run("q_udf_scalar").queryExecution.executedPlan.toString
    assert(scalaPlan.toLowerCase.contains("slugify") ||
      scalaPlan.toLowerCase.contains("scalaudf"),
      "expected the Scala UDF to appear as an opaque call in the plan")
  }

  test("q_text_bleu: precisions in [0,1] and the pair set is the candidate set") {
    val r = run("q_text_bleu").collect()
    r.foreach { row =>
      Seq("p1", "p2").foreach { c =>
        val v = row.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c = $v out of range")
      }
    }
    val candN = SparkEntry.queries("q_dedup_minhash")(spark, d).count()
    // q_dedup_minhash filters candidates at est >= 0.25; bleu scores
    // ALL banded candidates, so it can only have >= as many pairs
    assert(r.length >= candN.toInt, s"bleu pairs ${r.length} < filtered candidates $candN")
  }

  test("q_sketch_kmv_intersect: estimates track the true overlaps") {
    val r = run("q_sketch_kmv_intersect").collect()
    assert(r.length == 10, s"expected C(5,2)=10 type pairs, got ${r.length}")
    r.foreach { row =>
      val exact = row.getAs[Long]("n_exact").toDouble
      val est = row.getAs[Double]("kmv_est")
      // k=32 sketch over ~150-element sets: generous 60% band — the
      // gate pins the exact VALUE; this pins that it's an estimator,
      // not noise
      assert(est > 0.0 && math.abs(est - exact) / exact < 0.6,
        s"${row.getString(0)}∩${row.getString(1)}: est $est vs exact $exact")
    }
  }

  test("q_dedup_priority: conservation and tier-minimal winners") {
    val r = run("q_dedup_priority").collect()
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val n = docs.count()
    assert(r.map(x => x.getAs[Long]("n_docs")).sum == n)
    r.foreach(x => assert(x.getAs[Long]("n_kept") + x.getAs[Long]("n_dropped")
      == x.getAs[Long]("n_docs")))
    // every clone family's winner has the minimal tier in the family
    val fams = docs.select(col("doc_id"), col("source"),
        (substring(col("source"), 4, 10).cast("int") % 3).as("tier"),
        md5(col("text")).as("h")).collect()
      .groupBy(_.getAs[String]("h"))
    fams.values.foreach { rows =>
      val win = rows.minBy(r => (r.getAs[Int]("tier"), r.getAs[Long]("doc_id")))
      assert(win.getAs[Int]("tier") == rows.map(_.getAs[Int]("tier")).min)
    }
  }

  test("q_events_disorder: the two-phase prefix max equals a naive global window") {
    import org.apache.spark.sql.expressions.Window
    val a = graft.queries.Tables.events(spark, d).select(col("event_id"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("ak", col("event_id") +
        (conv(substring(md5(concat(lit("arr|"),
          col("event_id").cast("string"))), 1, 4), 16, 10)
          .cast("long") % 120) - 60)
    // naive: ONE global window over the full arrival order (the
    // formulation that doesn't scale — a single-partition sort)
    val wAll = Window.orderBy("ak", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = a.withColumn("late",
        greatest(lit(0L), coalesce(max(col("tus")).over(wAll), lit(0L)) - col("tus")))
      .select(when(col("late") === 0, lit(0L))
        .otherwise(least(expr("late DIV 3600000000") + 1, lit(10L))).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run("q_events_disorder").collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_events")).toMap
    assert(got == naive, s"two-phase $got != naive $naive")
  }

  test("pageRankDeterministicStaged is bit-identical to the one-shot wrapper") {
    import graft.operators.Traversals
    val e = spark.read.parquet(s"$d/orders.parquet")
      .select((col("o_orderkey") % 97).as("src"), (col("o_custkey") % 97).as("dst"))
      .where(col("src") =!= col("dst"))
    val oneShot = Traversals.pageRankDeterministic(e, iters = 4).collect()
      .map(r => r.getAs[Long]("vertex") -> r.getAs[Double]("rank")).toMap
    val eo = Traversals.pageRankEdgeTable(e)
    try {
      val staged = Traversals.pageRankDeterministicStaged(eo, iters = 4).collect()
        .map(r => r.getAs[Long]("vertex") -> r.getAs[Double]("rank")).toMap
      assert(staged == oneShot, "staged vs one-shot ranks diverge")
      // the staged table survives a run and serves a second one
      val again = Traversals.pageRankDeterministicStaged(eo, iters = 4).count()
      assert(again == oneShot.size.toLong)
    } finally eo.unpersist(blocking = false)
  }

  test("q_graph_lpa_big: labels are existing vertex ids and rounds converge downward") {
    val labels = run("q_graph_lpa_big").collect()
      .map(r => r.getAs[Long]("vertex") -> r.getAs[Long]("label")).toMap
    val verts = labels.keySet
    assert(labels.values.forall(verts.contains), "label not a vertex id")
    // 2-round label count must not exceed the 1-round count's vertex
    // total and community count should be <= |V| (sanity, not theory:
    // LPA label counts usually shrink but can oscillate on bipartite
    // structures — the oracle pins exact values; this pins shape)
    assert(labels.values.toSet.size <= verts.size)
    assert(verts.size <= 300, "modulus bound violated")
  }
}
