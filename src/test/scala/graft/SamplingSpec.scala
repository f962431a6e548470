package graft

import org.apache.spark.sql.functions._

/** Properties of the round-7 sampling / mixing / decontamination
  * queries beyond the value-level DuckDB oracle: quota bounds,
  * determinism, stratum coverage, and eval/train disjointness. */
class SamplingSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("stratified sample keeps at most 40 docs per stratum and ranks densely") {
    val per = run("q_sample_stratified")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), max(col("rk")).as("maxrk"), min(col("rk")).as("minrk"))
      .collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      val (n, maxrk, minrk) = (r.getLong(2), r.getInt(3), r.getInt(4))
      assert(n <= 40, s"stratum over quota: $r")
      assert(minrk == 1 && maxrk == n, s"ranks not dense 1..n: $r")
    }
  }

  test("stratified sample is deterministic across runs") {
    val a = run("q_sample_stratified").collect().toSeq
    val b = run("q_sample_stratified").collect().toSeq
    assert(a == b)
  }

  test("stratified sample covers every stratum present in the corpus") {
    val corpus = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents")
      .select("lang", "source").distinct().count()
    val sampled = run("q_sample_stratified")
      .select("lang", "source").distinct().count()
    assert(sampled == corpus)
  }

  test("weighted sample = exactly the docs whose hash-uniform is below their quality score") {
    val scored = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    def u(id: Long): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(3).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16).toDouble / 16777216.0
    }
    val expect = scored.collect { case (id, s) if u(id) < s => id }.toSet
    val got = run("q_sample_weighted").collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // the sample is a real Bernoulli thinning: non-empty, proper subset
    assert(got.nonEmpty && got.size < scored.length)
  }

  test("curation capstone: per-lang quota respected, only quality docs averaged") {
    val rows = run("q_pipeline_curation").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 100, s"lang over quota: $r")
      assert(r.getDouble(3) >= 0.5, s"below the quality gate: $r")
    }
  }

  test("unigram LM score: positive, deterministic, covers every tokenizable doc") {
    val a = run("q_text_lmscore").collect()
    assert(a.forall(_.getDouble(1) > 0), "every token probability < 1 => NLL > 0")
    val corpus = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents").count()
    assert(a.length == corpus, "every doc has >= 1 token in this fixture")
    val b = run("q_text_lmscore").collect()
    assert(a.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // quality-signal DIRECTION: the doc with the highest mean token
    // frequency (most stereotypical) must score a LOWER NLL than the
    // doc with the lowest (rare-token soup) — computed independently
    val scores = a.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    import spark.implicits._
    val toks = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .as[(Long, String)].collect()
    val freq = toks.groupBy(_._2).map { case (t, l) => t -> l.length }
    val meanFreq = toks.groupBy(_._1).map { case (id, l) =>
      id -> l.map(p => freq(p._2).toDouble).sum / l.length
    }
    val common = meanFreq.maxBy(_._2)._1
    val rare = meanFreq.minBy(_._2)._1
    assert(scores(common) < scores(rare),
      s"common-token doc $common must out-score rare-token doc $rare")
  }

  test("mixture weights invert the source distribution to uniform") {
    val rows = run("q_mix_weights").collect()
    // sum over sources of weight * actual_share must be ~1 (the target
    // mixture is a probability distribution)
    val total = rows.map(_.getLong(1)).sum.toDouble
    val mass = rows.map(r => r.getDouble(3) * (r.getLong(1) / total)).sum
    assert(math.abs(mass - 1.0) < 1e-2, s"reweighted mass $mass != 1")
  }

  test("decontamination flags only train docs, never the eval slice") {
    val flagged = run("q_text_decontaminate")
      .withColumn("h", substring(md5(col("doc_id").cast("string")), 1, 1))
      .where(col("h") === "0")
      .count()
    assert(flagged == 0, "an eval doc appeared in the contaminated-train output")
  }

  test("decontaminated docs each share a 3-gram with some eval doc") {
    import spark.implicits._
    val docs = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents")
    val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
    val evalG = graft.operators.Dedup.shingleRows(docs.where(isEval), 3)
      .select("g").distinct().as[String].collect().toSet
    val hits = run("q_text_decontaminate").select("doc_id").as[Long].collect().toSet
    val trainG = graft.operators.Dedup.shingleRows(docs.where(!isEval), 3)
      .as[(Long, String)].collect()
    val expect = trainG.filter { case (_, g) => evalG(g) }.map(_._1).toSet
    assert(hits == expect)
  }

  test("budget sample fills each language's token budget (or exhausts the language)") {
    val totals = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents")
      .groupBy("lang")
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long")).as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run("q_sample_budget").collect()
    assert(got.map(_.getString(0)).toSet == totals.keySet,
      "a language with tokens is missing from the budget sample")
    got.foreach { r =>
      val (lang, nTok) = (r.getString(0), r.getLong(2))
      // admit-while-exclusive-prefix<B ⇒ admitted tokens reach the
      // budget unless the language runs out first
      assert(nTok >= math.min(2000L, totals(lang)), s"under-filled: $r")
    }
  }

  test("budget sample overflows the budget by at most one document") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val admitted = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("ntok"))
      .withColumn("before", coalesce(sum(col("ntok")).over(w), lit(0L)))
      .where(col("before") < 2000L)
    val slack = admitted.groupBy("lang")
      .agg((sum(col("ntok")) - max(col("ntok"))).as("sum_minus_largest"))
      .collect()
    slack.foreach { r =>
      assert(r.getLong(1) < 2000L,
        s"budget overflow exceeds one doc's tokens: $r")
    }
  }
}
