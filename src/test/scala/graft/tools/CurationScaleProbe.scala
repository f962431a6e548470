package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** r15 diagnosis of q_pipeline_curation's sf10 slope (92.8 s = 12.1×
  * its sf1 floor on 10× data, the one superlinear row in the sf10
  * table): the decontamination stage force-broadcasts the eval
  * 3-gram set, which is O(corpus) — ~6 M distinct shingles at sf10 —
  * so the broadcast build/serialize cost grows with data and the
  * "broadcast small dim" premise silently breaks. This probe times
  * the capstone chain with the forced broadcast vs letting AQE pick
  * the join strategy from runtime stats (broadcast while the eval set
  * is genuinely small, shuffle hash join once it is not).
  *
  * args: [sfDir] (default /tmp/sf10) */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("curation-scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def chain(forceBroadcast: Boolean): DataFrame = {
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val keeper = docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
      val qual = docs.join(keeper.select("doc_id"), "doc_id")
        .withColumn("score", graft.functions.TextFunctions.qualityScore(col("text")))
        .where(col("score") >= 0.5)
      val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
      val ev = Dedup.shingleRows(docs.where(isEval), 3).select("g").distinct()
      val evalG = if (forceBroadcast) broadcast(ev) else ev
      val contaminated = Dedup.shingleRows(qual.where(!isEval), 3).distinct()
        .join(evalG, "g").select("doc_id").distinct()
      val clean = qual.where(!isEval)
        .join(contaminated, Seq("doc_id"), "left_anti")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      clean.withColumn("rk", row_number().over(w)).where(col("rk") <= 100)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"),
          round(sum(col("score").cast("decimal(38,18)")).cast("double")
            / count(lit(1)), 4).as("mean_score"))
        .orderBy("lang")
    }

    // result-identity guard: the join strategy must not change rows
    val a = chain(forceBroadcast = true).collect().toSeq
    val b = chain(forceBroadcast = false).collect().toSeq
    require(a == b, s"strategy changed results: $a vs $b")
    println(s"[curation-scale] results identical across strategies (${a.size} rows)")

    // r16 (r15 verdict item 5): the DEGENERACY readouts. Before the
    // ScaleGen fix every derived doc kept its source's 3-grams, so at
    // sf10 every doc shared a shingle with the eval slice — the final
    // quota was EMPTY and the decontamination join degenerated to full
    // shingle volume. A healthy corpus shows (a) a final quota with
    // rows, (b) a contaminated-doc count well below the corpus, and
    // (c) a decontamination join volume (matching shingle rows) that
    // is sub-corpus-shingle-volume.
    {
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val nDocs = docs.count()
      val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
      val ev = Dedup.shingleRows(docs.where(isEval), 3).select("g").distinct()
        .localCheckpoint(true)
      val nonEval = Dedup.shingleRows(docs.where(!isEval), 3).distinct()
        .localCheckpoint(true)
      val nEvalTypes = ev.count()
      val nNonEvalShingleRows = nonEval.count()
      // ONE pass over the expensive join (r16 review: two separate
      // counts re-executed the 24.6M x 1.23M shingle join — the very
      // cost this probe exists to measure)
      val jRow = nonEval.join(ev, "g")
        .agg(count(lit(1)).as("vol"), countDistinct("doc_id").as("nc"))
        .head()
      val joinVolume = jRow.getLong(0)
      val nContaminated = jRow.getLong(1)
      val finalRows = chain(forceBroadcast = false)
        .agg(sum(col("n"))).head().getLong(0)
      println(s"[curation-scale] corpus docs=$nDocs evalShingleTypes=$nEvalTypes " +
        s"nonEvalShingleRows=$nNonEvalShingleRows decontamJoinVolume=$joinVolume " +
        s"contaminatedDocs=$nContaminated finalQuotaRows=$finalRows")
      require(finalRows > 0, "final quota EMPTY — corpus still contamination-saturated")
    }

    Seq(true, false).foreach { fb =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        chain(fb).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[curation-scale] forceBroadcast=$fb rep$rep: $dt%.2f s")
      }
    }
    spark.stop()
  }
}
