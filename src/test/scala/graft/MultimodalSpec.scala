package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  lazy val docs = graft.queries.Tables.t(spark, TestSpark.sfDir, "documents")

  test("payload column is real binary with text's byte length") {
    val r = Multimodal.withPayload(docs)
      .select(col("doc_id"), length(col("payload")).as("n"), length(col("text")).as("m"))
      .where(col("n") =!= col("m"))
    assert(r.count() === 0)
  }

  test("decodeMeta: typed schema, deterministic, all docs covered") {
    val meta = Multimodal.decodeMeta(docs)
    assert(meta.schema.fieldNames.toSeq ===
      Seq("doc_id", "nbytes", "format", "width", "height", "channels"))
    val rows = meta.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(m => m.width >= 1 && m.width <= 64 && m.channels == 3))
    val again = Multimodal.decodeMeta(docs).collect()
    assert(rows.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("extractFeatures: fixed-width normalised vectors") {
    val f = Multimodal.extractFeatures(docs, bins = 8).collect()
    assert(f.forall(_.features.length === 8))
    f.foreach { m =>
      val s = m.features.sum
      assert(math.abs(s - 1f) < 1e-3, s"histogram of ${m.doc_id} sums to $s")
    }
  }

  test("resize: downsampled payload with correct byte accounting") {
    val r = Multimodal.resize(docs, factor = 4).collect()
    assert(r.length === docs.count())
    r.foreach { m =>
      assert(m.resized_bytes === (m.orig_bytes + 3) / 4)
      assert(m.payload.length === m.resized_bytes)
    }
  }

  test("sampleFrames: strided offsets, frame-sized slices") {
    val frames = Multimodal.sampleFrames(docs, frameBytes = 32, stride = 4).collect()
    assert(frames.nonEmpty)
    frames.foreach { fr =>
      assert(fr.offset === fr.frame_idx * 32)
      assert(fr.frame_idx % 4 === 0)
      assert(fr.frame.length === 32)
    }
  }

  test("extractFeatures agrees with the oracled integer byte histogram (q_multimodal_hist)") {
    // features are the q_multimodal_hist counts L1-normalised in
    // Float32 — multiplying back by nbytes must recover the exact
    // integer counts, which is what the gate oracles
    val hist = SparkEntry.queries("q_multimodal_hist")(spark, TestSpark.sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (0 until 8).map(k => r.getAs[Long](s"b$k"))).toMap
    val nbytes = Multimodal.decodeMeta(docs).collect().map(m => m.doc_id -> m.nbytes).toMap
    Multimodal.extractFeatures(docs).collect().foreach { f =>
      val counts = f.features.map(x => math.round(x * nbytes(f.doc_id)).toLong).toSeq
      assert(counts === hist(f.doc_id), s"doc ${f.doc_id}")
    }
  }
}
