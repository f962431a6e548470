package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-shaped decode/feature-extract.
  *
  * The Spark-side plumbing here — schema, partition-parallel
  * `mapPartitions` over binary payloads, fixed-width feature output —
  * is real and tested; the *decoders themselves are deterministic
  * STUBS* (this container ships no image/audio codecs). Each stub is
  * marked; swapping in a real decoder (JavaCV, TwelveMonkeys, ffmpeg
  * via pipe) changes only the function body, not the dataflow.
  *
  * Scale notes: payloads stay packed in Tungsten rows end-to-end
  * (`binary` column, no driver collect); decode work is
  * embarrassingly parallel per partition; feature vectors are
  * fixed-width `array<float>` so downstream similarity operators
  * (see [[graft.operators.Similarity]]) apply unchanged.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, nbytes: Int, format: String,
                       width: Int, height: Int, channels: Int)
  case class MediaFeatures(doc_id: Long, features: Array[Float])
  case class FrameSample(doc_id: Long, frame_idx: Int, offset: Int, frame: Array[Byte])

  /** Attach a binary payload column (here derived from text — the
    * fixtures carry no real media; the column type and downstream
    * handling are what matter). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** STUB decoder: derives deterministic metadata from the payload
    * bytes. A real implementation would parse the container header
    * (PNG IHDR / JPEG SOF / WAV fmt). */
  def decodeMeta(docs: DataFrame): Dataset[MediaMeta] = {
    val withP = withPayload(docs).select(col("doc_id"), col("payload"))
    implicit val enc = Encoders.product[MediaMeta]
    withP.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB: header parse replaced by deterministic fake.
          val n = bytes.length
          MediaMeta(id, n,
            format = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp",
            width = n % 64 + 1, height = (n / 64) % 64 + 1, channels = 3)
        }
      }
  }

  /** STUB feature extractor: 8-bin byte histogram, L1-normalised —
    * stands in for an image-embedding model; batch shape (fixed-width
    * float vector per row) is the real contract. */
  def extractFeatures(docs: DataFrame, bins: Int = 8): Dataset[MediaFeatures] = {
    val withP = withPayload(docs).select(col("doc_id"), col("payload"))
    implicit val enc = Encoders.product[MediaFeatures]
    withP.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Float](bins)
          bytes.foreach(b => hist((b & 0xFF) * bins / 256) += 1f)
          val total = math.max(bytes.length, 1).toFloat
          MediaFeatures(id, hist.map(_ / total))
        }
      }
  }

  case class ResizedMedia(doc_id: Long, orig_bytes: Int, resized_bytes: Int,
                          payload: Array[Byte])

  /** STUB resize: downsamples the payload by `factor` (every factor-th
    * byte) — stands in for an image resize kernel; the contract (new
    * binary payload + before/after metadata, row-per-row) is the real
    * operator shape. */
  def resize(docs: DataFrame, factor: Int = 4): Dataset[ResizedMedia] = {
    require(factor >= 1)
    val withP = withPayload(docs).select(col("doc_id"), col("payload"))
    implicit val enc = Encoders.product[ResizedMedia]
    withP.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = Array.range(0, bytes.length, factor).map(bytes(_))
          ResizedMedia(id, bytes.length, out.length, out)
        }
      }
  }

  /** STUB frame sampler: treats the payload as fixed-size frames and
    * emits every `stride`-th one (video keyframe sampling shape). */
  def sampleFrames(docs: DataFrame, frameBytes: Int = 32, stride: Int = 4): Dataset[FrameSample] = {
    val withP = withPayload(docs).select(col("doc_id"), col("payload"))
    implicit val enc = Encoders.product[FrameSample]
    withP.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .flatMap { case (id, bytes) =>
        (0 until bytes.length / frameBytes by stride).map { i =>
          FrameSample(id, i, i * frameBytes,
            bytes.slice(i * frameBytes, (i + 1) * frameBytes))
        }
      }
  }
}
