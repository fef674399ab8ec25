package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata. The lake-side
  * representation of image/audio/video columns — `binary` payload,
  * discriminator, stable id. */
case class MediaRecord(media_id: Long, media_type: String, blob: Array[Byte])

/** Extracted features per media object. `feature_str` carries the (fake)
  * feature vector in portable string form — arrays of floats don't
  * hash-compare across engines. */
case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Int,
                         content_hash: String, feature_str: String)

/** One sampled frame of a media object (video frame / audio chunk). */
case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal-column processing for the training-data pipeline: treat
  * image/audio/video as opaque `BinaryType` columns with typed metadata
  * and run decode / feature-extraction as *batched* partition-local
  * compute. The reference has no media surface at all; this is a
  * 100 TB-pipeline addition.
  *
  * The Spark-side plumbing is real and load-bearing:
  *  - a typed `Dataset[MediaRecord]` (case-class encoder ⇒ Tungsten
  *    binary rows, no Kryo),
  *  - `mapPartitions` with an explicit [[BatchSize]]-row batch shape —
  *    exactly where a real engine hands a batch to a codec / GPU
  *    (vectorized, amortized model-load per batch, not per row),
  *  - partition-parallel, no shuffle: feature extraction is
  *    embarrassingly parallel and must stay that way at 100 TB.
  *
  * The *decode* itself is stubbed ([[decodeBatch]]) because no media
  * codecs exist in this container — deterministic fake features keep the
  * whole path testable and oracle-checkable.
  */
object Multimodal {

  /** Rows handed to the (stubbed) decoder per call — the batch shape a
    * real vectorized codec / Arrow boundary would see. */
  val BatchSize = 64

  private def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** STUB DECODER — a real engine calls an image/audio codec here (e.g.
    * JPEG decode + CNN embed, PCM resample + fbank). Those libraries are
    * not in this container, so features are a deterministic function of
    * the payload size; the signature (batch in, batch out) is the real
    * contract. */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { m =>
      val n = m.blob.length
      MediaFeatures(m.media_id, m.media_type, n, md5hex(m.blob),
        Seq(n % 256, n * 7 % 256, n * 31 % 256, n * 127 % 256)
          .mkString(","))
    }

  /** Batched feature extraction: partition-local, [[BatchSize]]-row
    * batches through [[decodeBatch]]. */
  def features(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(
      _.grouped(BatchSize).flatMap(g => decodeBatch(g).iterator))
  }

  /** STUB RESIZE — a real engine decodes, resamples to `targetBytes`
    * resolution, re-encodes. The stub keeps a deterministic prefix (so
    * output is a pure function of input) while preserving the real
    * contract: per-row narrow transform, no shuffle, blob-in → blob-out. */
  def resize(media: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map(m => m.copy(blob = m.blob.take(targetBytes)))
  }

  /** STUB FRAME SAMPLER — a real engine seeks keyframes / fixed-rate
    * samples; the stub slices the payload into `frameBytes` chunks and
    * keeps every `everyNth`. The load-bearing Spark shape: a generator
    * (1 row → n frame rows) as flatMap on a typed Dataset, partition-
    * parallel, output re-partitionable by (media_id, frame_idx) for the
    * downstream per-frame feature join. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
                   everyNth: Int = 1): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.blob.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % everyNth == 0 =>
          MediaFrame(m.media_id, i, chunk) }
    }
  }

  /** Adapt any (id, text) table into a media table — the testdata has no
    * binary column, so text bytes stand in for the payload. */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               mediaType: String = "text"): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(textCol), "UTF-8").as("blob"))
      .as[MediaRecord]
  }
}
