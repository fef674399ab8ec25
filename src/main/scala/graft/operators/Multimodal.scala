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
  * Decode: REAL for uncompressed formats — [[Ppm]] is a from-scratch
  * binary PPM (P6) image codec (parse, pixel stats, nearest-neighbor
  * resize, re-encode) in plain JVM byte code, so `image/ppm` rows get
  * true width/height/channel-mean features and true resizing. Codec
  * formats (JPEG/MP3/H.264) would need libraries absent from this
  * container, so those rows fall back to the clearly-marked stub
  * features — same batch contract either way.
  */
object Multimodal {

  /** Rows handed to the (stubbed) decoder per call — the batch shape a
    * real vectorized codec / Arrow boundary would see. */
  val BatchSize = 64

  private def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Batch decoder. `image/ppm` payloads that parse get REAL features
    * (width, height, per-channel means from the actual pixels, via
    * [[Ppm]]); everything else falls back to the STUB arm — a real
    * engine calls a codec there (JPEG decode + CNN embed, PCM resample
    * + fbank), libraries this container lacks, so stub features are a
    * deterministic function of payload size. Batch-in/batch-out is the
    * real contract either way. */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { m =>
      val n = m.blob.length
      val real = if (m.media_type == "image/ppm") Ppm.decode(m.blob) else None
      real match {
        case Some(img) =>
          val (r, g, b) = Ppm.meanRgb(img)
          // Locale.ROOT: "127.50" everywhere, not "127,50" in comma-
          // decimal locales — features must be environment-independent
          MediaFeatures(m.media_id, m.media_type, n, md5hex(m.blob),
            String.format(java.util.Locale.ROOT, "%d,%d,%.2f,%.2f,%.2f",
              Int.box(img.w), Int.box(img.h),
              Double.box(r), Double.box(g), Double.box(b)))
        case None =>
          MediaFeatures(m.media_id, m.media_type, n, md5hex(m.blob),
            Seq(n % 256, n * 7 % 256, n * 31 % 256, n * 127 % 256)
              .mkString(","))
      }
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

  /** REAL image resize for decodable rows: `image/ppm` payloads are
    * decoded, nearest-neighbor-resampled to `w`×`h`, and re-encoded;
    * non-decodable rows pass through unchanged (a real engine would
    * route them to the right codec). Same plan shape as [[resize]]:
    * per-row narrow transform, no shuffle. */
  def resizeImage(media: Dataset[MediaRecord], w: Int,
                  h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.media_type != "image/ppm") m
      else Ppm.decode(m.blob).fold(m)(img =>
        m.copy(blob = Ppm.encode(Ppm.resizeNearest(img, w, h))))
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

/** From-scratch binary PPM (P6) image codec — plain JVM byte work, no
  * libraries: the one image format a container without codecs can still
  * decode for REAL. Header: `P6 <w> <h> <maxval>` as ASCII tokens
  * separated by whitespace, `#` line comments allowed, a single
  * whitespace byte, then `3·w·h` raw RGB bytes (maxval 255 only). */
object Ppm {

  /** Decoded RGB image: `pixels` is row-major, 3 bytes per pixel. */
  final case class Image(w: Int, h: Int, pixels: Array[Byte])

  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && i < bytes.length) {
        val c = bytes(i).toChar
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else done = true
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0; var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (any) v else -1
    }
    val w = int(); val h = int(); val mx = int()
    i += 1 // exactly one whitespace byte separates header from pixels
    val need = 3L * w * h
    if (w <= 0 || h <= 0 || mx != 255 || bytes.length - i < need) None
    else Some(Image(w, h,
      java.util.Arrays.copyOfRange(bytes, i, i + need.toInt)))
  }

  def encode(img: Image): Array[Byte] =
    s"P6\n${img.w} ${img.h}\n255\n".getBytes("US-ASCII") ++ img.pixels

  /** Nearest-neighbor resample to `ow`×`oh`. */
  def resizeNearest(img: Image, ow: Int, oh: Int): Image = {
    require(ow > 0 && oh > 0)
    val out = new Array[Byte](3 * ow * oh)
    var y = 0
    while (y < oh) {
      val sy = y * img.h / oh
      var x = 0
      while (x < ow) {
        val sx = x * img.w / ow
        val si = 3 * (sy * img.w + sx)
        val di = 3 * (y * ow + x)
        out(di) = img.pixels(si)
        out(di + 1) = img.pixels(si + 1)
        out(di + 2) = img.pixels(si + 2)
        x += 1
      }
      y += 1
    }
    Image(ow, oh, out)
  }

  /** Per-channel means over the real pixels (bytes read unsigned). */
  def meanRgb(img: Image): (Double, Double, Double) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < img.pixels.length) {
      r += img.pixels(i) & 0xff
      g += img.pixels(i + 1) & 0xff
      b += img.pixels(i + 2) & 0xff
      i += 3
    }
    val n = (img.pixels.length / 3).toDouble
    (r / n, g / n, b / n)
  }
}
