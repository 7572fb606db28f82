package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. Images decode for real through the
  * JDK's `javax.imageio` (PNG/JPEG/BMP/GIF — no external codec
  * dependency); payloads that are not decodable images fall back to
  * deterministic byte-level features, so non-image media (audio,
  * video, truncated uploads) still produce rows — malformed media is
  * data, not an exception, at corpus scale. Every operator here is a
  * per-partition map with zero shuffle: at 100 TB the scan is the
  * cost and decode parallelism is partition parallelism.
  */
object MultimodalOps {

  /** Media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, media: Array[Byte],
                      format: String, width: Int, height: Int)

  /** Extracted features: decode provenance + dimensions + fixed-width
    * histogram with summary stats. For `decoded = true` the histogram/
    * mean/entropy are over the 8-bit LUMINANCE plane and width/height
    * are the decoded raster's; otherwise they are over the raw payload
    * bytes and the dimensions are 0. */
  case class MediaFeatures(media_id: Long, n_bytes: Int, decoded: Boolean,
                           width: Int, height: Int,
                           mean: Double, entropy: Double,
                           histogram: Array[Double])

  /** A decoded raster: dimensions + row-major 8-bit luminance plane. */
  case class DecodedImage(width: Int, height: Int, luma: Array[Int])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Decode an image payload with `javax.imageio` and reduce it to an
    * 8-bit luminance plane (integer Rec.601: (299R+587G+114B+500)/1000
    * — deterministic, no float rounding ambiguity). Returns None when
    * the bytes are not a decodable image, or when the header declares
    * more than `maxPixels` pixels — a decompression-bomb guard: at
    * corpus scale malicious media is data, and a crafted 1 KB PNG
    * claiming 30000×30000 would otherwise allocate gigabytes in the
    * executor before any downstream check runs. The dimensions are
    * read from the header WITHOUT decoding pixels. */
  def decodeImage(bytes: Array[Byte],
                  maxPixels: Long = 64L * 1024 * 1024): Option[DecodedImage] = {
    if (bytes == null || bytes.length < 8) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      val img =
        try {
          reader.setInput(iis)
          val (w0, h0) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
          if (w0 <= 0 || h0 <= 0 || w0 * h0 > maxPixels) null
          else reader.read(0)
        } finally { reader.dispose(); iis.close() }
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val luma = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            luma(y * w + x) = (299 * r + 587 * g + 114 * b + 500) / 1000
            x += 1
          }
          y += 1
        }
        Some(DecodedImage(w, h, luma))
      }
    } catch { case _: Exception => None }
  }

  /** Histogram + mean + entropy over 8-bit values (luminance pixels or
    * raw payload bytes — both live in [0, 255]). */
  private def stats8(values: Iterator[Int], n: Int,
                     bins: Int): (Double, Double, Array[Double]) = {
    val hist = new Array[Double](bins)
    var sum = 0.0
    values.foreach { u =>
      hist(u * bins / 256) += 1.0
      sum += u
    }
    var entropy = 0.0
    hist.indices.foreach { i =>
      val p = hist(i) / n
      if (p > 0) entropy -= p * math.log(p) / math.log(2)
      hist(i) = p
    }
    (sum / n, entropy, hist)
  }

  /** Byte-level fallback features for payloads that are not decodable
    * images: 16-bin byte histogram + entropy over the raw bytes. */
  def byteFeatures(bytes: Array[Byte], bins: Int = 16): (Double, Double, Array[Double]) =
    if (bytes == null || bytes.isEmpty) (0.0, 0.0, Array.fill(bins)(0.0))
    else stats8(bytes.iterator.map(_ & 0xff), bytes.length, bins)

  /** Partition-parallel feature extraction: one pass, no shuffle.
    * Decodable images produce luminance-plane features with their
    * decoded dimensions; everything else (audio, video, corrupt bytes)
    * falls back to byte-level features. The iterator form is where a
    * batching codec would amortize per-image setup. */
  def extractFeatures(media: Dataset[MediaRow], bins: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val nBytes = if (r.media == null) 0 else r.media.length
        decodeImage(r.media) match {
          case Some(img) =>
            val (mean, entropy, hist) =
              stats8(img.luma.iterator, img.luma.length, bins)
            MediaFeatures(r.media_id, nBytes, decoded = true,
              img.width, img.height, mean, entropy, hist)
          case None =>
            val (mean, entropy, hist) = byteFeatures(r.media, bins)
            MediaFeatures(r.media_id, nBytes, decoded = false,
              0, 0, mean, entropy, hist)
        }
      }
    }
  }

  /** Nearest-neighbor resample of an 8-bit plane. */
  private def nearestResample(src: Array[Int], w: Int, h: Int,
                              outW: Int, outH: Int): Array[Byte] =
    Array.tabulate(outW * outH) { i =>
      val y = i / outW; val x = i % outW
      src(((y * h / outH) * w) + (x * w / outW)).toByte
    }

  /** Resize: decodable images resample their decoded luminance plane
    * nearest-neighbor to outW×outH (output = raw 8-bit raster,
    * format "raster8"); non-image payloads fall back to treating the
    * payload as a width×height single-channel raster per their
    * declared metadata. Rows that decode to neither pass through null
    * payloads. Map-only, no shuffle. */
  def resize(media: Dataset[MediaRow], outW: Int, outH: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(outW > 0 && outH > 0)
    media.map { r =>
      decodeImage(r.media) match {
        case Some(img) =>
          (r.media_id, nearestResample(img.luma, img.width, img.height, outW, outH),
            "raster8", outW, outH)
        case None =>
          val ok = r.media != null && r.width > 0 && r.height > 0 &&
            r.media.length >= r.width * r.height
          val resized: Array[Byte] =
            if (!ok) null
            else nearestResample(r.media.iterator.map(_ & 0xff).toArray,
              r.width, r.height, outW, outH)
          (r.media_id, resized, r.format, outW, outH)
      }
    }.toDF("media_id", "media", "format", "width", "height")
  }

  /** Frame sampling: every Nth fixed-size "frame" of a video payload
    * (a production codec would seek keyframes; the slicing, row
    * explosion, and partition preservation are the engine's part).
    * Output one row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int,
                   everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val payload = Option(r.media).getOrElse(Array.emptyByteArray)
      val nFrames = payload.length / math.max(1, frameBytes)
      (0 until nFrames by math.max(1, everyN)).map { f =>
        (r.media_id, f, payload.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    }.toDF("media_id", "frame_idx", "frame")
  }
}
