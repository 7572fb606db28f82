package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. The Spark-side machinery — schema,
  * partition-parallel batch decode via mapPartitions, feature schema,
  * frame sampling — is real and tested; the codec itself is a
  * clearly-marked deterministic STUB (image/audio libraries are not in
  * this container). Swapping `decodeStub` for a real decoder changes
  * no plan shape: it stays a per-partition map with zero shuffle.
  */
object MultimodalOps {

  /** Media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, media: Array[Byte],
                      format: String, width: Int, height: Int)

  /** Extracted features: fixed-width histogram + summary stats. */
  case class MediaFeatures(media_id: Long, n_bytes: Int,
                           byte_mean: Double, byte_entropy: Double,
                           histogram: Array[Double])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** STUB decode: a real pipeline would decode pixels/samples here
    * (e.g. JPEG → HxWx3). This deterministic fake derives the feature
    * vector from the raw bytes (16-bin histogram + entropy) so the
    * plumbing — batching, schema, partitioning — is fully exercised. */
  def decodeStub(bytes: Array[Byte], bins: Int = 16): (Double, Double, Array[Double]) = {
    if (bytes == null || bytes.isEmpty) (0.0, 0.0, Array.fill(bins)(0.0))
    else {
      val hist = new Array[Double](bins)
      var sum = 0.0
      bytes.foreach { b =>
        val u = b & 0xff
        hist(u * bins / 256) += 1.0
        sum += u
      }
      val n = bytes.length.toDouble
      var entropy = 0.0
      hist.indices.foreach { i =>
        val p = hist(i) / n
        if (p > 0) entropy -= p * math.log(p) / math.log(2)
        hist(i) = p
      }
      (sum / n, entropy, hist)
    }
  }

  /** Partition-parallel feature extraction: one pass, no shuffle; the
    * iterator form is where a real decoder would batch into the codec. */
  def extractFeatures(media: Dataset[MediaRow], bins: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (mean, entropy, hist) = decodeStub(r.media, bins)
        MediaFeatures(r.media_id,
          if (r.media == null) 0 else r.media.length, mean, entropy, hist)
      }
    }
  }

  /** STUB resize: metadata-driven nearest-neighbor resample of the
    * payload viewed as a width×height single-channel raster (a real
    * pipeline would decode first — swapping the pixel source changes
    * nothing downstream). Rows whose payload doesn't match its
    * declared geometry pass through null (malformed media is data,
    * not an exception, at corpus scale). Map-only, no shuffle. */
  def resizeStub(media: Dataset[MediaRow], outW: Int, outH: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(outW > 0 && outH > 0)
    media.map { r =>
      val ok = r.media != null && r.width > 0 && r.height > 0 &&
        r.media.length >= r.width * r.height
      val resized: Array[Byte] =
        if (!ok) null
        else Array.tabulate(outW * outH) { i =>
          val (y, x) = (i / outW, i % outW)
          val sy = y * r.height / outH
          val sx = x * r.width / outW
          r.media(sy * r.width + sx)
        }
      (r.media_id, resized, r.format, outW, outH)
    }.toDF("media_id", "media", "format", "width", "height")
  }

  /** STUB frame sampling: every Nth fixed-size "frame" of a video
    * payload (a real implementation would seek keyframes). Output one
    * row per sampled frame, preserving partitioning. */
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
