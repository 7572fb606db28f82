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

  // ImageIO's default useCache=true backs createImageInputStream with
  // a FileCacheImageInputStream: every decode WRITES A TEMP FILE —
  // pure disk churn for payloads that are already in-memory byte
  // arrays, and the per-decode cost tracks the tmp filesystem's state
  // (measured: x89 phash drifted 0.6s → 1.9s at sf0.1 and 3.2s → 11s
  // at sf1 as this box's tmp filled; flipping to the memory cache
  // restored it). Values are unaffected — only the stream's backing
  // store changes. JVM-global, set at object init (first use of any
  // decode path).
  javax.imageio.ImageIO.setUseCache(false)

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

  /** A decoded audio clip: format metadata + normalized samples in
    * [-1, 1] (interleaved when multi-channel) + the raw-domain clip
    * count (samples at integer full scale). */
  case class DecodedAudio(sampleRate: Int, channels: Int, nFrames: Long,
                          samples: Array[Double], clipCount: Long)

  /** Audio features: decode provenance + format + level statistics.
    * Undecodable payloads keep `decoded = false` with zeroed audio
    * fields — same malformed-media-is-data stance as the image path. */
  case class AudioFeatures(media_id: Long, n_bytes: Int, decoded: Boolean,
                           sample_rate: Int, channels: Int, n_frames: Long,
                           duration_s: Double, rms: Double, peak: Double,
                           clipping_frac: Double)

  /** Decode an audio payload with `javax.sound.sampled` (WAV/AIFF/AU
    * containers, PCM signed/unsigned up to 32-bit — JDK-only, the
    * audio twin of [[decodeImage]]). Returns None for non-audio bytes,
    * non-PCM encodings, or when the header's declared frame count ×
    * channels exceeds `maxSamples` — the decompression-bomb guard: the
    * declared length is read from the header WITHOUT decoding, so a
    * 100-byte file claiming 2³¹ frames never allocates. A payload
    * whose data is SHORTER than its header claims (truncated upload)
    * decodes to the frames actually present — truncation is data.
    *
    * Normalization divides by 2^(bits−1) (a power of two, so PCM16
    * round-trips bit-exactly through the double domain — what lets the
    * DuckDB oracle recompute features from the sample formula). */
  /** The `javax.sound.sampled` SPI providers, resolved ONCE per JVM.
    * `AudioSystem.getAudioInputStream` re-runs provider lookup under a
    * process-global lock on EVERY call (JDK17's
    * `JDK13Services.getProviders` is synchronized and uncached), which
    * serializes multi-core decode — the r8 sf1 honesty run measured
    * the 32-task decode stage at ~60× the single-thread per-row cost
    * from exactly this contention. Same providers, same parsing, no
    * global lock. The readers (WaveFileReader etc.) are stateless
    * parsers, safe to share across tasks. */
  private lazy val audioReaders
      : Seq[(javax.sound.sampled.spi.AudioFileReader, Boolean)] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader],
        classOf[javax.sound.sampled.AudioSystem].getClassLoader)
      .iterator().asScala.toList
    // standard RIFF/AIFF/AU readers first; the MIDI-synthesizer reader
    // last AND flagged — its format sniff re-enters the globally-locked
    // MidiSystem provider lookup on every call (jstack during the sf1
    // run: 30 of 32 decode tasks BLOCKED in
    // SoftMidiAudioFileReader → MidiSystem.getMidiFileReaders →
    // JDK13Services.getProviders), so it only runs on payloads whose
    // 4-byte header actually says MIDI
    val (midi, std) = all.partition(_.getClass.getName.toLowerCase.contains("midi"))
    std.map((_, false)) ++ midi.map((_, true))
  }

  private def looksLikeMidi(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'M' && bytes(1) == 'T' &&
      bytes(2) == 'h' && bytes(3) == 'd'

  private def audioStream(
      bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val in = new java.io.ByteArrayInputStream(bytes)
    audioReaders.foreach { case (r, midiOnly) =>
      if (!midiOnly || looksLikeMidi(bytes)) {
        in.mark(bytes.length)
        try return r.getAudioInputStream(in)
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => in.reset()
        }
      }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no installed provider recognizes the payload")
  }

  def decodeAudio(bytes: Array[Byte],
                  maxSamples: Long = 16L * 1024 * 1024): Option[DecodedAudio] = {
    import javax.sound.sampled.AudioFormat
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = audioStream(bytes)
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        if (!(signed || enc == AudioFormat.Encoding.PCM_UNSIGNED)) return None
        if (ch <= 0 || bits <= 0 || bits % 8 != 0 || bits > 32) return None
        if (fmt.getSampleRate <= 0) return None
        val step = bits / 8
        val declFrames = in.getFrameLength
        if (declFrames >= 0 && declFrames * ch > maxSamples) return None
        // read with a hard cap even when the header declares nothing
        val capBytes = (maxSamples * step + step).min(Int.MaxValue.toLong).toInt
        val buf = new java.io.ByteArrayOutputStream(
          math.min(bytes.length, capBytes))
        val chunk = new Array[Byte](8192)
        var read = 0
        var n = in.read(chunk)
        while (n > 0 && read <= capBytes) {
          buf.write(chunk, 0, n)
          read += n
          n = in.read(chunk)
        }
        if (read > maxSamples * step) return None
        val data = buf.toByteArray
        val nSamples = (data.length / step / ch) * ch // whole frames only
        val half = 1L << (bits - 1)
        val maxRaw = half - 1
        val samples = new Array[Double](nSamples)
        var clips = 0L
        var s = 0
        while (s < nSamples) {
          val base = s * step
          var raw = 0L
          var b = 0
          while (b < step) {
            val by = data(base + (if (fmt.isBigEndian) b else step - 1 - b)) & 0xffL
            raw = (raw << 8) | by
            b += 1
          }
          val v =
            if (signed) { // sign-extend
              if (raw >= half) raw - (half << 1) else raw
            } else raw - half
          if (v == maxRaw || v == -half) clips += 1
          samples(s) = v.toDouble / half
          s += 1
        }
        Some(DecodedAudio(fmt.getSampleRate.toInt, ch, nSamples / ch,
          samples, clips))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Hand-built canonical 44-byte-header WAV (PCM16 LE mono/stereo) —
    * the deterministic synthesis half of the audio path (fixtures,
    * probes, and a sink for resynthesized clips). `samples` are
    * interleaved raw 16-bit values. */
  def synthWavPcm16(sampleRate: Int, samples: Array[Int],
                    channels: Int = 1): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(v => out.putShort(v.toShort))
    out.array()
  }

  /** Partition-parallel audio feature extraction: one pass, no
    * shuffle. RMS/peak/clipping are computed over normalized samples;
    * for PCM16 every step is exact in the double domain, so the values
    * are engine-reproducible from the raw integers. */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val nBytes = if (r.media == null) 0 else r.media.length
        decodeAudio(r.media) match {
          case Some(a) if a.samples.nonEmpty =>
            var sumSq = 0.0
            var peak = 0.0
            a.samples.foreach { v =>
              sumSq += v * v
              val av = math.abs(v)
              if (av > peak) peak = av
            }
            val n = a.samples.length
            AudioFeatures(r.media_id, nBytes, decoded = true,
              a.sampleRate, a.channels, a.nFrames,
              a.nFrames.toDouble / a.sampleRate,
              math.sqrt(sumSq / n), peak, a.clipCount.toDouble / n)
          case Some(a) =>
            AudioFeatures(r.media_id, nBytes, decoded = true,
              a.sampleRate, a.channels, 0L, 0.0, 0.0, 0.0, 0.0)
          case None =>
            AudioFeatures(r.media_id, nBytes, decoded = false,
              0, 0, 0L, 0.0, 0.0, 0.0, 0.0)
        }
      }
    }
  }

  // --- video: AVI/RIFF container with MJPEG frames -----------------------

  /** Parsed AVI container: header metadata + the (offset, length) of
    * every video-stream chunk in file order. `usPerFrame`/`declFrames`
    * come from the `avih` header; `frames` from the actual `##dc`/
    * `##db` chunks present (a truncated file yields fewer frames than
    * declared — truncation is data, same stance as the audio path). */
  case class AviInfo(width: Int, height: Int, usPerFrame: Long,
                     declFrames: Long, frames: Vector[(Int, Int)],
                     codec: String)

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], o: Int): String = {
    val cs = new Array[Char](4)
    var i = 0
    while (i < 4) { cs(i) = (b(o + i) & 0xff).toChar; i += 1 }
    new String(cs)
  }

  /** Parse an AVI/RIFF container from bytes — JDK-only, the same
    * from-scratch-binary-reader stance as Bufr/Hdf5/Grib2. Walks the
    * chunk tree iteratively per level with every hostile-input guard
    * explicit:
    *  - any chunk whose declared size runs past the buffer ends the
    *    walk at that level (truncated upload — keep what parsed);
    *  - declared sizes near 2³² cannot overflow (length math in Long);
    *  - a zero-size chunk still advances 8 bytes (no infinite loop);
    *  - LIST recursion is depth-capped;
    *  - at most `maxFrames` video chunks are collected, so a crafted
    *    header declaring 2³¹ frames bounds memory at maxFrames tuples.
    * Returns None when the RIFF/AVI magic is absent. */
  def parseAvi(bytes: Array[Byte], maxFrames: Int = 1 << 16): Option[AviInfo] = {
    if (bytes == null || bytes.length < 12) return None
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return None
    var width = 0; var height = 0
    var usPerFrame = 0L; var declFrames = 0L
    var codec = ""  // fccHandler of the first vids stream header
    val frames = Vector.newBuilder[(Int, Int)]
    var nFrames = 0
    val fileEnd = math.min(bytes.length.toLong, 8L + u32le(bytes, 4)).toInt

    def isVideoChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')

    def walk(start: Int, end: Int, depth: Int): Unit = {
      var p = start
      while (p + 8 <= end && nFrames < maxFrames) {
        val id = fourcc(bytes, p)
        val sz = u32le(bytes, p + 4)
        val dataStart = p + 8
        if (sz > end.toLong - dataStart) {
          // declared size overruns the buffer (truncated upload or a
          // hostile size): descend into what IS there for a LIST —
          // complete children before the cut still parse — and drop a
          // truncated leaf; either way this level is done
          if ((id == "LIST" || id == "RIFF") && depth < 8 && end - dataStart >= 4)
            walk(dataStart + 4, end, depth + 1)
          return
        }
        val dataEnd = dataStart + sz.toInt
        id match {
          case "LIST" | "RIFF" if depth < 8 && sz >= 4 =>
            walk(dataStart + 4, dataEnd, depth + 1)
          case "strh" if sz >= 8 && codec.isEmpty &&
              fourcc(bytes, dataStart) == "vids" =>
            // the video stream's codec fourcc — an AVI whose frames
            // are NOT MJPEG (DivX etc.) must be distinguishable from
            // a corrupt-MJPEG file, so the tag rides the parse
            codec = fourcc(bytes, dataStart + 4).trim
          case "avih" if sz >= 40 =>
            usPerFrame = u32le(bytes, dataStart)
            declFrames = u32le(bytes, dataStart + 16)
            width = u32le(bytes, dataStart + 32).toInt
            height = u32le(bytes, dataStart + 36).toInt
          case other if isVideoChunk(other) =>
            frames += ((dataStart, sz.toInt))
            nFrames += 1
          case _ => ()
        }
        p = dataEnd + (sz.toInt & 1) // RIFF chunks pad to even
      }
    }
    walk(12, fileEnd, 0)
    Some(AviInfo(width, height, usPerFrame, declFrames, frames.result(), codec))
  }

  /** Hand-built minimal AVI-MJPEG container (RIFF → hdrl(avih) +
    * movi(00dc…)) — the synthesis half of the video path (fixtures and
    * probes), mirroring [[synthWavPcm16]]. `frames` are the per-frame
    * payloads (JPEG bytes for real MJPEG; any bytes for container
    * tests). */
  def synthAviMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
                    usPerFrame: Long = 33333L,
                    codec: Option[String] = None): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      if (pad == 1) out.put(0.toByte)
      out.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(usPerFrame.toInt)  // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0)
      .putInt(frames.length)     // dwTotalFrames
      .putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    // optional stream header (strl → strh) carrying the codec fourcc;
    // None keeps the byte layout of older fixtures unchanged
    val strl = codec.fold(Array.emptyByteArray) { c =>
      val fcc = (c + "    ").take(4)
      val strh = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put("vids".getBytes("US-ASCII"))
        .put(fcc.getBytes("US-ASCII"))
        .array()
      list("strl", chunk("strh", strh))
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  /** Contained-frame sampling for AVI payloads: every `everyN`th video
    * chunk as its own row, `(media_id, frame_idx, n_bytes, frame)` —
    * the real-container replacement for the fixed-stride
    * [[sampleFrames]]. Non-AVI payloads yield no rows (their features
    * come from the byte fallback). Map-side flatMap, zero shuffle; the
    * per-payload row count is bounded by `maxFrames`. */
  def sampleVideoFrames(media: Dataset[MediaRow], everyN: Int = 1,
                        maxFrames: Int = 1 << 16): DataFrame = {
    import media.sparkSession.implicits._
    require(everyN >= 1 && maxFrames >= 1)
    media.flatMap { r =>
      parseAvi(r.media, maxFrames) match {
        case Some(info) =>
          info.frames.indices.by(everyN).map { f =>
            val (off, len) = info.frames(f)
            (r.media_id, f, len, r.media.slice(off, off + len))
          }
        case None => Seq.empty
      }
    }.toDF("media_id", "frame_idx", "n_bytes", "frame")
  }

  /** Per-video features: container metadata + luminance statistics
    * over the sampled frames, each decoded through the bomb-guarded
    * [[decodeImage]] (MJPEG frames are JPEGs — the image path IS the
    * frame decoder). Undecodable containers fall back to byte-level
    * features with `container_ok = false`. One partition-parallel
    * pass, zero shuffle. */
  case class VideoFeatures(media_id: Long, n_bytes: Int, container_ok: Boolean,
                           codec: String, width: Int, height: Int, fps: Double,
                           n_frames: Long, n_sampled: Int, n_decoded: Int,
                           mean_luma: Double, mean_entropy: Double)

  def extractVideoFeatures(media: Dataset[MediaRow], everyN: Int = 1,
                           maxSampled: Int = 64): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    require(everyN >= 1 && maxSampled >= 1)
    media.mapPartitions { rows =>
      rows.map { r =>
        val nBytes = if (r.media == null) 0 else r.media.length
        parseAvi(r.media) match {
          case Some(info) =>
            val sampled = info.frames.indices.by(everyN).take(maxSampled)
            var nDec = 0
            var lumaSum = 0.0
            var entSum = 0.0
            sampled.foreach { f =>
              val (off, len) = info.frames(f)
              decodeImage(r.media.slice(off, off + len)).foreach { img =>
                val (mean, entropy, _) = stats8(img.luma.iterator, img.luma.length, 16)
                nDec += 1; lumaSum += mean; entSum += entropy
              }
            }
            val fps = if (info.usPerFrame > 0) 1e6 / info.usPerFrame else 0.0
            VideoFeatures(r.media_id, nBytes, container_ok = true,
              info.codec, info.width, info.height, fps, info.frames.length.toLong,
              sampled.length, nDec,
              if (nDec > 0) lumaSum / nDec else 0.0,
              if (nDec > 0) entSum / nDec else 0.0)
          case None =>
            val (mean, entropy, _) = byteFeatures(r.media)
            VideoFeatures(r.media_id, nBytes, container_ok = false,
              "", 0, 0, 0.0, 0L, 0, 0, mean, entropy)
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
