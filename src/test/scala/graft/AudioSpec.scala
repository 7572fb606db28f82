package graft

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.{MediaRow, DecodedAudio}

/** Audio decode (`javax.sound.sampled`, JDK-only): PCM roundtrips,
  * stereo, truncated/hostile fixtures, and the declared-length bomb
  * guard — the audio twin of the image decode specs. */
class AudioSpec extends SparkTestBase {

  private def le16Wav(sr: Int, samples: Array[Int], ch: Int = 1) =
    MultimodalOps.synthWavPcm16(sr, samples, ch)

  test("PCM16 mono roundtrips bit-exactly through decode") {
    val raw = Array(0, 1, -1, 32767, -32768, 12345, -12345)
    val got = MultimodalOps.decodeAudio(le16Wav(8000, raw)).get
    assert(got.sampleRate === 8000 && got.channels === 1 && got.nFrames === 7L)
    assert(got.samples.toSeq === raw.map(_.toDouble / 32768).toSeq)
    assert(got.clipCount === 2L) // 32767 and -32768 are full scale
  }

  test("stereo interleave: frames = samples / channels") {
    val raw = Array(100, -100, 200, -200, 300, -300) // 3 frames of L,R
    val got = MultimodalOps.decodeAudio(le16Wav(44100, raw, ch = 2)).get
    assert(got.channels === 2 && got.nFrames === 3L)
    assert(got.samples.length === 6)
  }

  test("truncated payload decodes the frames actually present") {
    val full = le16Wav(8000, Array.fill(1000)(5000))
    val truncated = full.take(44 + 200) // header claims 1000, data has 100
    val got = MultimodalOps.decodeAudio(truncated).get
    assert(got.nFrames === 100L)
    assert(got.samples.forall(_ == 5000.0 / 32768))
  }

  test("bomb guard: a tiny payload declaring 2^30 frames is refused unread") {
    // hand-corrupt the header: data-chunk size claims ~2 GiB
    val wav = le16Wav(8000, Array.fill(10)(1))
    val bb = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue - 100) // "data" size field
    assert(MultimodalOps.decodeAudio(wav, maxSamples = 1 << 20) === None)
    // and a legitimate clip under the cap still decodes
    assert(MultimodalOps.decodeAudio(le16Wav(8000, Array.fill(10)(1)),
      maxSamples = 1 << 20).isDefined)
  }

  test("hostile bytes are data, not exceptions") {
    assert(MultimodalOps.decodeAudio(null) === None)
    assert(MultimodalOps.decodeAudio(Array.emptyByteArray) === None)
    assert(MultimodalOps.decodeAudio("not audio at all".getBytes) === None)
    assert(MultimodalOps.decodeAudio(Array.fill(100)(0x42.toByte)) === None)
    // a valid RIFF magic with garbage body
    val junk = "RIFF....WAVEjunkjunkjunk".getBytes
    assert(MultimodalOps.decodeAudio(junk) === None)
  }

  test("extractAudioFeatures: decoded rows carry exact level stats, corrupt rows fall back") {
    import spark.implicits._
    val samples = Array(16384, -16384, 32767, -32768) // |v| = .5,.5,~1,1
    val media = Seq(
      MediaRow(1L, le16Wav(8000, samples), "wav", 0, 0),
      MediaRow(2L, "definitely not a wav".getBytes, "txt", 0, 0),
      MediaRow(3L, null, null, 0, 0)).toDS()
    val got = MultimodalOps.extractAudioFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    val f1 = got(1L)
    assert(f1.decoded && f1.sample_rate === 8000 && f1.n_frames === 4L)
    val expSumSq = samples.map(v => math.pow(v.toDouble / 32768, 2)).sum
    assert(f1.rms === math.sqrt(expSumSq / 4))
    assert(f1.peak === 1.0)
    assert(f1.clipping_frac === 0.5) // two of four samples at full scale
    assert(f1.duration_s === 4.0 / 8000)
    assert(!got(2L).decoded && got(2L).n_bytes === 20)
    assert(!got(3L).decoded && got(3L).n_bytes === 0)
  }

  test("big-endian AIFF decodes through the same path") {
    import javax.sound.sampled._
    val raw = Array[Int](1000, -1000, 32767, -32768)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, true) // big-endian PCM16
    val data = java.nio.ByteBuffer.allocate(raw.length * 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    raw.foreach(v => data.putShort(v.toShort))
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data.array()), fmt, raw.length)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
    val got = MultimodalOps.decodeAudio(bos.toByteArray).get
    assert(got.samples.toSeq === raw.map(_.toDouble / 32768).toSeq)
    assert(got.nFrames === 4L && got.clipCount === 2L)
  }

  test("8-bit unsigned PCM normalizes around the 128 midpoint") {
    // hand-build an 8-bit unsigned WAV (javax reads PCM_UNSIGNED for 8-bit)
    val samples = Array[Int](128, 0, 255, 192)
    val dataLen = samples.length
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(v => out.put(v.toByte))
    val got = MultimodalOps.decodeAudio(out.array()).get
    assert(got.samples.toSeq === Seq(0.0, -1.0, 127.0 / 128, 0.5))
    assert(got.clipCount === 2L) // 0 → -128 and 255 → 127 are full scale
  }
}
