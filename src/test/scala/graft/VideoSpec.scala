package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.MediaRow

/** The AVI/MJPEG video path (x68): from-scratch RIFF container walk →
  * frame sampling → per-frame JPEG decode through the bomb-guarded
  * image path. Real JPEG frames here (the probe certifies container
  * arithmetic with ASCII payloads; this spec certifies the decode
  * composition), plus hand-built hostile containers. */
class VideoSpec extends SparkTestBase {
  import spark.implicits._

  /** A real JPEG of a solid-gray w×h frame via javax.imageio. */
  private def grayJpeg(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("container roundtrip: synthesized AVI parses back exactly") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5), Array[Byte](6))
    val avi = MultimodalOps.synthAviMjpeg(frames, 64, 48, 40000L)
    val info = MultimodalOps.parseAvi(avi).get
    assert(info.width === 64 && info.height === 48)
    assert(info.usPerFrame === 40000L && info.declFrames === 3L)
    assert(info.frames.length === 3)
    val got = info.frames.map { case (o, l) => avi.slice(o, o + l).toSeq }
    assert(got === frames.map(_.toSeq))
  }

  test("MJPEG frames decode through the image path with correct luma") {
    val frames = Seq(grayJpeg(32, 24, 200), grayJpeg(32, 24, 60),
      grayJpeg(32, 24, 128))
    val media = Seq(MediaRow(1L,
      MultimodalOps.synthAviMjpeg(frames, 32, 24, 33333L), "avi", 0, 0)).toDS()
    val vf = MultimodalOps.extractVideoFeatures(media).collect().head
    assert(vf.container_ok && vf.n_frames === 3L && vf.n_decoded === 3)
    // solid-gray JPEG decodes to (approximately) that gray everywhere
    assert(math.abs(vf.mean_luma - (200 + 60 + 128) / 3.0) < 4.0)
    assert(vf.mean_entropy < 1.0) // flat frames carry ~no information
    // frame sampling: every 2nd frame → indices 0, 2
    val fr = MultimodalOps.sampleVideoFrames(media, everyN = 2)
      .select("frame_idx").as[Int].collect().sorted
    assert(fr.toSeq === Seq(0, 2))
  }

  test("non-MJPEG AVI surfaces its codec fourcc instead of an " +
      "indistinguishable empty decode") {
    // a DivX-style AVI: valid container, strh declares the codec, and
    // the frame payloads are NOT JPEGs — decode must report the codec
    // so downstream can tell "unsupported codec" from "corrupt MJPEG"
    val divx = MultimodalOps.synthAviMjpeg(
      Seq(Array[Byte](1, 2, 3, 4), Array[Byte](5, 6)), 64, 48, 40000L,
      codec = Some("DIV3"))
    val info = MultimodalOps.parseAvi(divx).get
    assert(info.codec === "DIV3" && info.frames.length === 2)
    val media = Seq(
      MediaRow(1L, divx, "avi", 0, 0),
      MediaRow(2L, MultimodalOps.synthAviMjpeg(
        Seq(grayJpeg(16, 16, 90)), 16, 16, 40000L, codec = Some("MJPG")),
        "avi", 0, 0),
      // legacy strh-less fixture: codec is empty, everything else works
      MediaRow(3L, MultimodalOps.synthAviMjpeg(
        Seq(grayJpeg(16, 16, 90)), 16, 16, 40000L), "avi", 0, 0)).toDS()
    val out = MultimodalOps.extractVideoFeatures(media)
      .collect().map(v => v.media_id -> v).toMap
    assert(out(1L).container_ok && out(1L).codec === "DIV3")
    assert(out(1L).n_frames === 2L && out(1L).n_decoded === 0)
    assert(out(2L).codec === "MJPG" && out(2L).n_decoded === 1)
    assert(out(3L).codec === "" && out(3L).n_decoded === 1)
  }

  test("non-AVI payloads fall back to byte features, container_ok=false") {
    val media = Seq(
      MediaRow(1L, "definitely not a riff".getBytes, "txt", 0, 0),
      MediaRow(2L, null, null, 0, 0)).toDS()
    val out = MultimodalOps.extractVideoFeatures(media)
      .collect().map(v => v.media_id -> v).toMap
    assert(!out(1L).container_ok && out(1L).n_frames === 0L)
    assert(out(1L).mean_entropy > 0.0) // byte fallback ran
    assert(!out(2L).container_ok && out(2L).n_bytes === 0)
  }

  test("hostile containers: truncation, size bombs, zero chunks, depth bombs") {
    val good = MultimodalOps.synthAviMjpeg(
      Seq(Array[Byte](9, 9, 9, 9), Array[Byte](8, 8)), 16, 16, 40000L)
    // truncated mid-movi: frames parsed up to the cut, no crash
    val cut = good.take(good.length - 3)
    val info = MultimodalOps.parseAvi(cut).get
    assert(info.frames.length === 1 && info.width === 16)
    // chunk size near 2^32: Long math, walk just ends
    val bomb = good.clone()
    val lastChunk = bomb.length - 10
    assert(MultimodalOps.parseAvi(bomb).isDefined)
    bomb(lastChunk) = 0xff.toByte; bomb(lastChunk + 1) = 0xff.toByte
    bomb(lastChunk + 2) = 0xff.toByte; bomb(lastChunk + 3) = 0xff.toByte
    MultimodalOps.parseAvi(bomb) // must not throw or allocate wild
    def le32(n: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n).array()
    // a run of zero-size chunks must terminate (8-byte advance each)
    val zeros = Array.fill(400)(0.toByte)
    val zr = "RIFF".getBytes ++ le32(400 + 4) ++ "AVI ".getBytes ++ zeros
    assert(MultimodalOps.parseAvi(zr).get.frames.isEmpty)
    // LIST-of-LIST nesting beyond the depth cap: parses, no overflow,
    // and the frame chunk buried 40 levels deep stays UNcollected
    var nested: Array[Byte] = "00dc".getBytes ++ le32(4) ++ Array[Byte](1, 2, 3, 4)
    for (_ <- 0 until 40)
      nested = "LIST".getBytes ++ le32(nested.length + 4) ++
        "mvi ".getBytes ++ nested
    val deep = "RIFF".getBytes ++ le32(nested.length + 4) ++
      "AVI ".getBytes ++ nested
    assert(MultimodalOps.parseAvi(deep).get.frames.isEmpty)
    // maxFrames caps collection from a crafted many-chunk file
    val many = MultimodalOps.synthAviMjpeg(
      Seq.fill(100)(Array[Byte](1)), 8, 8, 40000L)
    assert(MultimodalOps.parseAvi(many, maxFrames = 7).get.frames.length === 7)
  }

  test("plan: video extraction is map-only, no shuffle") {
    val media = Seq(MediaRow(1L,
      MultimodalOps.synthAviMjpeg(Seq(Array[Byte](1)), 8, 8, 40000L),
      "avi", 0, 0)).toDS()
    val p1 = MultimodalOps.extractVideoFeatures(media)
      .queryExecution.executedPlan.toString
    val p2 = MultimodalOps.sampleVideoFrames(media)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), p1)
    assert(!p2.contains("Exchange"), p2)
  }
}
