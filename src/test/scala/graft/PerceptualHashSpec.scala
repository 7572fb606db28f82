package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.multimodal.{MultimodalOps, PerceptualHash}
import graft.multimodal.MultimodalOps.MediaRow

/** Perceptual hashing through the REAL image decode path (the x89/x90
  * oracles run the raster fallback — SQL cannot decode PNG): decode
  * equivalence, perturbation behavior, and banding completeness
  * against brute force.
  */
class PerceptualHashSpec extends SparkTestBase {

  private def grayPng(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pix(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hashOf(media: Array[Byte], w: Int = 0, h: Int = 0): (Long, Long) = {
    val Some((pw, ph, luma)) = PerceptualHash.lumaPlane(media, w, h)
    (PerceptualHash.dhash64(luma, pw, ph), PerceptualHash.ahash64(luma, pw, ph))
  }

  private def pix(x: Int, y: Int): Int = (x * x * 7 + y * y * 13 + x * y * 5) % 256

  test("PNG decode and raster8 fallback produce the same hash for the same pixels") {
    val w = 20; val h = 14
    val png = hashOf(grayPng(w, h, pix))
    val raster = hashOf(Array.tabulate(w * h)(i =>
      pix(i % w, i / w).toByte), w, h)
    assert(png === raster)
  }

  test("identical images hash identically; small perturbation stays near") {
    val w = 32; val h = 24
    val a = hashOf(grayPng(w, h, pix))
    val b = hashOf(grayPng(w, h, pix))
    assert(a === b)
    val bumped = hashOf(grayPng(w, h, (x, y) =>
      if (x == 0 && y == 0) (pix(x, y) + 4) % 256 else pix(x, y)))
    val dh = java.lang.Long.bitCount(a._1 ^ bumped._1)
    assert(dh <= 3, s"one-pixel bump moved dhash by $dh bits")
  }

  test("structurally different images land far apart") {
    val w = 32; val h = 24
    val a = hashOf(grayPng(w, h, pix))
    val inv = hashOf(grayPng(w, h, (x, y) => 255 - pix(x, y)))
    val shifted = hashOf(grayPng(w, h, (x, y) => pix((x + 11) % w, (y + 7) % h)))
    assert(java.lang.Long.bitCount(a._1 ^ inv._1) > 16)
    assert(java.lang.Long.bitCount(a._1 ^ shifted._1) > 16)
  }

  test("hash is resolution-stable (same scene, different sampling)") {
    // the same smooth scene rendered at two sizes: resample grids
    // land on nearby source pixels, so hashes stay close (the whole
    // point of perceptual hashing)
    def scene(w: Int, h: Int)(x: Int, y: Int): Int =
      (255 * (x * 2 + y) + (w + h) / 2) / (w * 2 + h)
    val small = hashOf(grayPng(24, 18, scene(24, 18)))
    val large = hashOf(grayPng(48, 36, scene(48, 36)))
    assert(java.lang.Long.bitCount(small._1 ^ large._1) <= 6)
  }

  test("nearDupPairs finds exactly the brute-force Hamming<=3 pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val base = Array.tabulate(30 * 20)(_ => rnd.nextInt(256).toByte)
    val rows = (0L until 12L).map { id =>
      val m = base.clone()
      // ids 0..3: tiny perturbations of the same image; 4..11 random
      if (id >= 4) (0 until 600).foreach(i => m(i) = rnd.nextInt(256).toByte)
      else (0 until id.toInt).foreach(i => m(i * 37) = (m(i * 37) + 2).toByte)
      MediaRow(id, m, "raster8", 30, 20)
    }
    val media = rows.toDS()
    val hashes = PerceptualHash.phashes(media)
    val got = PerceptualHash.nearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val brute = (for {
      a <- 0L until 12L; b <- a + 1 until 12L
      if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 3
    } yield (a, b)).toSet
    assert(got === brute)
    assert(got.contains((0L, 1L))) // the planted family surfaces
  }

  test("undecodable rows are excluded from near-dup, flagged in phashes") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "not an image".getBytes, "bin", 0, 0),
      MediaRow(2L, null, "bin", 0, 0),
      MediaRow(3L, grayPng(8, 8, pix), "png", 0, 0))
    val hashes = PerceptualHash.phashes(rows.toDS())
    val byId = hashes.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(byId === Map(1L -> false, 2L -> false, 3L -> true))
    assert(PerceptualHash.nearDupPairs(hashes).count() === 0)
  }

  test("decompression-bomb guard holds for the hash path") {
    // oversized declared raster (width*height > maxPixels) refuses
    val r = PerceptualHash.lumaPlane(new Array[Byte](100), 100000, 100000)
    assert(r.isEmpty)
  }
}
