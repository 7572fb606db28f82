package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bufr, Grib2, Hdf5File, Rds}

/** Hostile-input behavior of the from-scratch binary decoders: a
  * truncated or magic-corrupted file must fail with a clean
  * `Exception` — never hang, never return silent garbage, and never
  * throw an `Error` (a corrupt length field that drives a huge
  * allocation would surface as OutOfMemoryError and fail these tests
  * by propagating past `intercept[Exception]`). At 100 TB a decoder
  * sits behind `binaryFile` flat-maps over untrusted bytes; one
  * malformed blob must fail its task with a diagnosable message, not
  * poison the executor. */
class HostileInputSpec extends AnyFunSuite {

  private val dataDir =
    "/root/reference/IBF-Typhoon-model/src/climada/hazard/test/data"
  private val bufrPath = s"$dataDir/tracks_22S_HEROLD_2020031912.det.bufr4"
  private val gribPath =
    s"$dataDir/test_storm_europe_icon_2021012800_001_vmax_10m.grib2.bz2"
  private val rdsPath =
    "/root/reference/IBF-Typhoon-model/models/operational/xgboost_regression_v4.RDS"
  private val ncPath = s"$dataDir/1988021S12080.nc"

  private def bytesOf(path: String): Option[Array[Byte]] = {
    val p = Paths.get(path)
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }

  private def truncations(b: Array[Byte]): Seq[Array[Byte]] =
    Seq(4, 17, b.length / 2, b.length - 3)
      .filter(n => n > 0 && n < b.length)
      .map(n => java.util.Arrays.copyOfRange(b, 0, n))

  private def corruptHead(b: Array[Byte]): Array[Byte] = {
    val c = b.clone(); c(0) = (c(0) ^ 0x5A).toByte; c
  }

  test("BUFR: truncations and corrupted magic fail with clean exceptions") {
    bytesOf(bufrPath) match {
      case None => cancel("reference BUFR fixture not present")
      case Some(b) =>
        truncations(b).foreach(t => intercept[Exception](Bufr.decode(t)))
        intercept[Exception](Bufr.decode(corruptHead(b)))
    }
  }

  test("GRIB2/bz2: truncations and corrupted stream fail with clean exceptions") {
    bytesOf(gribPath) match {
      case None => cancel("reference GRIB2 fixture not present")
      case Some(bz) =>
        truncations(bz).foreach { t =>
          intercept[Exception] {
            val msgs = Grib2.read(Grib2.decompress(t))
            // a cut landing exactly on a message boundary could parse
            // clean prefixes; demand the full fixture's field count
            require(msgs.length >= Grib2.read(Grib2.decompress(bz)).length,
              "truncated stream decoded fewer fields")
          }
        }
        // corrupt the GRIB magic on the DECOMPRESSED bytes
        val raw = Grib2.decompress(bz)
        intercept[Exception](Grib2.read(corruptHead(raw)))
    }
  }

  test("HDF5: truncations and corrupted signature fail cleanly") {
    bytesOf(ncPath) match {
      case None => cancel("reference NetCDF4 fixture not present")
      case Some(b) =>
        truncations(b).foreach { t =>
          intercept[Exception] {
            val f = new Hdf5File(t)
            f.list("/").foreach(n => f.readDoubles("/" + n))
          }
        }
        intercept[Exception] {
          val f = new Hdf5File(corruptHead(b))
          f.list("/").foreach(n => f.readDoubles("/" + n))
        }
    }
  }

  test("image decode: decompression bomb rejected from the header, garbage is None") {
    import graft.multimodal.MultimodalOps
    // a real 4x4 PNG decodes...
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert(MultimodalOps.decodeImage(png).isDefined)
    // ...but not when its declared pixel count exceeds the cap: the
    // guard must reject BEFORE allocating the raster
    assert(MultimodalOps.decodeImage(png, maxPixels = 15).isEmpty)
    // truncated and garbage payloads are None, never exceptions
    assert(MultimodalOps.decodeImage(png.take(12)).isEmpty)
    assert(MultimodalOps.decodeImage(Array.fill[Byte](64)(0x41)).isEmpty)
    assert(MultimodalOps.decodeImage(null).isEmpty)
  }

  test("regex text operators: pathological inputs terminate fast (no catastrophic backtracking)") {
    // the PII/HTML patterns run inside per-row codegen over untrusted
    // crawl text — a quantifier arrangement with exponential
    // backtracking would stall an executor core on one hostile row.
    // All quantifier nests are bounded by construction; prove it on
    // the classic detonators.
    import java.util.regex.Pattern
    val patterns = Seq(
      graft.operators.PiiOps.Ipv4Pattern,
      graft.operators.PiiOps.PhonePattern,
      graft.operators.PiiOps.EmailPattern,
      graft.operators.TextOps.BlockTagPattern,
      graft.operators.TextOps.PreTokenPattern).map(Pattern.compile)
    val inputs = Seq(
      "1." * 50000,            // dotted digits that never form a quad
      "+1 " + "11 " * 20000,   // endless separator-group chain
      "+" + "1" * 100000,      // huge contiguous digit run
      "a@" * 50000,            // email-ish churn, host never completes
      "<" * 100000,            // unclosed tags
      "<!--" + "x" * 50000,    // unclosed comment body
      "." * 100000)
    for (p <- patterns; in <- inputs) {
      val t0 = System.nanoTime()
      val m = p.matcher(in)
      while (m.find()) ()
      val ms = (System.nanoTime() - t0) / 1000000
      assert(ms < 2000,
        s"pattern '${p.pattern().take(30)}…' took ${ms}ms on a ${in.length}-char detonator")
    }
  }

  test("linear kernels: adversarial wall-time pins (glob + PII)") {
    // The glob and PII kernels are fuzz-pinned for VALUE equivalence
    // elsewhere; this pins their RUNTIME on the worst shapes so a
    // future regression to a backtracking engine fails CI by timeout/
    // assertion, not only by review.
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    import graft.expressions.{GlobMatchOps, PiiScanOps}
    import graft.operators.Robots

    // 8 KiB path x max-wildcard 4 KiB pattern: the per-pair worst
    // case (~33M char ops for the two-pointer kernel; an exponential
    // backtracker would not return within the age of the universe)
    val path8k = u8("/" + "a" * 8191)
    val maxStars = u8("/" + "a*" * ((Robots.MaxPatternChars - 2) / 2) + "b")
    val t0 = System.nanoTime()
    assert(!GlobMatchOps.robotsMatch(path8k, maxStars))
    val msPair = (System.nanoTime() - t0) / 1000000
    assert(msPair < 2000, s"glob worst-case pair took ${msPair}ms")

    // a fully hostile HOST: the documented budget is 8 KiB path x
    // MaxPatternCharsPerHost summed patterns (~5e8 char ops) — the
    // whole rule list must clear in seconds on one core
    val rules = (1 to Robots.MaxPatternCharsPerHost / Robots.MaxPatternChars)
      .map(i => u8(s"/$i" + "a*" * ((Robots.MaxPatternChars - 8) / 2)))
    val t1 = System.nanoTime()
    rules.foreach(r => GlobMatchOps.robotsMatch(path8k, r))
    val msHost = (System.nanoTime() - t1) / 1000000
    assert(msHost < 15000, s"hostile host's full rule budget took ${msHost}ms")

    // PII kernels on megabyte anchor-dense rows: every position is an
    // anchor candidate (digit runs for IPv4/phone, '@' churn for
    // email) — the anchored kernels stay linear, java.util.regex's
    // attempt-at-every-position would go quadratic
    val detonators = Seq(
      "1" * 1000000,          // one megabyte digit run
      "1." * 500000,          // dotted digits, quad never completes
      "a@" * 500000,          // every other char an email anchor
      "1.2.3." * 166000)      // near-miss quads back to back
    detonators.foreach { d =>
      val t2 = System.nanoTime()
      PiiScanOps.scan(u8(d))
      val ms = (System.nanoTime() - t2) / 1000000
      assert(ms < 3000, s"pii_scan took ${ms}ms on a ${d.length}-char detonator")
    }
  }

  test("RDS: truncations and corrupted magic fail cleanly") {
    bytesOf(rdsPath) match {
      case None => cancel("reference RDS artifact not present")
      case Some(gz) =>
        truncations(gz).foreach(t =>
          intercept[Exception](Rds.firstRaw(Rds.gunzip(t))))
        val raw = Rds.gunzip(gz)
        intercept[Exception](Rds.firstRaw(corruptHead(raw)))
    }
  }
}
