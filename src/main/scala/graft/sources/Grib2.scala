package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream

/** From-scratch GRIB2 (WMO FM-92 edition 2) decoder — the last binary
  * format between raw NWP downloads and the rainfall/wind DataFrames
  * (reference: Rainfall_data.py:73-95 opens GEFS `pgrb2a` via cfgrib;
  * test fixtures: the vmax_10m.grib2.bz2 ICON-EU-EPS wind-gust files
  * under climada/hazard/test/data).
  *
  * Implemented per the public WMO specification:
  *  - sections 0-8, multi-message files, bz2 transport wrapping
  *  - grid definition 3.0 (regular lat/lon) and 3.101 (unstructured —
  *    point values only; ICON cell coordinates live in an external
  *    grid file by design)
  *  - product definition 4.0/4.1/4.8/4.11 (parameter, forecast time,
  *    ensemble member where present)
  *  - data representation 5.0 (simple packing), 5.2 (complex packing),
  *    5.3 (complex packing with 1st/2nd-order spatial differencing)
  *  - section 6 bitmaps (missing points become NaN)
  *
  * COVERAGE BOUNDARY: templates 5.0/5.2/5.3 cover every product the
  * reference pipeline ingests (GEFS `pgrb2a`/`pgrb2b` per
  * Rainfall_data.py:40-65 and the ECMWF/ICON fixtures). Template 5.40
  * (JPEG2000 packing, used by e.g. HRRR and some NOMADS products) is
  * intentionally NOT implemented — it needs a JPEG2000 codec the JDK
  * does not ship, and no reference source emits it; `decode` raises
  * a clear error naming the unsupported template so a future source
  * addition fails loudly at ingest, not silently downstream.
  *
  * All GRIB2 signed fields are sign-magnitude, not two's complement
  * (high bit = sign) — handled by `sm16`/`smN`.
  */
object Grib2 {

  /** One decoded field (= one GRIB message). `values` is in grid scan
    * order; NaN marks bitmap-masked points. */
  final case class Message(
      discipline: Int,
      paramCategory: Int,
      paramNumber: Int,
      productTemplate: Int,
      ensembleMember: Int, // -1 when the template has no member number
      timeUnit: Int,
      forecastTime: Long,
      gridTemplate: Int,
      grid: Option[LatLonGrid],
      values: Array[Double])

  /** Grid template 3.0 geometry (degrees, scanning mode bits raw). */
  final case class LatLonGrid(ni: Int, nj: Int, lat1: Double, lon1: Double,
                              lat2: Double, lon2: Double, di: Double,
                              dj: Double, scanMode: Int) {
    /** (lat, lon) of point i in scan order (+i, -j default scan 0x00;
      * bit 7: -i; bit 6: +j). */
    def latLon(idx: Int): (Double, Double) = {
      val row = idx / ni
      val colScan = idx % ni
      val iNeg = (scanMode & 0x80) != 0
      val jPos = (scanMode & 0x40) != 0
      val lon = if (iNeg) lon1 - colScan * di else lon1 + colScan * di
      val lat = if (jPos) lat1 + row * dj else lat1 - row * dj
      (lat, lon)
    }
  }

  private final class In(val b: Array[Byte]) {
    def u8(p: Int): Int = b(p) & 0xFF
    def u16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
    def u32(p: Int): Long =
      (u8(p).toLong << 24) | (u8(p + 1) << 16) | (u8(p + 2) << 8) | u8(p + 3)
    def u64(p: Int): Long = (u32(p) << 32) | u32(p + 4)
    def f32(p: Int): Float = java.lang.Float.intBitsToFloat(u32(p).toInt)
    /** sign-magnitude 16-bit */
    def sm16(p: Int): Int = {
      val v = u16(p)
      if ((v & 0x8000) != 0) -(v & 0x7FFF) else v
    }
  }

  private final class Bits(data: Array[Byte], var pos: Long) {
    def read(width: Int): Long = {
      var v = 0L
      var i = 0
      while (i < width) {
        val byte = data((pos >> 3).toInt) & 0xFF
        v = (v << 1) | ((byte >> (7 - (pos & 7)).toInt) & 1)
        pos += 1
        i += 1
      }
      v
    }
    /** sign-magnitude value of `width` bits */
    def readSm(width: Int): Long = {
      val v = read(width)
      val sign = 1L << (width - 1)
      if ((v & sign) != 0) -(v & (sign - 1)) else v
    }
  }

  def readFile(path: String): Seq[Message] = {
    val raw = Files.readAllBytes(Paths.get(path))
    read(decompress(raw))
  }

  /** Transparent bz2 unwrap (NOMADS and the climada fixtures ship
    * fields bz2-compressed). */
  def decompress(raw: Array[Byte]): Array[Byte] =
    if (raw.length > 3 && raw(0) == 'B' && raw(1) == 'Z' && raw(2) == 'h') {
      val in = new BZip2CompressorInputStream(
        new java.io.ByteArrayInputStream(raw))
      val out = new java.io.ByteArrayOutputStream(raw.length * 4)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } else raw

  def read(data: Array[Byte]): Seq[Message] = {
    val in = new In(data)
    val out = Seq.newBuilder[Message]
    var p = 0
    while (p + 16 <= data.length) {
      require(data(p) == 'G' && data(p + 1) == 'R' && data(p + 2) == 'I' &&
        data(p + 3) == 'B', s"GRIB magic not found at offset $p")
      require(in.u8(p + 7) == 2, s"GRIB edition ${in.u8(p + 7)}, expected 2")
      val discipline = in.u8(p + 6)
      val totalLen = in.u64(p + 8)
      out ++= decodeMessage(in, p, p + totalLen.toInt, discipline)
      p += totalLen.toInt
    }
    out.result()
  }

  /** Walk sections sequentially: GRIB2 allows sections 2-7 to repeat
    * within one message (one field per section-7 occurrence, inheriting
    * the most recent sections 3-6), so a field is emitted at every
    * section 7 rather than from a last-wins section map. */
  private def decodeMessage(in: In, start: Int, end: Int,
                            discipline: Int): Seq[Message] = {
    val out = Seq.newBuilder[Message]
    var q = start + 16
    var s3, s4, s5, s6 = -1
    var prevBitmap: Option[Array[Boolean]] = None
    while (q < end - 4) {
      val slen = in.u32(q).toInt
      require(slen > 4, s"corrupt section length $slen at offset $q")
      in.u8(q + 4) match {
        case 1 | 2 => // identification / local use — skipped
        case 3 => s3 = q
        case 4 => s4 = q
        case 5 => s5 = q
        case 6 => s6 = q
        case 7 =>
          require(s3 >= 0 && s4 >= 0 && s5 >= 0,
            "section 7 before sections 3/4/5")
          val (msg, bm) =
            decodeField(in, discipline, s3, s4, s5, s6, q, prevBitmap)
          if (bm.isDefined) prevBitmap = bm
          out += msg
        case other =>
          throw new UnsupportedOperationException(s"GRIB2 section $other")
      }
      q += slen
    }
    require(in.b(end - 4) == '7' && in.b(end - 3) == '7', "missing 7777 trailer")
    out.result()
  }

  /** Decode one field from its governing sections; returns the message
    * plus the bitmap actually applied (for indicator-254 reuse). */
  private def decodeField(in: In, discipline: Int, s3: Int, s4: Int,
                          s5: Int, s6: Int, s7: Int,
                          prevBitmap: Option[Array[Boolean]])
      : (Message, Option[Array[Boolean]]) = {
    // section 4: product definition -----------------------------------
    val tmpl4 = in.u16(s4 + 7)
    val cat = in.u8(s4 + 9)
    val num = in.u8(s4 + 10)
    // octet 18 (idx 17): time unit; octets 19-22: forecast time —
    // SIGNED (two's complement): analysis/reanalysis products encode
    // negative lead times.
    val (timeUnit, fcTime) = tmpl4 match {
      case 0 | 1 | 8 | 11 => (in.u8(s4 + 17), in.u32(s4 + 18).toInt.toLong)
      case _ => (-1, -1L)
    }
    val member = tmpl4 match {
      case 1 | 11 => in.u8(s4 + 35) // octet 36: perturbation number
      case _ => -1
    }

    // section 3: grid definition --------------------------------------
    val tmpl3 = in.u16(s3 + 12)
    val nPoints = in.u32(s3 + 6).toInt
    val grid = tmpl3 match {
      case 0 =>
        // template 3.0 regular lat/lon: octets 31-34 Ni, 35-38 Nj,
        // 47-50 lat1, 51-54 lon1, 56-59 lat2, 60-63 lon2, 64-67 Di,
        // 68-71 Dj, 72 scan mode; angles in 1e-6 degrees.
        def ang(off: Int): Double = {
          val v = in.u32(s3 + off)
          val sm = if ((v & 0x80000000L) != 0) -(v & 0x7FFFFFFFL) else v
          sm / 1e6
        }
        Some(LatLonGrid(
          ni = in.u32(s3 + 30).toInt, nj = in.u32(s3 + 34).toInt,
          lat1 = ang(46), lon1 = ang(50), lat2 = ang(55), lon2 = ang(59),
          di = ang(63), dj = ang(67), scanMode = in.u8(s3 + 71)))
      case 101 => None // unstructured (ICON): values in cell-id order
      case other =>
        throw new UnsupportedOperationException(s"grid template 3.$other")
    }

    // section 6: bitmap (indicator 254 = reuse the bitmap previously
    // applied in this message, per the section-6 octet-6 code table) --
    val bitmap: Option[Array[Boolean]] =
      if (s6 < 0) None
      else in.u8(s6 + 5) match {
        case 255 => None
        case 254 =>
          require(prevBitmap.isDefined,
            "bitmap indicator 254 with no previously defined bitmap")
          prevBitmap
        case 0 =>
          val bits = new Bits(in.b, (s6 + 6).toLong * 8)
          Some(Array.fill(nPoints)(bits.read(1) == 1L))
        case other =>
          throw new UnsupportedOperationException(s"bitmap indicator $other")
      }
    val nData = bitmap.map(_.count(identity)).getOrElse(nPoints)

    // section 5 + 7: data representation + data -----------------------
    val tmpl5 = in.u16(s5 + 9)
    val packed = tmpl5 match {
      case 0 => unpackSimple(in, s5, s7, nData)
      case 2 => unpackComplex(in, s5, s7, nData, spatialDiff = false)
      case 3 => unpackComplex(in, s5, s7, nData, spatialDiff = true)
      case other =>
        throw new UnsupportedOperationException(s"data template 5.$other")
    }

    val values = bitmap match {
      case None => packed
      case Some(mask) =>
        val full = new Array[Double](nPoints)
        var i = 0; var j = 0
        while (i < nPoints) {
          if (mask(i)) { full(i) = packed(j); j += 1 }
          else full(i) = Double.NaN
          i += 1
        }
        full
    }
    (Message(discipline, cat, num, tmpl4, member, timeUnit, fcTime,
      tmpl3, grid, values), bitmap)
  }

  /** Template 5.0: Y = (R + X * 2^E) / 10^D with X an nbits unsigned. */
  private def unpackSimple(in: In, s5: Int, s7: Int, n: Int): Array[Double] = {
    val r = in.f32(s5 + 11).toDouble
    val e = in.sm16(s5 + 15)
    val d = in.sm16(s5 + 17)
    val nbits = in.u8(s5 + 19)
    val scaleE = math.pow(2.0, e)
    val scaleD = math.pow(10.0, d)
    val bits = new Bits(in.b, (s7 + 5).toLong * 8)
    Array.fill(n) {
      val x = if (nbits == 0) 0L else bits.read(nbits)
      (r + x * scaleE) / scaleD
    }
  }

  /** Templates 5.2/5.3: group-split complex packing, optionally with
    * spatial differencing (order 1 or 2). Group refs/widths/lengths per
    * WMO regulation 92.9.4; the last group's true length replaces the
    * computed one. */
  private def unpackComplex(in: In, s5: Int, s7: Int, n: Int,
                            spatialDiff: Boolean): Array[Double] = {
    val r = in.f32(s5 + 11).toDouble
    val e = in.sm16(s5 + 15)
    val d = in.sm16(s5 + 17)
    val nbits = in.u8(s5 + 19)
    // template 5.2 layout (octet k = index k-1): 22 split method,
    // 23 missing mgmt, 24-31 missing substitutes, 32-35 NG, 36 group
    // width reference, 37 bits per group width, 38-41 group length
    // reference, 42 length increment, 43-46 last group true length,
    // 47 bits per scaled group length; 5.3 adds 48 sd order, 49 sd octets
    val missingMgmt = in.u8(s5 + 22)
    require(missingMgmt == 0,
      s"complex-packing missing-value management $missingMgmt not supported")
    val ng = in.u32(s5 + 31).toInt
    val refGroupWidth = in.u8(s5 + 35)
    val bitsGroupWidth = in.u8(s5 + 36)
    val refGroupLen = in.u32(s5 + 37)
    val lenIncrement = in.u8(s5 + 41)
    val lastGroupLen = in.u32(s5 + 42)
    val bitsGroupLen = in.u8(s5 + 46)

    val (sdOrder, sdOctets) =
      if (spatialDiff) (in.u8(s5 + 47), in.u8(s5 + 48)) else (0, 0)

    val bits = new Bits(in.b, (s7 + 5).toLong * 8)

    // spatial-differencing preamble: sdOrder initial values + overall min
    var iv1 = 0L
    var iv2 = 0L
    var gmin = 0L
    if (spatialDiff) {
      iv1 = bits.readSm(sdOctets * 8)
      if (sdOrder == 2) iv2 = bits.readSm(sdOctets * 8)
      gmin = bits.readSm(sdOctets * 8)
    }

    val groupRefs = Array.fill(ng)(if (nbits == 0) 0L else bits.read(nbits))
    bits.pos = (bits.pos + 7) & ~7L
    val groupWidths = Array.fill(ng)(
      refGroupWidth + (if (bitsGroupWidth == 0) 0L else bits.read(bitsGroupWidth)))
    bits.pos = (bits.pos + 7) & ~7L
    // Data template 7.2/7.3 encodes NG scaled group lengths — including
    // a placeholder for the last group, whose true length then comes
    // from template-5.2 octets 43-46. Read (and discard) all NG so the
    // bit cursor lands on the right byte-align boundary, then override
    // the last entry (g2clib/wgrib2/eccodes do the same).
    val groupLens = Array.fill(ng)(
      refGroupLen + lenIncrement *
        (if (bitsGroupLen == 0) 0L else bits.read(bitsGroupLen)))
    groupLens(ng - 1) = lastGroupLen
    bits.pos = (bits.pos + 7) & ~7L

    val x = new Array[Long](n)
    var idx = 0
    var g = 0
    while (g < ng) {
      val w = groupWidths(g).toInt
      val len = groupLens(g).toInt
      var k = 0
      while (k < len) {
        require(idx < n, s"complex packing overflow: group $g")
        x(idx) = groupRefs(g) + (if (w == 0) 0L else bits.read(w))
        idx += 1
        k += 1
      }
      g += 1
    }
    require(idx == n, s"complex packing decoded $idx of $n values")

    if (spatialDiff) {
      // undo differencing: x holds g-differences (first sdOrder values
      // are the initial field values, already absolute)
      var i = if (sdOrder == 2) 2 else 1
      while (i < n) { x(i) += gmin; i += 1 }
      if (sdOrder == 1) {
        x(0) = iv1
        var i = 1
        while (i < n) { x(i) += x(i - 1); i += 1 }
      } else {
        x(0) = iv1
        if (n > 1) x(1) = iv2
        var i = 2
        while (i < n) { x(i) += 2 * x(i - 1) - x(i - 2); i += 1 }
      }
    }

    val scaleE = math.pow(2.0, e)
    val scaleD = math.pow(10.0, d)
    x.map(v => (r + v * scaleE) / scaleD)
  }
}
