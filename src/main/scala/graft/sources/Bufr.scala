package graft.sources

import java.nio.file.{Files, Paths}

/** From-scratch BUFR edition-4 decoder — the binary layer under the
  * reference's ECMWF tropical-cyclone track ingestion
  * (tc_tracks_forecast.py `read_one_bufr_tc`, which shells out to
  * pybufrkit; SURVEY.md §2.1 S2). Covers what the ECEP TC template
  * uses, implemented from the public WMO FM-94 spec:
  *
  *  - sections 0–5, edition 4, optional section 2;
  *  - element descriptors (F=0) against an embedded WMO Table B
  *    subset; sequence descriptors (F=3) for the date/time/position
  *    sequences; fixed and delayed replication (F=1, incl. 031001);
  *    change-data-width operators 201YYY (F=2);
  *  - uncompressed multi-subset payloads AND the BUFR compression
  *    scheme (per-element base value + 6-bit increment width +
  *    per-subset increments, with the character-data special case);
  *  - missing values (all-ones patterns) → None.
  *
  * Values are returned decoded (scale/reference applied) per subset,
  * in descriptor order — the same flat stream the reference's
  * flat-text-render parser walks, minus the text round-trip.
  */
object Bufr {

  /** Table B entry: scale, reference, bit width, isString. */
  final case class Element(scale: Int, ref: Int, width: Int, isString: Boolean = false)

  /** WMO Table B subset for the ECMWF TC track template (descriptor →
    * (scale, ref, width)). Public WMO tables; widths verified bit-exact
    * against the reference's BUFR fixtures. */
  val TableB: Map[Int, Element] = Map(
    1025  -> Element(0, 0, 24, isString = true),  // storm identifier
    1027  -> Element(0, 0, 80, isString = true),  // WMO long storm name
    1032  -> Element(0, 0, 8),                    // generating application
    1033  -> Element(0, 0, 8),                    // originating centre
    1034  -> Element(0, 0, 8),                    // originating sub-centre
    1090  -> Element(0, 0, 8),                    // technique for perturbations
    1091  -> Element(0, 0, 10),                   // ensemble member number
    1092  -> Element(0, 0, 8),                    // ensemble forecast type
    4001  -> Element(0, 0, 12),                   // year
    4002  -> Element(0, 0, 4),                    // month
    4003  -> Element(0, 0, 6),                    // day
    4004  -> Element(0, 0, 5),                    // hour
    4005  -> Element(0, 0, 6),                    // minute
    4024  -> Element(0, -2048, 12),               // time period (hours)
    5002  -> Element(2, -9000, 15),               // latitude (coarse)
    5021  -> Element(2, 0, 16),                   // bearing/azimuth
    6002  -> Element(2, -18000, 16),              // longitude (coarse)
    8005  -> Element(0, 0, 4),                    // met. attribute significance
    8021  -> Element(0, 0, 5),                    // time significance
    10051 -> Element(-1, 0, 14),                  // pressure reduced to MSL (Pa)
    11012 -> Element(1, 0, 12),                   // wind speed at 10 m (m/s)
    19003 -> Element(0, 0, 8),                    // wind speed threshold (m/s)
    19004 -> Element(-3, 0, 12),                  // radius of wind above threshold (m)
    31001 -> Element(0, 0, 8))                    // delayed descriptor replication factor

  /** Table D sequences used by the template. */
  val TableD: Map[Int, Seq[Int]] = Map(
    301011 -> Seq(4001, 4002, 4003),   // year month day
    301012 -> Seq(4004, 4005),         // hour minute
    301023 -> Seq(5002, 6002))         // lat lon coarse

  /** One decoded element occurrence. */
  final case class Value(descriptor: Int, num: Option[Double], str: Option[String])

  final case class Message(
      centre: Int, subCentre: Int,
      year: Int, month: Int, day: Int, hour: Int, minute: Int,
      nSubsets: Int, compressed: Boolean,
      subsets: Seq[Seq[Value]])

  // -- bit reader --------------------------------------------------------

  private final class BitReader(data: Array[Byte], var pos: Long) {
    def read(width: Int): Long = {
      var v = 0L
      var i = 0
      while (i < width) {
        val byteIdx = ((pos + i) >> 3).toInt
        val bitIdx = ((pos + i) & 7).toInt
        v = (v << 1) | ((data(byteIdx) >> (7 - bitIdx)) & 1)
        i += 1
      }
      pos += width
      v
    }
    def readBytes(width: Int): Array[Byte] =
      Array.fill(width / 8)(read(8).toByte)
  }

  private def missing(width: Int): Long = (1L << width) - 1

  def decode(path: String): Message = decode(Files.readAllBytes(Paths.get(path)))

  def decode(d: Array[Byte]): Message = {
    require(new String(d, 0, 4, "US-ASCII") == "BUFR", "not a BUFR message")
    def u24(o: Int) = ((d(o) & 0xff) << 16) | ((d(o + 1) & 0xff) << 8) | (d(o + 2) & 0xff)
    require((d(7) & 0xff) == 4, s"only BUFR edition 4 supported, got ${d(7) & 0xff}")
    var off = 8
    val l1 = u24(off)
    val centre = ((d(off + 4) & 0xff) << 8) | (d(off + 5) & 0xff)
    val subCentre = ((d(off + 6) & 0xff) << 8) | (d(off + 7) & 0xff)
    val hasSec2 = (d(off + 9) & 0x80) != 0
    val year = ((d(off + 15) & 0xff) << 8) | (d(off + 16) & 0xff)
    val (month, day, hour, minute) =
      (d(off + 17) & 0xff, d(off + 18) & 0xff, d(off + 19) & 0xff, d(off + 20) & 0xff)
    off += l1
    if (hasSec2) off += u24(off)
    val l3 = u24(off)
    val nSubsets = ((d(off + 4) & 0xff) << 8) | (d(off + 5) & 0xff)
    val compressed = (d(off + 6) & 0x40) != 0
    val rawDescriptors = (0 until (l3 - 7) / 2).map { i =>
      val v = ((d(off + 7 + 2 * i) & 0xff) << 8) | (d(off + 8 + 2 * i) & 0xff)
      (v >> 14, (v >> 8) & 0x3f, v & 0xff) // (F, X, Y)
    }.takeWhile { case (f, x, y) => !(f == 0 && x == 0 && y == 0) } // trailing pad
    off += l3
    val l4 = u24(off)
    // bounds-check BEFORE copyOfRange: it silently ZERO-PADS when the
    // requested end runs past a truncated buffer, which would decode
    // a cut-off file into garbage zeros instead of failing. The +4
    // accounts for the section-5 "7777" trailer.
    require(off + l4 + 4 <= d.length,
      s"BUFR truncated: section 4 claims ${l4} bytes at offset $off " +
        s"but only ${d.length - off} remain (incl. 7777 trailer)")
    require(new String(d, off + l4, 4, "US-ASCII") == "7777",
      "BUFR missing 7777 end section")
    val payload = java.util.Arrays.copyOfRange(d, off + 4, off + l4)
    val reader = new BitReader(payload, 0)

    var lastReplicationFactor = 0

    // interpret the descriptor stream for one pass; `emit` is called
    // for each element occurrence in order
    def runDescriptors(emit: (Int, Element) => Unit): Unit = {
      var widthDelta = 0
      def exec(descs: List[(Int, Int, Int)]): Unit = descs match {
        case Nil => ()
        case (f, x, y) :: rest => f match {
          case 0 =>
            val code = x * 1000 + y
            val e = TableB.getOrElse(code,
              throw new NoSuchElementException(f"Table B 0-$x%02d-$y%03d not embedded"))
            val eff = if (e.isString) e else e.copy(width = e.width + widthDelta)
            emit(code, eff)
            exec(rest)
          case 1 =>
            val (body, after) = rest.splitAt(x)
            val count =
              if (y > 0) y
              else { // delayed: factor element comes first
                val (ff, fx, fy) = rest.head
                require(ff == 0 && fx == 31, "delayed replication needs an 031YYY factor")
                val fe = TableB(fx * 1000 + fy)
                emit(fx * 1000 + fy, fe)
                lastReplicationFactor
              }
            val realBody = if (y > 0) body else rest.tail.take(x)
            val realAfter = if (y > 0) after else rest.tail.drop(x)
            (0 until count).foreach(_ => exec(realBody))
            exec(realAfter)
          case 2 =>
            x match {
              case 1 => widthDelta = if (y == 0) 0 else y - 128
              case other => throw new UnsupportedOperationException(s"operator 2-$other-$y")
            }
            exec(rest)
          case 3 =>
            val seq = TableD.getOrElse(300000 + x * 1000 + y,
              throw new NoSuchElementException(f"Table D 3-$x%02d-$y%03d not embedded"))
            exec(seq.map(c => (0, c / 1000, c % 1000)).toList ::: rest)
        }
      }
      exec(rawDescriptors.toList)
    }

    def decodeValue(code: Int, e: Element, raw: Long): Value =
      if (e.isString) Value(code, None, None) // handled separately
      else if (raw == missing(e.width) && e.width > 1 && code != 31001)
        Value(code, None, None)
      else {
        val v = (raw + e.ref) / math.pow(10, e.scale)
        if (code == 31001) {
          // an all-ones factor is "missing", never a literal count of 255
          require(raw != missing(e.width),
            "missing (all-ones) delayed replication factor 031001")
          lastReplicationFactor = raw.toInt
        }
        Value(code, Some(v), None)
      }

    val subsets: Seq[Seq[Value]] =
      if (!compressed) {
        (0 until nSubsets).map { _ =>
          val out = Seq.newBuilder[Value]
          runDescriptors { (code, e) =>
            if (e.isString) {
              val s = new String(reader.readBytes(e.width), "US-ASCII")
              out += Value(code, None, Some(s))
            } else {
              val raw = reader.read(e.width)
              val v = decodeValue(code, e, raw)
              out += v
            }
          }
          out.result()
        }
      } else {
        // compression: for each element, base value (element width),
        // 6-bit increment width, then nSubsets increments
        val cols = Seq.newBuilder[Seq[Value]]
        runDescriptors { (code, e) =>
          if (e.isString) {
            val base = reader.readBytes(e.width)
            val incrW = reader.read(6).toInt
            val vals =
              if (incrW == 0) Seq.fill(nSubsets)(new String(base, "US-ASCII"))
              else (0 until nSubsets).map(_ => new String(reader.readBytes(incrW * 8), "US-ASCII"))
            cols += vals.map(s => Value(code, None, Some(s)))
          } else {
            val base = reader.read(e.width)
            val incrW = reader.read(6).toInt
            val raws = (0 until nSubsets).map { _ =>
              if (incrW == 0) base
              else {
                val inc = reader.read(incrW)
                if (inc == missing(incrW)) missing(e.width) else base + inc
              }
            }
            if (code == 31001) {
              require(raws.distinct.size == 1, "varying delayed replication across subsets")
              require(raws.head != missing(e.width),
                "missing (all-ones) delayed replication factor 031001")
              lastReplicationFactor = raws.head.toInt
            }
            cols += raws.map(r => decodeValue(code, e, r))
          }
        }
        val columns = cols.result()
        (0 until nSubsets).map(s => columns.map(_(s)))
      }

    Message(centre, subCentre, year, month, day, hour, minute, nSubsets, compressed, subsets)
  }
}
