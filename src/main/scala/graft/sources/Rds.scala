package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

/** Minimal from-scratch reader for R's serialization format (RDS,
  * XDR variant, versions 2 and 3) — just enough grammar to pull the
  * xgboost payload and the feature-name vector out of a saved
  * `xgb.Booster` object without an R runtime.
  *
  * Format: the public "Serialization Formats" chapter of the R
  * Internals manual. An RDS file is (optionally gzip-wrapped)
  * `X\n`, format version, writer/min-reader versions, (v3: native
  * encoding string), then one serialized SEXP. Each SEXP starts with a
  * 32-bit flags word: low byte = type, bit 8 = object, bit 9 = has
  * attributes, bit 10 = has tag; symbols/environments/extptrs enter a
  * back-reference table addressed by REFSXP.
  *
  * The booster object (reference: models/operational/
  * xgboost_regression_v4.RDS, loaded by run_model_V2.R:53) is a
  * generic vector whose second element is the RAWSXP holding the
  * xgboost-serialized model (JSON for these files). We strict-parse
  * depth-first and return the first RAWSXP — reached before the
  * `callbacks` closures, whose R bytecode this reader deliberately
  * does not implement. The `feature_names` character vector sits
  * after those closures, so it is recovered by a validated pattern
  * scan for a STRSXP of the expected length instead.
  */
object Rds {

  private final class In(val b: Array[Byte]) {
    var p = 0
    def i4(): Int = {
      val v = ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) |
        ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
      p += 4; v
    }
    def skip(n: Int): Unit = p += n
    def bytes(n: Int): Array[Byte] = {
      val v = java.util.Arrays.copyOfRange(b, p, p + n); p += n; v
    }
  }

  // SEXP type codes (R Internals §12 / Rinternals.h)
  private val SYM = 1; private val PAIRLIST = 2; private val LANG = 6
  private val CHAR = 9; private val LGL = 10; private val INT = 13
  private val REAL = 14; private val CPLX = 15; private val STR = 16
  private val VEC = 19; private val EXPR = 20; private val RAW = 24
  private val S4 = 25; private val ALTREP = 238; private val NIL = 254
  private val REF = 255

  def gunzip(raw: Array[Byte]): Array[Byte] =
    if (raw.length >= 2 && (raw(0) & 0xFF) == 0x1F && (raw(1) & 0xFF) == 0x8B) {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(raw))
      val out = new ByteArrayOutputStream(raw.length * 4)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } else raw

  def readFile(path: String): Array[Byte] =
    gunzip(Files.readAllBytes(Paths.get(path)))

  /** First RAWSXP in the serialized object, depth-first. */
  def firstRaw(data: Array[Byte]): Array[Byte] = {
    val in = new In(data)
    require(in.bytes(2).sameElements(Array[Byte]('X', '\n')),
      "not an XDR-serialized RDS stream")
    val ver = in.i4()
    in.i4(); in.i4() // writer version, min reader version
    if (ver >= 3) in.skip(in.i4()) // native encoding name
    var found: Array[Byte] = null

    def item(): Unit = {
      if (found != null) return
      val flags = in.i4()
      val t = flags & 0xFF
      val hasAttr = ((flags >> 9) & 1) == 1
      val hasTag = ((flags >> 10) & 1) == 1
      t match {
        case NIL => ()
        case REF => if ((flags >> 8) == 0) in.i4() // packed else explicit index
        case SYM => item() // the print name CHARSXP
        case CHAR =>
          val n = in.i4()
          if (n > 0) in.skip(n) // n == -1 encodes NA_character_
        case PAIRLIST | LANG =>
          if (hasAttr) item()
          if (hasTag) item()
          item(); item() // CAR, CDR
        case LGL | INT => in.skip(in.i4() * 4)
        case REAL => in.skip(in.i4() * 8)
        case CPLX => in.skip(in.i4() * 16)
        case STR | VEC | EXPR =>
          val n = in.i4()
          var i = 0
          while (i < n && found == null) { item(); i += 1 }
          if (found == null && hasAttr) item()
        case RAW =>
          found = in.bytes(in.i4())
        case 22 => // EXTPTRSXP: protected value + tag
          item(); item()
        case S4 => if (hasAttr) item()
        case ALTREP => item(); item(); item() // info, state, attributes
        case other =>
          throw new UnsupportedOperationException(
            s"RDS SEXP type $other not implemented (reached before payload)")
      }
      if (found == null && hasAttr && t != STR && t != VEC && t != EXPR &&
        t != PAIRLIST && t != LANG && t != S4) item()
    }

    item()
    require(found != null, "no RAWSXP payload found in RDS object")
    found
  }

  /** Recover a character vector of known length `n` by scanning for its
    * serialized STRSXP header and validating that exactly n wellformed,
    * distinct, non-empty CHARSXPs follow. Used for fields that sit
    * behind R closures/bytecode in the stream (e.g. `feature_names`). */
  def scanStringVector(data: Array[Byte], n: Int): Option[Seq[String]] = {
    var i = 0
    while (i + 8 <= data.length) {
      if (data(i) == 0 && data(i + 1) == 0 && data(i + 2) == 0 &&
        (data(i + 3) & 0xFF) == STR) {
        val len = ((data(i + 4) & 0xFF) << 24) | ((data(i + 5) & 0xFF) << 16) |
          ((data(i + 6) & 0xFF) << 8) | (data(i + 7) & 0xFF)
        if (len == n) {
          val in = new In(data)
          in.p = i + 8
          val out = Seq.newBuilder[String]
          var ok = true
          var k = 0
          while (ok && k < n) {
            if (in.p + 8 > data.length) ok = false
            else {
              val flags = in.i4()
              if ((flags & 0xFF) != CHAR) ok = false
              else {
                val sl = in.i4()
                if (sl <= 0 || in.p + sl > data.length) ok = false
                else out += new String(in.bytes(sl), StandardCharsets.UTF_8)
              }
            }
            k += 1
          }
          if (ok) {
            val names = out.result()
            if (names.distinct.size == n) return Some(names)
          }
        }
      }
      i += 1
    }
    None
  }
}
