package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** From-scratch WARC (ISO 28500) reader — the Common Crawl ingestion
  * front end: a crawl dump is a stream of `WARC/1.x` records (request /
  * response / metadata …), each a CRLF header block plus a
  * `Content-Length`-delimited payload, usually stored as CONCATENATED
  * per-record gzip members. This parses both forms with the repo's
  * hostile-input stance (same guard family as the AVI/HDF5/BUFR
  * readers): bounded decompression, bounded record count, resync on
  * malformed records instead of failing the task, and a `parse_ok`
  * flag so damage is visible rather than silent.
  *
  * The DataFrame surface is mapPartitions over binary rows — ZERO
  * shuffle; at 100 TB each executor parses its own WARC splits and
  * everything downstream (HTTP payload strip → stripHtml → c4 rules →
  * dedup) composes as scan-side projections.
  */
object Warc {

  /** One parsed record. `payload` is the raw record block (for a
    * response record: HTTP status line + headers + body). */
  final case class WarcRecord(recIdx: Int, version: String, warcType: String,
                              recordId: String, targetUri: String,
                              warcDate: String, contentType: String,
                              contentLength: Long, payload: Array[Byte],
                              parseOk: Boolean)

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B

  /** Decompress a (possibly multi-member) gzip stream with an output
    * bound — `GZIPInputStream` consumes concatenated members, which is
    * exactly the WARC-at-rest layout. Truncated/corrupt tails return
    * what decompressed so far (damage surfaces as parse_ok=false
    * downstream, not a dead task). */
  private[sources] def gunzipAll(raw: Array[Byte], maxBytes: Int): Array[Byte] = {
    // size hint in Long: `raw.length * 4` overflows Int for >=512 MB
    // members, and a negative hint makes the constructor THROW outside
    // the try — killing the task instead of honoring the clamp contract
    val hint = math.min(math.min(raw.length.toLong * 4, maxBytes.toLong),
      1L << 20).toInt
    val out = new ByteArrayOutputStream(math.max(hint, 64))
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(raw))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0 && out.size < maxBytes) {
        out.write(buf, 0, math.min(n, maxBytes - out.size))
        n = in.read(buf)
      }
    } catch { case _: java.io.IOException => () }
    out.toByteArray
  }

  private val Crlf2 = "\r\n\r\n".getBytes("US-ASCII")

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Parse one WARC stream (auto-gunzip). Malformed header blocks
    * resync to the next `WARC/` magic; oversized/missing
    * Content-Length clamps to the remaining bytes with
    * parse_ok=false. */
  def parseAll(raw: Array[Byte], maxRecords: Int = 100000,
               maxBytes: Int = 1 << 28): Seq[WarcRecord] = {
    val bytes = if (isGzip(raw)) gunzipAll(raw, maxBytes) else raw
    val magic = "WARC/".getBytes("US-ASCII")
    val out = Seq.newBuilder[WarcRecord]
    var pos = indexOf(bytes, magic, 0)
    var idx = 0
    while (pos >= 0 && idx < maxRecords) {
      val hdrEnd = indexOf(bytes, Crlf2, pos)
      if (hdrEnd < 0) {
        pos = -1 // no complete header block left
      } else {
        val header = new String(bytes, pos, hdrEnd - pos, "UTF-8")
        val lines = header.split("\r\n", -1)
        val version = lines.head.trim
        // header fields with RFC-style folding (continuation lines)
        val fields = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var lastKey: String = null
        lines.tail.foreach { line =>
          if (line.nonEmpty && (line.head == ' ' || line.head == '\t')) {
            if (lastKey != null)
              fields(lastKey) = fields(lastKey) + " " + line.trim
          } else line.indexOf(':') match {
            case -1 => lastKey = null
            case c =>
              lastKey = line.substring(0, c).trim.toLowerCase
              fields(lastKey) = line.substring(c + 1).trim
          }
        }
        val bodyStart = hdrEnd + Crlf2.length
        val declared = fields.get("content-length").flatMap(v =>
          scala.util.Try(v.toLong).toOption)
        val remaining = (bytes.length - bodyStart).toLong
        val ok = declared.exists(l => l >= 0 && l <= remaining)
        val len = declared match {
          case Some(l) if l >= 0 => math.min(l, remaining).toInt
          case _ => 0
        }
        out += WarcRecord(idx, version,
          fields.getOrElse("warc-type", ""),
          fields.getOrElse("warc-record-id", ""),
          fields.getOrElse("warc-target-uri", ""),
          fields.getOrElse("warc-date", ""),
          fields.getOrElse("content-type", ""),
          declared.getOrElse(-1L),
          java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + len),
          ok)
        idx += 1
        pos = indexOf(bytes, magic, bodyStart + len)
      }
    }
    out.result()
  }

  /** The HTTP-response payload body: everything after the first CRLF
    * CRLF (status line + headers stripped). A payload without an HTTP
    * header block returns as-is (metadata/conversion records). */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    val i = indexOf(payload, Crlf2, 0)
    if (i < 0) payload
    else java.util.Arrays.copyOfRange(payload, i + Crlf2.length, payload.length)
  }

  /** DataFrame surface: explode (id, warc-bytes) rows into records —
    * mapPartitions, zero shuffle. */
  def records(files: DataFrame, idCol: String = "file_id",
              bytesCol: String = "content",
              maxRecords: Int = 100000): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      files.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
    ds.flatMap { case (id, raw) =>
      parseAll(if (raw == null) Array.emptyByteArray else raw, maxRecords)
        .map(r => (id, r.recIdx, r.version, r.warcType, r.recordId,
          r.targetUri, r.warcDate, r.contentType, r.contentLength,
          r.payload, r.parseOk))
    }.toDF(idCol, "rec_idx", "warc_version", "warc_type", "record_id",
      "target_uri", "warc_date", "content_type", "content_length",
      "payload", "parse_ok")
  }

  /** Build one WARC record's bytes (CRLF framing + Content-Length) —
    * the synthesizer for probes/specs, also a minimal writer. */
  def buildRecord(warcType: String, recordId: String, targetUri: String,
                  date: String, contentType: String,
                  payload: Array[Byte]): Array[Byte] = {
    val uriLine =
      if (targetUri.isEmpty) "" else s"WARC-Target-URI: $targetUri\r\n"
    val header =
      s"WARC/1.0\r\n" +
        s"WARC-Type: $warcType\r\n" +
        s"WARC-Record-ID: $recordId\r\n" +
        uriLine +
        s"WARC-Date: $date\r\n" +
        s"Content-Type: $contentType\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n"
    val h = header.getBytes("UTF-8")
    val out = new Array[Byte](h.length + payload.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(payload, 0, out, h.length, payload.length)
    System.arraycopy(Crlf2, 0, out, h.length + payload.length, 4)
    out
  }
}
