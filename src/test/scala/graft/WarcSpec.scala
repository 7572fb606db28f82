package graft

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Warc

/** WARC reader: the paths the x88 oracle cannot reach — per-record
  * gzip members (the Common Crawl at-rest layout), hostile inputs
  * (truncation, lying Content-Length, resync), header folding, the
  * decompression bound — plus the full crawl-ingestion composition
  * (WARC → HTTP body → stripHtml → C4 rules).
  */
class WarcSpec extends SparkTestBase {

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private def rec(t: String, id: String, payload: String): Array[Byte] =
    Warc.buildRecord(t, id, "http://x.test/", "2026-01-01T00:00:00Z",
      "text/plain", payload.getBytes("UTF-8"))

  test("plain stream round-trips through build + parse") {
    val bytes = rec("response", "<a>", "hello world") ++
      rec("metadata", "<b>", "meta here")
    val rs = Warc.parseAll(bytes)
    assert(rs.map(_.warcType) === Seq("response", "metadata"))
    assert(rs.forall(_.parseOk))
    assert(new String(rs.head.payload, "UTF-8") === "hello world")
    assert(rs.head.contentLength === 11)
  }

  test("concatenated gzip members parse as one stream (CC layout)") {
    val bytes = gzip(rec("response", "<a>", "first body")) ++
      gzip(rec("response", "<b>", "second body"))
    val rs = Warc.parseAll(bytes)
    assert(rs.map(r => new String(r.payload, "UTF-8")) ===
      Seq("first body", "second body"))
    assert(rs.forall(_.parseOk))
  }

  test("decompression bound caps output; truncated gzip yields what it can") {
    val big = rec("response", "<a>", "x" * 100000)
    val rs = Warc.parseAll(gzip(big), maxBytes = 1024)
    // payload clamped to what decompressed — flagged, not thrown
    assert(rs.headOption.forall(!_.parseOk))
    val cut = gzip(big).take(40) // truncated mid-member
    assert(Warc.parseAll(cut).isEmpty || !Warc.parseAll(cut).head.parseOk)
  }

  test("lying Content-Length clamps to remaining bytes, parse_ok=false") {
    val lying = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <a>\r\nContent-Length: 99999\r\n\r\nshort").getBytes("UTF-8")
    val rs = Warc.parseAll(lying)
    assert(rs.length === 1 && !rs.head.parseOk)
    assert(new String(rs.head.payload, "UTF-8") === "short")
    assert(rs.head.contentLength === 99999)
  }

  test("missing Content-Length yields empty payload flagged not-ok") {
    val bad = "WARC/1.0\r\nWARC-Type: response\r\n\r\npayload".getBytes("UTF-8")
    val rs = Warc.parseAll(bad)
    assert(rs.length === 1 && !rs.head.parseOk && rs.head.payload.isEmpty)
  }

  test("garbage between records resyncs on the WARC/ magic") {
    val bytes = rec("response", "<a>", "one") ++
      "JUNK JUNK JUNK".getBytes("UTF-8") ++
      rec("response", "<b>", "two")
    val rs = Warc.parseAll(bytes)
    assert(rs.map(r => new String(r.payload, "UTF-8")).takeRight(1) === Seq("two"))
    assert(rs.length === 2) // junk consumed by the first record's resync scan
  }

  test("folded header continuation lines join with a space") {
    val folded = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://very.long/\r\n tail-of-uri\r\n" +
      "Content-Length: 2\r\n\r\nok").getBytes("UTF-8")
    val rs = Warc.parseAll(folded)
    assert(rs.head.targetUri === "http://very.long/ tail-of-uri")
    assert(rs.head.parseOk)
  }

  test("httpBody strips the HTTP header block; header-less passes through") {
    val http = "HTTP/1.1 200 OK\r\nX: y\r\n\r\nthe body".getBytes("UTF-8")
    assert(new String(Warc.httpBody(http), "UTF-8") === "the body")
    val raw = "no headers here".getBytes("UTF-8")
    assert(new String(Warc.httpBody(raw), "UTF-8") === "no headers here")
  }

  test("record cap bounds hostile record floods") {
    val flood = Array.fill(50)(rec("response", "<x>", "p")).flatten.toArray
    assert(Warc.parseAll(flood, maxRecords = 7).length === 7)
  }

  test("crawl composition: WARC -> HTTP body -> stripHtml -> C4 keeps the page") {
    import spark.implicits._
    val html = "<html><body><p>A real first sentence lives here.</p>" +
      "<p>And a second sentence follows it!</p>" +
      "<script>var x = 1;</script></body></html>"
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
      .getBytes("UTF-8")
    val warc = Warc.buildRecord("response", "<r>", "http://x.test/a",
      "2026-01-01T00:00:00Z", "application/http; msgtype=response", http)
    val files = Seq((1L, warc)).toDF("file_id", "content")
    // HTTP headers stripped relationally (the probe's instr pattern),
    // then the whole cleaning chain as scan-side projections
    val pstr = decode(col("payload"), "UTF-8")
    val pages = Warc.records(files)
      .where(col("warc_type") === "response" && col("parse_ok"))
      .select(col("file_id").as("doc_id"),
        TextOps.stripHtml(
          substring(pstr, instr(pstr, "\r\n\r\n") + 4, lit(1000000)))
          .as("text"))
    val kept = TextOps.c4Filter(pages, minSentences = 2).collect()
    assert(kept.length === 1)
    assert(kept.head.getAs[String]("text") ===
      "A real first sentence lives here.\nAnd a second sentence follows it!")
  }
}
