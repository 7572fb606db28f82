package graft.operators

import org.apache.spark.sql.functions._

import graft.sources.{Tables, Warc}

/** Certification probe for the WARC ingestion front end (x88): each
  * document id deterministically synthesizes a two-record WARC stream
  * (HTTP request + response whose body is the document text) through
  * the real record framing (CRLF header block, Content-Length
  * delimited payload), Spark parses it back through the real
  * byte-level parser, and DuckDB re-derives every field from the
  * construction formula — a mangled header split, a byte/char length
  * confusion, or an off-by-one in the Content-Length arithmetic all
  * diverge the hash. (The gzip-member path, resync, and hostile
  * inputs are WarcSpec's job — gzip cannot be mirrored in SQL.)
  */
object IngestProbes {

  val probes: Seq[Probe] = Seq(

    Probe("x88_warc_parse",
      (s, d) => {
        import s.implicits._
        val files = Tables.documents(s, d)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, text) =>
            val uri = s"http://example.com/page/$id"
            val date = "2026-01-01T00:00:00Z"
            val req = Warc.buildRecord("request", s"<urn:uuid:req-$id>", uri,
              date, "application/http; msgtype=request",
              s"GET /page/$id HTTP/1.1\r\nHost: example.com\r\n\r\n"
                .getBytes("UTF-8"))
            val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
              .getBytes("UTF-8")) ++ text.getBytes("UTF-8")
            val resp = Warc.buildRecord("response", s"<urn:uuid:resp-$id>",
              uri, date, "application/http; msgtype=response", http)
            (id, req ++ resp)
          }.toDF("file_id", "content")
        val pstr = decode(col("payload"), "UTF-8")
        Warc.records(files)
          .select(col("file_id").as("doc_id"), col("rec_idx"),
            col("warc_type"), col("record_id"), col("target_uri"),
            col("content_length"), col("parse_ok"),
            substring(pstr, instr(pstr, "\r\n\r\n") + 4, lit(40))
              .as("body_prefix"))
          .orderBy("doc_id", "rec_idx")
      },
      Some("""WITH crlf AS (SELECT chr(13) || chr(10) AS n),
             |r0 AS (
             |  SELECT doc_id, 0 AS rec_idx, 'request' AS warc_type,
             |    '<urn:uuid:req-' || doc_id || '>' AS record_id,
             |    'http://example.com/page/' || doc_id AS target_uri,
             |    strlen('GET /page/' || doc_id || ' HTTP/1.1' ||
             |      (SELECT n FROM crlf) || 'Host: example.com' ||
             |      (SELECT n FROM crlf) || (SELECT n FROM crlf))
             |      AS content_length,
             |    TRUE AS parse_ok, '' AS body_prefix
             |  FROM documents),
             |r1 AS (
             |  SELECT doc_id, 1 AS rec_idx, 'response' AS warc_type,
             |    '<urn:uuid:resp-' || doc_id || '>' AS record_id,
             |    'http://example.com/page/' || doc_id AS target_uri,
             |    strlen('HTTP/1.1 200 OK' || (SELECT n FROM crlf) ||
             |      'Content-Type: text/plain' || (SELECT n FROM crlf) ||
             |      (SELECT n FROM crlf)) + strlen(text)
             |      AS content_length,
             |    TRUE AS parse_ok, substr(text, 1, 40) AS body_prefix
             |  FROM documents)
             |SELECT * FROM r0 UNION ALL SELECT * FROM r1
             |ORDER BY doc_id, rec_idx""".stripMargin)),
  )
}
