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

    // Robots.rulesTable + robotsFilter (RFC 9309): 20 synthesized
    // per-host policies exercising group selection (an otherbot group
    // that must be ignored, '*'-fallback hosts), wildcard patterns,
    // the $ end anchor, longest-match-wins with Allow tiebreak, an
    // empty robots.txt, and a host with NO robots row (both ⇒
    // allowed). Spark PARSES the text; the oracle states each
    // decision from the policy formula — a parser or matcher bug
    // flips a decision and the hash ----------------------------------
    Probe("x91_robots",
      (s, d) => {
        import s.implicits._
        val robotsTxt = (0 until 20).filter(_ != 18).map { k =>
          val uaLine = if (k % 5 == 4) "User-agent: *"
                       else "User-agent: graftbot"
          val txt = if (k == 19) "" else
            s"# crawl policy\nUser-agent: otherbot\nDisallow: /\n\n" +
              s"$uaLine\nDisallow: /private*\nAllow: /private/ok$$\n" +
              s"Disallow: /p${k % 3}/\n" +
              (if (k % 2 == 1) "Allow: /tmp/f\n" else "") +
              "Disallow: /tmp/\n"
          (s"h$k.test", txt)
        }.toDF("host", "robots_txt")
        val rules = Robots.rulesTable(robotsTxt, "GraftBot")
        val k = (col("doc_id") % 20).cast("string")
        val d3 = (col("doc_id") % 3).cast("string")
        val path = when(col("doc_id") % 7 === 0, lit("/"))
          .when(col("doc_id") % 7 === 1, lit("/public/a"))
          .when(col("doc_id") % 7 === 2, lit("/private/x"))
          .when(col("doc_id") % 7 === 3, lit("/private/ok"))
          .when(col("doc_id") % 7 === 4, lit("/private/okay"))
          .when(col("doc_id") % 7 === 5, concat(lit("/p"), d3, lit("/z")))
          .otherwise(lit("/tmp/file"))
        val urls = Tables.documents(s, d).select(col("doc_id"),
          concat(lit("http://h"), k, lit(".test"), path).as("url"))
        Robots.robotsFilter(urls, rules).orderBy("doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, doc_id % 20 AS k, doc_id % 7 AS p,
             |         doc_id % 3 AS d3
             |  FROM documents)
             |SELECT doc_id,
             |  'http://h' || k || '.test' ||
             |    CASE p WHEN 0 THEN '/' WHEN 1 THEN '/public/a'
             |           WHEN 2 THEN '/private/x' WHEN 3 THEN '/private/ok'
             |           WHEN 4 THEN '/private/okay'
             |           WHEN 5 THEN '/p' || d3 || '/z'
             |           ELSE '/tmp/file' END AS url,
             |  'h' || k || '.test' AS host,
             |  CASE WHEN k IN (18, 19) THEN TRUE
             |       WHEN p = 2 THEN FALSE
             |       WHEN p = 4 THEN FALSE
             |       WHEN p = 5 THEN d3 <> (k % 3)
             |       WHEN p = 6 THEN k % 2 = 1
             |       ELSE TRUE END AS allowed
             |FROM u ORDER BY doc_id""".stripMargin)),

    // The CRAWL FLAGSHIP: the whole ingestion family composed
    // end-to-end — WARC framing → response records → robots decision
    // (x91's policies) → HTTP body → stripHtml (x67's chain) → C4
    // rules (x82's rules) — certified id-for-id against ONE DuckDB
    // mirror that re-derives robots decisions from the policy
    // formula, the page text through the verbatim stripHtml regex
    // chain, and the line/page rules through the x82 lambda mirror.
    // Every stage is individually certified (x88/x91/x67/x82); this
    // certifies their COMPOSITION, the crawl analogue of x38/x72 ----
    Probe("x92_crawl_pipeline",
      (s, d) => {
        import s.implicits._
        // per-host robots (the x91 policy formula)
        val robotsTxt = (0 until 20).filter(_ != 18).map { kk =>
          val uaLine = if (kk % 5 == 4) "User-agent: *"
                       else "User-agent: graftbot"
          val txt = if (kk == 19) "" else
            s"# crawl policy\nUser-agent: otherbot\nDisallow: /\n\n" +
              s"$uaLine\nDisallow: /private*\nAllow: /private/ok$$\n" +
              s"Disallow: /p${kk % 3}/\n" +
              (if (kk % 2 == 1) "Allow: /tmp/f\n" else "") +
              "Disallow: /tmp/\n"
          (s"h$kk.test", txt)
        }.toDF("host", "robots_txt")
        val rules = Robots.rulesTable(robotsTxt, "graftbot")
        // per-doc WARC response whose body is an HTML page
        val files = Tables.documents(s, d)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, text) =>
            val path = (id % 7) match {
              case 0 => "/"
              case 1 => "/public/a"
              case 2 => "/private/x"
              case 3 => "/private/ok"
              case 4 => "/private/okay"
              case 5 => s"/p${id % 3}/z"
              case _ => "/tmp/file"
            }
            val html = s"<html><body><h1>Title ${id % 7}</h1>" +
              s"<p>${text.take(60)} ok.</p>" +
              s"<p>${text.slice(60, 90)} go!</p>" +
              (if (id % 11 == 0) "<p>lorem ipsum filler text.</p>" else "") +
              (if (id % 13 == 0) "<p>code { x }</p>" else "") +
              "<script>var x = 1;</script></body></html>"
            val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
              html).getBytes("UTF-8")
            (id, graft.sources.Warc.buildRecord("response",
              s"<urn:uuid:$id>", s"http://h${id % 20}.test$path",
              "2026-01-01T00:00:00Z",
              "application/http; msgtype=response", http))
          }.toDF("file_id", "content")
        val recs = graft.sources.Warc.records(files)
          .where(col("warc_type") === "response" && col("parse_ok"))
        val allowed = Robots.robotsFilter(
            recs.select(col("file_id").as("doc_id"),
              col("target_uri").as("url")), rules)
          .where(col("allowed")).select("doc_id")
        val pstr = decode(col("payload"), "UTF-8")
        val pages = recs.select(col("file_id").as("doc_id"),
            TextOps.stripHtml(
              substring(pstr, instr(pstr, "\r\n\r\n") + 4, lit(1 << 20)))
              .as("text"))
          .join(allowed, Seq("doc_id"))
        TextOps.c4Signals(pages, minWordsPerLine = 3, minSentences = 2)
          .select("doc_id", "clean_text", "n_lines", "n_kept",
            "n_sentences", "keep")
          .orderBy("doc_id")
      },
      Some {
        val block = TextOps.BlockTagPattern
        s"""WITH u AS (
           |  SELECT doc_id, text, doc_id % 20 AS k, doc_id % 7 AS p,
           |         doc_id % 3 AS d3
           |  FROM documents),
           |al AS (
           |  SELECT doc_id, text FROM u
           |  WHERE CASE WHEN k IN (18, 19) THEN TRUE
           |             WHEN p = 2 THEN FALSE
           |             WHEN p = 4 THEN FALSE
           |             WHEN p = 5 THEN d3 <> (k % 3)
           |             WHEN p = 6 THEN k % 2 = 1
           |             ELSE TRUE END),
           |a AS (
           |  SELECT doc_id,
           |    '<html><body><h1>Title ' || CAST(doc_id % 7 AS VARCHAR) ||
           |    '</h1><p>' || substr(text, 1, 60) || ' ok.</p>' ||
           |    '<p>' || substr(text, 61, 30) || ' go!</p>' ||
           |    CASE WHEN doc_id % 11 = 0
           |         THEN '<p>lorem ipsum filler text.</p>' ELSE '' END ||
           |    CASE WHEN doc_id % 13 = 0
           |         THEN '<p>code { x }</p>' ELSE '' END ||
           |    '<script>var x = 1;</script></body></html>' AS h
           |  FROM al),
           |s1 AS (SELECT doc_id,
           |  regexp_replace(h, '(?s)<!--.*?-->', ' ', 'g') AS h FROM a),
           |s2 AS (SELECT doc_id,
           |  regexp_replace(h, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS h FROM s1),
           |s3 AS (SELECT doc_id,
           |  regexp_replace(h, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS h FROM s2),
           |s4 AS (SELECT doc_id,
           |  regexp_replace(h, '$block', chr(10), 'g') AS h FROM s3),
           |s5 AS (SELECT doc_id,
           |  regexp_replace(h, '<[^>]*>', ' ', 'g') AS h FROM s4),
           |s6 AS (SELECT doc_id,
           |  replace(replace(replace(replace(replace(replace(h,
           |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
           |    '&#39;', CHR(39)), '&amp;', '&') AS h FROM s5),
           |s7 AS (SELECT doc_id,
           |  regexp_replace(h, '[ \\t\\x0B\\f\\r]+', ' ', 'g') AS h FROM s6),
           |s8 AS (SELECT doc_id,
           |  trim(regexp_replace(h, ' ?\\n[ \\n]*', chr(10), 'g'),
           |       ' ' || chr(10)) AS t FROM s7),
           |kk AS (
           |  SELECT doc_id, t,
           |    list_transform(string_split(t, chr(10)), x -> trim(x)) AS lines,
           |    list_filter(list_transform(string_split(t, chr(10)), x -> trim(x)),
           |      x -> regexp_matches(x, '[.!?"]$$')
           |       AND len(regexp_extract_all(x, '[^\\t\\n\\x0B\\f\\r ]+')) >= 3
           |       AND NOT regexp_matches(lower(x),
           |             '(?:^|[^a-z0-9])javascript(?:[^a-z0-9]|$$)')) AS kept
           |  FROM s8),
           |c AS (
           |  SELECT doc_id, t, lines, kept,
           |    array_to_string(kept, chr(10)) AS clean_text,
           |    (length(array_to_string(kept, chr(10))) -
           |     length(regexp_replace(array_to_string(kept, chr(10)),
           |       '[.!?]', '', 'g')))::BIGINT AS n_sentences,
           |    contains(lower(t), 'lorem ipsum') AS has_lorem,
           |    (contains(t, '{') OR contains(t, '}')) AS has_brace
           |  FROM kk)
           |SELECT doc_id, clean_text,
           |  len(lines)::BIGINT AS n_lines,
           |  len(kept)::BIGINT AS n_kept,
           |  n_sentences,
           |  (n_sentences >= 2 AND NOT has_lorem AND NOT has_brace) AS keep
           |FROM c ORDER BY doc_id""".stripMargin
      }),
  )
}
