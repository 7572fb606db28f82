package graft.operators

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Certification probes for the URL-curation and corpus-assembly
  * operators (x60–x64). URLs are synthesized from `doc_id` arithmetic
  * (the documents table carries none), so the x60/x61/x62 oracles can
  * state the EXPECTED answer by the same arithmetic — ground truth by
  * construction, independent of the Scala parsing path under test.
  * x63/x64 oracles re-derive the operator's semantics in SQL
  * (regexp character counting; the global window cumsum rule the
  * bucketed implementation must match row-for-row).
  */
object CurationProbes {

  /** The messy-URL synthesis shared by x60's Spark side: every
    * canonicalization feature keyed off doc_id residues, including a
    * malformed (scheme-less) subset at id%13=0. */
  private def messyUrl = {
    val id = col("doc_id")
    val scheme = when(id % 2 === 0, "https").otherwise("http")
    val port = when(id % 6 === 0,
      when(id % 2 === 0, ":443").otherwise(":80")).otherwise("")
    val query = when(id % 5 === 1, "?b=2&a=1")
      .when(id % 5 === 2, "?utm_source=feed&a=1")
      .when(id % 5 === 3, "?utm_campaign=x")
      .when(id % 5 === 4, "?fbclid=abc&z=9&gclid=g")
      .otherwise("")
    when(id % 13 === 0, concat(lit("not a url "), id.cast("string")))
      .otherwise(concat(
        scheme, lit("://"),
        when(id % 4 === 0, "www.").otherwise(""),
        lit("site"), (id % 10).cast("string"), lit(".example.com"), port,
        lit("/Page/"), (id % 7).cast("string"),
        when(id % 3 === 0, "/").otherwise(""),
        query,
        when(id % 2 === 0, "#frag").otherwise("")))
  }

  val probes: Seq[Probe] = Seq(

    // UrlOps.canonicalizeUrl: scheme/host lowercasing, default-port,
    // www., trailing-slash and fragment stripping, tracking-param
    // removal, param sorting, malformed → NULL. The oracle states the
    // canonical form directly from the id arithmetic that built the
    // messy URL — ground truth by construction ----------------------
    Probe("x60_url_canonical",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          UrlOps.canonicalizeUrl(messyUrl).as("canonical_url"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 13 = 0 THEN NULL
             |       ELSE (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
             |         || '://site' || CAST(doc_id % 10 AS VARCHAR)
             |         || '.example.com/Page/' || CAST(doc_id % 7 AS VARCHAR)
             |         || (CASE doc_id % 5 WHEN 1 THEN '?a=1&b=2'
             |                             WHEN 2 THEN '?a=1'
             |                             WHEN 4 THEN '?z=9'
             |                             ELSE '' END)
             |  END AS canonical_url
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // UrlOps.urlDedup: one keeper per canonical URL (longest text,
    // ties to the smallest id), malformed URLs keep unconditionally.
    // URLs collide by construction (canonical depends only on
    // doc_id % 50); the oracle re-derives keeper choice and group
    // size with an independent window formulation -------------------
    Probe("x61_url_dedup",
      (s, d) => {
        val id = col("doc_id")
        val url = when(id % 13 === 0, concat(lit("bad "), id.cast("string")))
          .otherwise(concat(
            lit("http://"),
            when(id % 2 === 0, "www.").otherwise(""),
            lit("dup"), (id % 50).cast("string"), lit(".example.com"),
            when(id % 3 === 0, "/").otherwise(""),
            when(id % 5 === 0, concat(lit("?utm_s="), id.cast("string")))
              .otherwise("")))
        UrlOps.urlDedup(Tables.documents(s, d).withColumn("url", url))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, text,
             |    CASE WHEN doc_id % 13 = 0 THEN NULL
             |         ELSE 'http://dup' || CAST(doc_id % 50 AS VARCHAR)
             |              || '.example.com' END AS canonical_url
             |  FROM documents),
             |k AS (
             |  SELECT doc_id, canonical_url,
             |    ROW_NUMBER() OVER (PARTITION BY canonical_url
             |                       ORDER BY length(text) DESC, doc_id) AS rn,
             |    COUNT(*) OVER (PARTITION BY canonical_url) AS c
             |  FROM u WHERE canonical_url IS NOT NULL)
             |SELECT doc_id, canonical_url, CAST(c AS BIGINT) AS n_in_group
             |FROM k WHERE rn = 1
             |UNION ALL
             |SELECT doc_id, NULL AS canonical_url, CAST(1 AS BIGINT) AS n_in_group
             |FROM u WHERE canonical_url IS NULL
             |ORDER BY doc_id""".stripMargin)),

    // UrlOps.domainQuota: top-20 docs per host by n_chars (ties to the
    // smallest id); hostless rows keep with rank 0. The oracle is the
    // single-window formulation the two-phase implementation must
    // reproduce exactly ---------------------------------------------
    Probe("x62_domain_quota",
      (s, d) => {
        val id = col("doc_id")
        val url = when(id % 11 === 0, lit("oops"))
          .otherwise(concat(lit("https://q"), (id % 10).cast("string"),
            lit(".example.org/p/"), id.cast("string")))
        UrlOps.domainQuota(
            Tables.documents(s, d).withColumn("url", url)
              .withColumn("score", col("n_chars")),
            maxPerDomain = 20)
          .select(col("doc_id"), col("host"), col("rank_in_host"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
             |  SELECT doc_id, n_chars,
             |    CASE WHEN doc_id % 11 = 0 THEN ''
             |         ELSE 'q' || CAST(doc_id % 10 AS VARCHAR)
             |              || '.example.org' END AS host
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, host,
             |    ROW_NUMBER() OVER (PARTITION BY host
             |                       ORDER BY n_chars DESC, doc_id) AS rk
             |  FROM h WHERE host <> '')
             |SELECT doc_id, host, CAST(rk AS INT) AS rank_in_host
             |FROM r WHERE rk <= 20
             |UNION ALL
             |SELECT doc_id, host, CAST(0 AS INT) AS rank_in_host
             |FROM h WHERE host = ''
             |ORDER BY doc_id""".stripMargin)),

    // TextOps.scriptProfile: Unicode-block histogram + dominant
    // script. Text is remixed by id residue so every script branch
    // (and the none/tie priority rules) is exercised; the oracle
    // recomputes each count with independent regexp length-difference
    // SQL and the same CASE priority --------------------------------
    Probe("x63_script_profile",
      (s, d) => {
        val id = col("doc_id")
        val tx = when(id % 7 === 1, "привет мир как дела")
          .when(id % 7 === 2, "漢字漢字 こんにちは")
          .when(id % 7 === 3, "hello مرحبا بالعالم")
          .when(id % 7 === 4, "123 !!! 456 ???")
          .when(id % 7 === 5, "नमस्ते दुनिया")
          .when(id % 7 === 6, "안녕하세요 세계")
          .otherwise(col("text"))
        TextOps.scriptProfile(
            Tables.documents(s, d).withColumn("text", tx))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CASE doc_id % 7
             |      WHEN 1 THEN 'привет мир как дела'
             |      WHEN 2 THEN '漢字漢字 こんにちは'
             |      WHEN 3 THEN 'hello مرحبا بالعالم'
             |      WHEN 4 THEN '123 !!! 456 ???'
             |      WHEN 5 THEN 'नमस्ते दुनिया'
             |      WHEN 6 THEN '안녕하세요 세계'
             |      ELSE text END AS tx
             |  FROM documents),
             |c AS (
             |  SELECT doc_id,
             |    CAST(length(tx) - length(regexp_replace(tx, '[A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS BIGINT) AS n_latin,
             |    CAST(length(tx) - length(regexp_replace(tx, '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
             |    CAST(length(tx) - length(regexp_replace(tx, '[\x{0370}-\x{03FF}]', '', 'g')) AS BIGINT) AS n_greek,
             |    CAST(length(tx) - length(regexp_replace(tx, '[\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic,
             |    CAST(length(tx) - length(regexp_replace(tx, '[\x{0900}-\x{097F}]', '', 'g')) AS BIGINT) AS n_devanagari,
             |    CAST(length(tx) - length(regexp_replace(tx, '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]', '', 'g')) AS BIGINT) AS n_cjk,
             |    CAST(length(tx) - length(regexp_replace(tx, '[\x{AC00}-\x{D7AF}]', '', 'g')) AS BIGINT) AS n_hangul
             |  FROM t),
             |m AS (
             |  SELECT *,
             |    n_latin + n_cyrillic + n_greek + n_arabic + n_devanagari
             |      + n_cjk + n_hangul AS n_scripted,
             |    greatest(n_latin, n_cyrillic, n_greek, n_arabic,
             |             n_devanagari, n_cjk, n_hangul) AS mx
             |  FROM c)
             |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_arabic,
             |  n_devanagari, n_cjk, n_hangul, n_scripted,
             |  CASE WHEN n_scripted = 0 THEN 'none'
             |       WHEN n_latin = mx THEN 'latin'
             |       WHEN n_cyrillic = mx THEN 'cyrillic'
             |       WHEN n_greek = mx THEN 'greek'
             |       WHEN n_arabic = mx THEN 'arabic'
             |       WHEN n_devanagari = mx THEN 'devanagari'
             |       WHEN n_cjk = mx THEN 'cjk'
             |       ELSE 'hangul' END AS script,
             |  CASE WHEN n_scripted = 0 THEN 0.0
             |       ELSE CAST(mx AS DOUBLE) / n_scripted END AS script_frac
             |FROM m ORDER BY doc_id""".stripMargin)),

    // Sampling.tokenBudgetSelect: the bucketed budget fill must equal
    // the global-window cumsum rule row-for-row — the oracle IS that
    // global window (the formulation the implementation explicitly
    // avoids at scale) ----------------------------------------------
    Probe("x64_token_budget",
      (s, d) => Sampling.tokenBudgetSelect(
          Tables.documents(s, d).select(col("doc_id"),
            col("n_chars").cast("double").as("score"),
            TextOps.wsTokenCount(col("text")).cast("long").as("n_toks")),
          budget = 12000L, scoreCol = "score", tokenCol = "n_toks")
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS score,
             |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |         ELSE len(regexp_split_to_array(trim(text), '\s+'))
             |         END AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, score, n_tokens,
             |    SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
             |                        ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM t)
             |SELECT doc_id, score, n_tokens FROM c
             |WHERE cum <= 12000 ORDER BY doc_id""".stripMargin)),
  )
}
