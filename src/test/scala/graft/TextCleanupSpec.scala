package graft

import org.apache.spark.sql.functions._

import graft.operators.{PiiOps, TextOps}

/** The text-cleanup trio: PiiOps.redactPii (structured counts + token
  * rewrite), TextOps.stripHtml (HTML → per-line text), and the
  * unicode_normalize expression — the certified-contract edge cases
  * the oracle probes (x65/x66/x67) sample, verified here one by one.
  */
class TextCleanupSpec extends SparkTestBase {

  import org.apache.spark.sql.DataFrame

  private def redactOne(text: String): (Option[String], Int, Int, Int, Int) = {
    import spark.implicits._
    val r = PiiOps.redactPii(Seq((1L, text)).toDF("id", "text")).head()
    (Option(r.getAs[String]("text_redacted")), r.getAs[Int]("n_emails"),
      r.getAs[Int]("n_ipv4"), r.getAs[Int]("n_phones"), r.getAs[Int]("pii_total"))
  }

  // --- PiiOps.redactPii ---------------------------------------------------

  test("IPv4: dotted quads redact; version strings do not") {
    assert(redactOne("ip 10.0.0.1 end") === (Some("ip <IP> end"), 0, 1, 0, 1))
    // sentence-ending period after the quad still matches
    assert(redactOne("connect to 1.2.3.4.") === (Some("connect to <IP>."), 0, 1, 0, 1))
    // 5-component version string: NO window of it is an IP
    assert(redactOne("ver 1.2.3.4.5 x") === (Some("ver 1.2.3.4.5 x"), 0, 0, 0, 0))
    // 8-component: the old \b pattern matched this twice
    assert(redactOne("v 1.2.3.4.5.6.7.8") === (Some("v 1.2.3.4.5.6.7.8"), 0, 0, 0, 0))
    // word-adjacent digits stay out (same as \b)
    assert(redactOne("v1.2.3.4 here") === (Some("v1.2.3.4 here"), 0, 0, 0, 0))
    // whole-string match
    assert(redactOne("1.2.3.4") === (Some("<IP>"), 0, 1, 0, 1))
  }

  test("IPv4: space-adjacent chains all redact (second pass)") {
    assert(redactOne("a 1.1.1.1 2.2.2.2 3.3.3.3 b") ===
      (Some("a <IP> <IP> <IP> b"), 0, 3, 0, 3))
    assert(redactOne("9.9.9.9 8.8.8.8") === (Some("<IP> <IP>"), 0, 2, 0, 2))
  }

  test("phones: international formats with 8+ digits match; short junk does not") {
    assert(redactOne("call +1 415 555 2671 now") ===
      (Some("call <PHONE> now"), 0, 0, 1, 1))
    assert(redactOne("uk +44 20 7946 0958") === (Some("uk <PHONE>"), 0, 0, 1, 1))
    assert(redactOne("ru +79161234567") === (Some("ru <PHONE>"), 0, 0, 1, 1))
    assert(redactOne("us +1 (212) 555 0100") === (Some("us <PHONE>"), 0, 0, 1, 1))
    // price/range junk below 8 digits total must not match
    assert(redactOne("price +5 10-20 each") === (Some("price +5 10-20 each"), 0, 0, 0, 0))
    assert(redactOne("range +5 10-20-30") === (Some("range +5 10-20-30"), 0, 0, 0, 0))
  }

  test("stages are sequential: an email's digits never double-count") {
    val (r, ne, ni, np, tot) = redactOne("mail a1234567890@ex.org only")
    assert(r === Some("mail <EMAIL> only"))
    assert((ne, ni, np, tot) === (1, 0, 0, 1))
  }

  test("null text passes through as null with zero counts") {
    assert(redactOne(null) === (None, 0, 0, 0, 0))
  }

  // --- TextOps.stripHtml --------------------------------------------------

  private def strip(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(TextOps.stripHtml(col("h")).as("t"))
      .head().getString(0)
  }

  test("stripHtml keeps one line per block element") {
    val html = "<html><body><h1>Title</h1><p>Para <b>one</b></p>" +
      "<ul><li>item a</li><li>item b</li></ul><div>tail</div></body></html>"
    assert(strip(html) === "Title\nPara one\nitem a\nitem b\ntail")
  }

  test("stripHtml drops comments and script/style bodies, decodes entities in order") {
    val html = "<p>x<!-- secret --></p><script>var a=1;</script>" +
      "<style>.c{}</style><p>&amp;lt; &quot;q&#39;s&quot; &gt;2&nbsp;!</p>"
    assert(strip(html) === "x\n&lt; \"q's\" >2 !")
  }

  test("stripHtml collapses horizontal whitespace but preserves line structure") {
    val html = "<p>a\t b</p>\r\n\r\n<p>c   d</p>"
    assert(strip(html) === "a b\nc d")
  }

  test("stripHtml output composes with lineDedup: repeated nav lines fall out") {
    import spark.implicits._
    val nav = "<nav>Home | About | Contact</nav>"
    val docs = Seq(
      (1L, s"$nav<p>unique one</p>"),
      (2L, s"$nav<p>unique two</p>"),
      (3L, s"$nav<p>unique three</p>")).toDF("doc_id", "html")
      .select(col("doc_id"), TextOps.stripHtml(col("html")).as("text"))
    val deduped: DataFrame = TextOps.lineDedup(docs)
    val texts = deduped.orderBy("doc_id").collect()
      .map(_.getAs[String]("clean_text"))
    // doc 1 keeps the nav line (first occurrence); docs 2 and 3 lose it
    assert(texts(0).contains("Home | About | Contact"))
    assert(!texts(1).contains("Home") && texts(1).contains("unique two"))
    assert(!texts(2).contains("Home") && texts(2).contains("unique three"))
  }

  // --- unicode_normalize ---------------------------------------------------

  private def norm(s: String, form: String): String = {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq(s).toDF("t")
      .select(call_function("unicode_normalize", col("t"), lit(form)).as("n"))
      .head().getString(0)
  }

  test("unicode_normalize: NFC composes, NFKC folds compatibility forms") {
    assert(norm("éclair", "NFC") === "éclair")
    assert(norm("ﬁle", "NFC") === "ﬁle")   // ligature is NFC-stable
    assert(norm("ﬁle", "NFKC") === "file")      // ...but folds under NFKC
    assert(norm("x²y", "NFKC") === "x2y")
    assert(norm("Ångstrom", "NFC") === "Ångstrom")
    assert(norm("Ｆｕｌｌ", "NFKC") === "Full")
  }

  test("unicode_normalize: idempotent, null-safe, unknown form refused") {
    assert(norm("plain ascii", "NFC") === "plain ascii")
    assert(norm(norm("é", "NFKC"), "NFKC") === "é")
    import spark.implicits._
    GraftExtensions.register(spark)
    val r = Seq((1L, null: String)).toDF("id", "t")
      .select(call_function("unicode_normalize", col("t"), lit("NFC")).as("n"))
      .head()
    assert(r.isNullAt(0))
    val e = intercept[Exception] { norm("x", "NFX") }
    assert(e.getMessage.contains("NFX") || e.getCause != null)
  }

  // --- TextOps.htmlSignals ------------------------------------------------

  private def signals(html: String) = {
    import spark.implicits._
    TextOps.htmlSignals(Seq((1L, html)).toDF("doc_id", "html")).head()
  }

  test("htmlSignals: nav pages score high link density, articles low") {
    val nav = signals("<div><a href=a>Home</a><a href=b>About</a>" +
      "<a href=c>Contact</a></div>")
    assert(nav.getAs[Double]("link_density") > 0.8)
    assert(nav.getAs[Int]("n_links") === 3)
    val art = signals("<p>A long body of real article text that goes on " +
      "for quite a while without any links at all.</p>")
    assert(art.getAs[Double]("link_density") === 0.0)
  }

  test("htmlSignals: script/style weight counted, excluded from text") {
    val r = signals("<p>tiny</p><script>var much_longer_payload = 12345;" +
      "</script><style>.a{b:c}</style>")
    assert(r.getAs[Int]("script_chars") > 30)
    assert(r.getAs[Int]("text_chars") === 4)
  }

  test("htmlSignals: empty and tagless inputs are well-defined") {
    val r = signals("")
    assert(r.getAs[Int]("n_tags") === 0 && r.getAs[Double]("link_density") === 0.0)
    val plain = signals("just plain text")
    assert(plain.getAs[Int]("text_chars") === 15 &&
      plain.getAs[Int]("n_links") === 0)
  }

  test("dedupNormalize: near-dups differing in case/accents/digits/punct collide") {
    import spark.implicits._
    import graft.operators.TextOps
    GraftExtensions.register(spark)
    val docs = Seq(
      (1L, "The Quick Brown Fox, version 1.2.3 — ran FAST!"),
      (2L, "the quick brown fox version 0 0 0 ran fast"),
      (3L, "Thé Qüick Brôwn Fox; Version 9.9.9... ran fast"),
      (4L, "a genuinely different document here"))
      .toDF("doc_id", "text")
    val norm = docs.select(col("doc_id"),
        TextOps.dedupNormalize(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(norm(1L) === norm(2L), s"${norm(1L)} != ${norm(2L)}")
    assert(norm(1L) === norm(3L), s"${norm(1L)} != ${norm(3L)}")
    assert(norm(1L) !== norm(4L))
    assert(norm(1L) === "the quick brown fox version 0 0 0 ran fast")
    // engine-portable corners: Greek final-sigma context lowers per
    // codepoint (matching DuckDB), Turkish dotted capital collapses
    // to plain i, and Indic SPACING vowel signs (category Mc) strip
    // like nonspacing accents do
    val corner = Seq((9L, "\u039f\u03a3 \u0130stanbul \u0915\u0940"))
      .toDF("doc_id", "text")
    val c = corner.select(TextOps.dedupNormalize(col("text")))
      .head().getString(0)
    assert(c === "\u03bf\u03c3 istanbul \u0915", c.map(_.toInt).mkString(","))
    // and therefore identical minhash signatures — the point of the op
    val sigs = docs.select(col("doc_id"),
        call_function("minhash_signature",
          TextOps.dedupNormalize(col("text")), lit(3), lit(16)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L) && sigs(1L) === sigs(3L))
    assert(sigs(1L) !== sigs(4L))
  }

  test("charEntropySignals: boundary shapes and the signal directions") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, ""),                       // empty -> all zeros
      (2L, "a"),                      // single char: H = 0, top = 1
      (3L, "aaaaaaaa"),               // repeated filler: H = 0, top = 1
      (4L, "abcdefgh"),               // uniform 8 chars: H = ln 8
      (5L, "a" * 99 + "b"),           // near-degenerate
      (6L, "a\u00f1\ud83d\ude00b"),// codepoints, not UTF-16 units
      (7L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val out = TextOps.charEntropySignals(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getInt(3), r.getLong(4)))).toMap
    assert(out(1L) === ((0.0, 0.0, 0, 0L)))
    assert(out(2L) === ((0.0, 1.0, 1, 1L)))
    assert(out(3L) === ((0.0, 1.0, 1, 8L)))
    assert(out(4L)._1 === graft.operators.EmbeddingOps.round6(math.log(8.0)))
    assert(out(4L)._2 === 0.125 && out(4L)._3 === 8)
    assert(out(5L)._2 === 0.99 && out(5L)._3 === 2)
    assert(out(6L)._3 === 4 && out(6L)._4 === 4L) // emoji is ONE char
    // real prose sits between the degenerate poles
    assert(out(7L)._1 > out(5L)._1 && out(7L)._2 < 0.3)
    // deterministic under partitioning (sorted-codepoint accumulation)
    val a = TextOps.charEntropySignals(docs.repartition(1))
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.charEntropySignals(docs.repartition(5))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    // map-only: zero exchanges
    val p = TextOps.charEntropySignals(docs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"entropy signals must be map-only:\n$p")
    // null text -> null signals (null is data; distinct from empty's
    // zeros) - matches the oracle's CASE WHEN text IS NULL contract
    val withNull = Seq((1L, Option.empty[String]), (2L, Some("ab")))
      .toDF("doc_id", "text")
    val nr = TextOps.charEntropySignals(withNull).orderBy("doc_id").collect()
    assert(nr(0).isNullAt(1) && nr(0).isNullAt(2) && nr(0).isNullAt(3) &&
      nr(0).isNullAt(4), s"null text must yield null signals: ${nr(0)}")
    assert(!nr(1).isNullAt(1))
  }
}
