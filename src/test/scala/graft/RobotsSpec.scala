package graft

import org.apache.spark.sql.functions._

import graft.operators.Robots

/** RFC 9309 robots matching: the parsing and precedence rules the x91
  * oracle samples, pinned one by one.
  */
class RobotsSpec extends SparkTestBase {

  private def decide(robots: String, path: String,
                     ua: String = "graftbot"): Boolean = {
    import spark.implicits._
    val rules = Robots.rulesTable(
      Seq(("h.test", robots)).toDF("host", "robots_txt"), ua)
    val urls = Seq((1L, s"http://h.test$path")).toDF("doc_id", "url")
    Robots.robotsFilter(urls, rules).head().getAs[Boolean]("allowed")
  }

  test("specific user-agent group beats the * group") {
    val txt = "User-agent: *\nDisallow: /\n\n" +
      "User-agent: graftbot\nDisallow: /secret/\n"
    assert(decide(txt, "/open"))
    assert(!decide(txt, "/secret/x"))
    // an agent with no specific group falls back to *
    assert(!decide(txt, "/open", ua = "strangerbot"))
  }

  test("user-agent matching is case-insensitive; keys too") {
    val txt = "USER-AGENT: GraftBot\nDISALLOW: /x/\n"
    assert(!decide(txt, "/x/1", ua = "graftbot"))
  }

  test("adjacent user-agent lines share a group; a later UA starts a new one") {
    val txt = "User-agent: a\nUser-agent: graftbot\nDisallow: /both/\n\n" +
      "User-agent: b\nDisallow: /only-b/\n"
    assert(!decide(txt, "/both/p"))
    assert(decide(txt, "/only-b/p")) // b's group does not apply to us
  }

  test("longest match wins; Allow beats Disallow on ties") {
    val txt = "User-agent: graftbot\nDisallow: /a/\nAllow: /a/b/\n"
    assert(!decide(txt, "/a/x"))
    assert(decide(txt, "/a/b/x"))
    val tie = "User-agent: graftbot\nDisallow: /ab\nAllow: /ab\n"
    assert(decide(tie, "/abc"))
  }

  test("wildcards and the $ end anchor") {
    val txt = "User-agent: graftbot\nDisallow: /*.pdf$\nDisallow: /tmp*x/\n"
    assert(!decide(txt, "/docs/file.pdf"))
    assert(decide(txt, "/docs/file.pdfx")) // anchor holds
    assert(!decide(txt, "/tmp123x/y"))
    assert(decide(txt, "/tmp123x"))
  }

  test("regex metacharacters in patterns are literal") {
    val txt = "User-agent: graftbot\nDisallow: /a.b/\n"
    assert(!decide(txt, "/a.b/x"))
    assert(decide(txt, "/aXb/x")) // '.' must not match any char
  }

  test("path matching is case-sensitive (unlike agents)") {
    val txt = "User-agent: graftbot\nDisallow: /Secret/\n"
    assert(!decide(txt, "/Secret/x"))
    assert(decide(txt, "/secret/x"))
  }

  test("empty Disallow disallows nothing; comments stripped") {
    val txt = "User-agent: graftbot # our crawler\nDisallow:\n" +
      "Disallow: /real/ # but this one counts\n"
    assert(decide(txt, "/anything"))
    assert(!decide(txt, "/real/x"))
  }

  test("no robots row, empty text, and garbage all mean allowed") {
    assert(decide("", "/x"))
    assert(decide("not a robots file at all", "/x"))
    import spark.implicits._
    val rules = Robots.rulesTable(
      Seq(("other.test", "User-agent: *\nDisallow: /")).toDF("host", "robots_txt"),
      "graftbot")
    val urls = Seq((1L, "http://unlisted.test/x")).toDF("doc_id", "url")
    assert(Robots.robotsFilter(urls, rules).head().getAs[Boolean]("allowed"))
  }

  test("urls without a path default to /") {
    val txt = "User-agent: graftbot\nDisallow: /$\n"
    assert(!decide(txt, "")) // http://h.test → path "/"
    assert(decide(txt, "/page"))
  }

  test("query with no path is matched as /?query (RFC path-and-query)") {
    val txt = "User-agent: graftbot\nDisallow: /*?*\n"
    assert(!decide(txt, "?x=1"))   // http://h.test?x=1 → /?x=1
    assert(!decide(txt, "/p?x=1")) // usual shape still matches
    assert(decide(txt, "/plain"))
    // a '/' INSIDE the query value must not be mistaken for the path:
    // http://h.test?next=/admin matches as /?next=/admin, not /admin
    val adm = "User-agent: graftbot\nDisallow: /admin\n"
    assert(decide(adm, "?next=/admin"))
    assert(!decide(adm, "/admin/x"))
  }

  test("truncation at the size cap drops the partial trailing line") {
    import graft.operators.Robots._
    // craft a file where the cap lands inside a long Disallow value:
    // the partial 'Disallow: /p' must NOT become a broad prefix rule
    val head = "User-agent: graftbot\nDisallow: /early/\n"
    val filler = "# " + ("y" * 96) + "\n"
    val nFill = (MaxRobotsChars - head.length - 20) / filler.length
    val longLine = "Disallow: /private-area/" + ("z" * 400) + "\n"
    val txt = head + filler * nFill + longLine
    assert(txt.length > MaxRobotsChars)
    val rules = parseRules(txt, "graftbot")
    assert(rules.contains(("/early/", false)))
    // no synthesized sub-prefix of the cut line survives
    assert(!rules.exists(r => r._1.startsWith("/p") && r._1 != "/early/"),
      s"partial-line rule synthesized: $rules")
  }

  test("glob kernel caps hostile path length; anchors never match truncated paths") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    import graft.expressions.GlobMatchOps._
    def m(s: String, p: String) = robotsMatch(u8(s), u8(p))
    val huge = "/" + ("a" * (MaxPathChars * 2))
    // prefix matches within the cap still hold
    assert(m(huge, "/a"))
    assert(m(huge, "/*a"))
    // an anchored pattern cannot match a truncated path, even when the
    // truncated prefix happens to end compatibly (no fabricated
    // disallows), and a miss is conservative-toward-allowed
    assert(!m(huge, "/*a$"))
    assert(!m(huge + ".pdf", "/*.pdf$"))
    // bounded runtime on the hostile product shape
    val t0 = System.nanoTime()
    (0 until 50).foreach(_ => m(huge, "/" + ("*a" * 20) + "b"))
    assert((System.nanoTime() - t0) / 1e6 < 5000)
  }

  test("mixed-case host in the robots table still joins (normalized key)") {
    import spark.implicits._
    val rules = Robots.rulesTable(
      Seq((" H.Test ", "User-agent: *\nDisallow: /x/")).toDF("host", "robots_txt"),
      "graftbot")
    val urls = Seq((1L, "http://h.test/x/1")).toDF("doc_id", "url")
    assert(!Robots.robotsFilter(urls, rules).head().getAs[Boolean]("allowed"))
  }

  test("hostile backtracking pattern is matched in linear time") {
    // `/*a*a*a…` vs a long non-matching path detonates a backtracking
    // regex engine super-polynomially; the glob kernel must answer in
    // milliseconds. 20 stars × 4k path ≈ 80k char ops per (row, rule).
    val hostile = "/" + ("*a" * 20) + "b$"
    val path = "/" + ("a" * 4000) + "c"
    val t0 = System.nanoTime()
    val txt = s"User-agent: graftbot\nDisallow: $hostile\n"
    assert(decide(txt, path)) // no match → allowed, and promptly
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 30000, s"hostile pattern took ${ms}ms") // Spark job overhead dominates
    // and the kernel itself is fast and correct on its own
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    val k0 = System.nanoTime()
    assert(!graft.expressions.GlobMatchOps.robotsMatch(u8(path), u8(hostile)))
    assert(graft.expressions.GlobMatchOps.robotsMatch(
      u8("/" + ("a" * 40) + "b"), u8(hostile)))
    assert((System.nanoTime() - k0) / 1e6 < 1000)
  }

  test("hostile-input caps: oversized file, overlong rule, rule flood") {
    import graft.operators.Robots._
    // content past the byte cap is ignored (the RFC's at-least-500KiB
    // honor floor): a disallow appearing after the cap has no effect
    val pad = "# " + ("x" * 80) + "\n"
    val prelude = "User-agent: graftbot\nDisallow: /early/\n"
    val tail = "User-agent: graftbot\nDisallow: /late/\n"
    val big = prelude + pad * (MaxRobotsChars / pad.length + 10) + tail
    val rules = parseRules(big, "graftbot")
    assert(rules.contains(("/early/", false)))
    assert(!rules.exists(_._1 == "/late/"))
    // boundary: a COMPLETE line whose '\n' sits exactly at the cap
    // index is kept (its content is entirely within the cap) — the
    // off-by-one that dropped it would un-disallow a page
    val lastLine = "Disallow: /exact/"
    val ua2 = "User-agent: graftbot\n"
    val padLen = MaxRobotsChars - ua2.length - lastLine.length
    val exact = ua2 + ("#" + "x" * 98 + "\n") * (padLen / 100) +
      "#" + "y" * (padLen % 100 - 2) + "\n" + lastLine + "\nDisallow: /post/\n"
    assert(exact.indexOf(lastLine) + lastLine.length === MaxRobotsChars)
    assert(exact.charAt(MaxRobotsChars) === '\n')
    val r1b = parseRules(exact, "graftbot")
    assert(r1b.contains(("/exact/", false)), s"boundary line dropped")
    assert(!r1b.exists(_._1 == "/post/"))
    // an overlong pattern drops (conservative toward allowed)
    val longRule = s"User-agent: graftbot\nDisallow: /${"a" * MaxPatternChars}\n" +
      "Disallow: /kept/\n"
    val r2 = parseRules(longRule, "graftbot")
    assert(r2 === Seq(("/kept/", false)))
    // a rule flood truncates at the cap in file order
    val flood = "User-agent: graftbot\n" +
      (1 to MaxRulesPerHost + 100).map(i => s"Disallow: /p$i/").mkString("\n")
    val r3 = parseRules(flood, "graftbot")
    assert(r3.size === MaxRulesPerHost)
    assert(r3.head === (("/p1/", false)))
  }

  test("hostile-input caps: no-newline file, per-host pattern budget") {
    import graft.operators.Robots._
    // an oversized file with NO '\n' inside the cap keeps the capped
    // prefix — discarding it (pre-fix behavior) silently defaulted
    // the host to allowed. A CR-only legacy file is the real case:
    val crOnly = "User-agent: graftbot\rDisallow: /private/\r" +
      ("#" + "x" * 98 + "\r") * (MaxRobotsChars / 100 + 100)
    assert(!crOnly.substring(0, MaxRobotsChars).contains('\n'))
    val r0 = parseRules(crOnly, "graftbot")
    assert(r0 === Seq(("/private/", false)),
      s"CR-only oversized file must keep its in-cap rules: $r0")
    // the cut must land on a CR line boundary, dropping the trailing
    // PARTIAL line: a truncated `Allow: /private/terms…` would
    // OUT-RANK `Disallow: /private` under longest-match precedence
    // and un-gate paths the full file disallows
    val head = "User-agent: graftbot\rDisallow: /private\r"
    val pad = ("#" + "y" * 98 + "\r") * ((MaxRobotsChars - head.length) / 100)
    val partialAllow = head + pad + "Allow: /private/terms" + "z" * MaxRobotsChars
    assert(!partialAllow.substring(0, MaxRobotsChars).contains('\n'))
    val r0b = parseRules(partialAllow, "graftbot")
    assert(r0b === Seq(("/private", false)),
      s"a truncated Allow rule must be dropped, not kept as a prefix: $r0b")
    // bare-CR endings also parse at normal sizes
    assert(parseRules("User-agent: *\rDisallow: /a/\rAllow: /a/b\r",
      "graftbot") === Seq(("/a/", false), ("/a/b", true)))
    // per-host WILDCARD budget: max-length star-bearing rules stop
    // being honored once their Σ chars passes MaxPatternCharsPerHost —
    // only wildcard patterns can cost path × pattern in the kernel
    val n = MaxPatternCharsPerHost / (MaxPatternChars - 1) + 5
    val fat = "User-agent: graftbot\n" + (1 to n)
      .map(i => s"Disallow: /${i}*${"a" * (MaxPatternChars - 13)}")
      .mkString("\n")
    val r2 = parseRules(fat, "graftbot")
    assert(r2.nonEmpty && r2.size < n,
      s"wildcard budget must drop trailing star rules: kept ${r2.size}/$n")
    assert(r2.map(_._1.length).sum <= MaxPatternCharsPerHost)
    assert(r2.head._1.startsWith("/1"), "rules drop in file order")
    // star-FREE prefix rules never charge the budget: a legitimate
    // file whose literal Disallow paths sum past 64 KiB (thousands of
    // long section paths) keeps EVERY rule — dropping one would
    // silently un-gate a disallowed section — and prefix rules AFTER
    // an exhausted wildcard budget still parse
    val longPrefix = (1 to 800)
      .map(i => s"Disallow: /section-$i/${"p" * 120}")
    val mixed = "User-agent: graftbot\n" + fat.linesIterator.drop(1).mkString("\n") +
      "\n" + longPrefix.mkString("\n")
    val r3 = parseRules(mixed, "graftbot")
    assert(r3.count(!_._1.contains('*')) === 800,
      "prefix rules must survive an exhausted wildcard budget")
    assert(longPrefix.map(_.length - "Disallow: ".length).sum > MaxPatternCharsPerHost,
      "test corpus must genuinely exceed the budget in prefix chars")
    // legitimate files are far below any cap — nothing drops
    val normal = "User-agent: graftbot\n" +
      (1 to 200).map(i => s"Disallow: /sec$i/").mkString("\n")
    assert(parseRules(normal, "graftbot").size === 200)
  }

  test("glob kernel fuzz: bit-equal to the translated-regex reference") {
    // the regex translation the kernel replaced, kept here as the
    // semantic reference: ^escaped, '*' -> '.*', trailing '$' anchor,
    // find() = prefix-or-anchored match
    def refMatch(s: String, p: String): Boolean = {
      val endAnchor = p.endsWith("$")
      val body = if (endAnchor) p.dropRight(1) else p
      val sb = new StringBuilder("^")
      body.foreach {
        case '*' => sb.append(".*")
        case c if "\\.[]{}()<>+-=!?^$|".indexOf(c) >= 0 =>
          sb.append('\\').append(c)
        case c => sb.append(c)
      }
      if (endAnchor) sb.append('$')
      java.util.regex.Pattern.compile(sb.toString).matcher(s).find()
    }
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    val alphabet = "ab/.*$?-_1"
    val rnd = new scala.util.Random(20260814)
    var checked = 0
    (0 until 120000).foreach { _ =>
      val path = "/" + (0 until rnd.nextInt(12))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val pat = (0 until 1 + rnd.nextInt(8))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      // keep the reference side off pathological star counts
      if (pat.count(_ == '*') <= 4) {
        val got = graft.expressions.GlobMatchOps.robotsMatch(u8(path), u8(pat))
        val want = refMatch(path, pat)
        assert(got === want, s"<$path> vs <$pat>: kernel $got regex $want")
        checked += 1
      }
    }
    assert(checked > 100000)
  }

  test("glob kernel: anchors, prefix semantics, literals, star runs") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    def m(s: String, p: String) =
      graft.expressions.GlobMatchOps.robotsMatch(u8(s), u8(p))
    assert(m("/a/b/c", "/a/"))        // prefix
    assert(!m("/a", "/a/"))           // pattern longer than path
    assert(m("/x.pdf", "/*.pdf$"))    // end anchor
    assert(!m("/x.pdfz", "/*.pdf$"))
    assert(m("/x.pdfz", "/*.pdf"))    // no anchor → prefix
    assert(m("/ab", "/a**b$"))        // star runs collapse
    assert(m("/aXYb", "/a**b$"))
    assert(!m("/aXb", "/a.b"))        // '.' literal
    assert(m("/a$b/c", "/a$b"))       // interior '$' literal
    assert(m("/anything", "*"))
    assert(m("", ""))                 // empty pattern matches
  }

  test("decision plan: host-keyed join + one max_by aggregation, no products") {
    import spark.implicits._
    val rules = Robots.rulesTable(
      Seq(("h.test", "User-agent: *\nDisallow: /a/")).toDF("host", "robots_txt"),
      "graftbot")
    val urls = Seq((1L, "http://h.test/a/b")).toDF("doc_id", "url")
    val p = Robots.robotsFilter(urls, rules)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"product join in robotsFilter:\n$p")
  }
}
