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
