package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** URL canonicalization, URL-level dedup and per-domain quotas —
  * including the two-phase quota's exact equivalence to the naive
  * single-window formulation under adversarial host skew. */
class UrlOpsSpec extends SparkTestBase {

  private def canon(urls: (String)*): Seq[Option[String]] = {
    import spark.implicits._
    urls.toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  test("canonicalize: scheme/host lowercase, port, www, slash, fragment") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/A/B/#frag",
      "http://example.com:80/",
      "http://example.com:8080/x",   // non-default port kept
      "ftp://Files.example.com:21/x" // unknown scheme: port kept
    ) === Seq(
      Some("https://example.com/A/B"),
      Some("http://example.com"),
      Some("http://example.com:8080/x"),
      Some("ftp://files.example.com:21/x")))
  }

  test("canonicalize: tracking params drop, the rest sort; ? only when nonempty") {
    assert(canon(
      "http://a.com/p?b=2&utm_source=x&a=1",
      "http://a.com/p?utm_campaign=y",
      "http://a.com/p?fbclid=1&gclid=2&msclkid=3",
      "http://a.com/p?utm=keep&utmx=keep2" // NOT utm_<...> — kept
    ) === Seq(
      Some("http://a.com/p?a=1&b=2"),
      Some("http://a.com/p"),
      Some("http://a.com/p"),
      Some("http://a.com/p?utm=keep&utmx=keep2")))
  }

  test("canonicalize: non-URLs and null are null; empty query/path edges") {
    assert(canon("not a url", "www.example.com/x", "", "http://h", "http://h/?")
      === Seq(None, None, None, Some("http://h"), Some("http://h")))
    import spark.implicits._
    val n = Seq((1L, Option.empty[String])).toDF("id", "url")
      .select(UrlOps.canonicalizeUrl(col("url"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("urlDedup: longest text wins, ties to smallest id, malformed keeps") {
    import spark.implicits._
    val docs = Seq(
      (1L, "short", "http://www.d.com/p?utm_a=1"),
      (2L, "the longest body", "http://d.com/p/"),
      (3L, "the longest bodz", "http://d.com/p"), // same len as 2 → id 2 wins
      (4L, "whatever", "oops"),
      (5L, "unique", "http://e.com/q")).toDF("doc_id", "text", "url")
    val out = UrlOps.urlDedup(docs).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getLong(2)))).toMap
    assert(out.keySet === Set(2L, 4L, 5L))
    assert(out(2L) === ((Some("http://d.com/p"), 3L)))
    assert(out(4L) === ((None, 1L)))
    assert(out(5L) === ((Some("http://e.com/q"), 1L)))
  }

  test("domainQuota: equals the naive single-window rule under host skew") {
    import spark.implicits._
    // one mega-host (480 rows), two small hosts, a hostless tail —
    // scores collide heavily so tie-breaks are exercised
    val docs = (1L to 520L).map { id =>
      val url =
        if (id > 500) "garbage"
        else if (id > 490) s"https://small${id % 2}.ex.com/$id"
        else s"https://mega.ex.com/page/$id"
      (id, (id % 7).toDouble, url)
    }.toDF("doc_id", "score", "url")
    val fast = UrlOps.domainQuota(docs, maxPerDomain = 5, preBuckets = 8)
      .select("doc_id", "host", "rank_in_host").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // naive oracle: one global window per host
    import org.apache.spark.sql.expressions.Window
    val hosted = docs.withColumn("host",
      graft.operators.TextOps.extractHost(col("url")))
    val naive = hosted.where(col("host") =!= "")
      .withColumn("rank_in_host", row_number().over(
        Window.partitionBy("host")
          .orderBy(col("score").desc, col("doc_id").asc)))
      .where(col("rank_in_host") <= 5)
      .unionByName(hosted.where(col("host") === "")
        .withColumn("rank_in_host", lit(0)))
      .select("doc_id", "host", "rank_in_host").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(fast === naive)
    assert(fast.count(_._2 == "mega.ex.com") === 5)
    assert(fast.count(_._3 == 0) === 20) // hostless rows all keep
  }
}
