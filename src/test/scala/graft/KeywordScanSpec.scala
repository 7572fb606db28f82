package graft

import org.apache.spark.sql.functions._

import graft.expressions.AhoCorasickOps
import graft.operators.TextOps

/** Aho-Corasick keyword scan: the classic construction edge cases
  * (failure links, suffix-emit inheritance, overlapping matches) the
  * x84 oracle samples statistically, verified one by one, plus a
  * seeded randomized equivalence against naive substring counting.
  */
class KeywordScanSpec extends SparkTestBase {

  private def counts(patterns: Seq[String], text: String): Seq[Int] =
    AhoCorasickOps.compile(patterns).counts(text).toSeq

  test("classic he/she/his/hers over 'ushers'") {
    assert(counts(Seq("he", "she", "his", "hers"), "ushers") ===
      Seq(1, 1, 0, 1)) // "he" emitted through the she-suffix link
  }

  test("overlapping occurrences all count") {
    assert(counts(Seq("aa"), "aaaa") === Seq(3))
    assert(counts(Seq("aba"), "ababa") === Seq(2))
  }

  test("nested patterns count independently") {
    assert(counts(Seq("a", "ab", "abc"), "abc abd xab") === Seq(3, 3, 1))
  }

  test("failure transitions restart mid-pattern") {
    // after "ab" fails on 'a', the scan must resume at the new "a"
    assert(counts(Seq("abb"), "ababb") === Seq(1))
    assert(counts(Seq("aab"), "aaab") === Seq(1))
  }

  test("matching is case-sensitive char equality") {
    assert(counts(Seq("scan"), "Scan scan SCAN") === Seq(1))
  }

  test("empty text and absent patterns yield zeros") {
    assert(counts(Seq("x", "yz"), "") === Seq(0, 0))
    assert(counts(Seq("zzzq"), "no match here") === Seq(0))
  }

  test("compile rejects empty and duplicate patterns") {
    intercept[IllegalArgumentException](AhoCorasickOps.compile(Nil))
    intercept[IllegalArgumentException](AhoCorasickOps.compile(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasickOps.compile(Seq("a", "a")))
  }

  test("seeded random equivalence with naive substring counting") {
    val rnd = new scala.util.Random(42)
    def randStr(maxLen: Int): String =
      (0 until (1 + rnd.nextInt(maxLen))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    (1 to 60).foreach { _ =>
      val pats = Iterator.continually(randStr(4)).distinct.take(1 + rnd.nextInt(5)).toSeq
      val text = randStr(60)
      val naive = pats.map { p =>
        (0 to text.length - p.length).count(i => text.startsWith(p, i))
      }
      assert(counts(pats, text) === naive, s"patterns=$pats text=$text")
    }
  }

  test("keywordTag: counts, totals and matched list through the kernel") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val docs = Seq((1L, "the fast table holds a fast table scan"),
                   (2L, "nothing relevant")).toDF("doc_id", "text")
    val out = TextOps.keywordTag(docs, Seq("fast table", "scan", "zzzq"))
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[Int](1) === Seq(2, 1, 0))
    assert(out(0).getAs[Int]("n_hits") === 3)
    assert(out(0).getSeq[String](3) === Seq("fast table", "scan"))
    assert(out(1).getAs[Int]("n_hits") === 0)
    assert(out(1).getSeq[String](3) === Seq.empty)
  }

  test("keywordTag plan is map-only (zero exchanges)") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val p = TextOps.keywordTag(docs, Seq("x"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("HashAggregate"),
      s"keywordTag must be a pure projection:\n$p")
  }

  test("automaton scales to a large dictionary in one pass") {
    val pats = (0 until 2000).map(i => f"kw$i%04d unique")
    val a = AhoCorasickOps.compile(pats)
    val text = "prefix kw0007 unique middle kw1999 unique suffix"
    val c = a.counts(text)
    assert(c(7) === 1 && c(1999) === 1 && c.sum === 2)
  }
}
