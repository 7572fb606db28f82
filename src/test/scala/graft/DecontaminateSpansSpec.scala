package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Span-level decontamination: the surgical contract the x94 oracle
  * samples — quotes excised, documents preserved, eval text surviving
  * NOWHERE — pinned case by case.
  */
class DecontaminateSpansSpec extends SparkTestBase {

  private def run(train: Seq[(Long, String)], eval: Seq[String], k: Int = 4) = {
    import spark.implicits._
    Dedup.decontaminateSpans(
      train.toDF("doc_id", "text"),
      eval.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      k = k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
  }

  test("a quoted benchmark span is excised; the document survives") {
    val out = run(
      train = Seq((1L, "intro words here then the secret eval span q here and a long tail after it")),
      eval = Seq("the secret eval span q"))
    // eval has 5 tokens → two 4-grams; both occurrences of the span
    // windows are removed, surrounding text intact
    assert(out.head._2.startsWith("intro words here then"))
    assert(out.head._2.endsWith("here and a long tail after it"))
    assert(!out.head._2.contains("secret eval span"))
    assert(out.head._3 === 5L)
  }

  test("a document that IS an eval copy empties out") {
    val out = run(
      train = Seq((1L, "exact benchmark question text four"),
                  (2L, "completely unrelated clean document text")),
      eval = Seq("exact benchmark question text four"))
    assert(out(0)._2 === "" && out(0)._3 === 5L)
    assert(out(1)._2 === "completely unrelated clean document text" &&
      out(1)._3 === 0L)
  }

  test("every occurrence is removed — no keeper exemption") {
    val out = run(
      train = Seq(
        (1L, "aa bb cc dd xx"),
        (2L, "yy aa bb cc dd zz")),
      eval = Seq("aa bb cc dd"))
    assert(out(0)._2 === "xx")
    assert(out(1)._2 === "yy zz")
  }

  test("matching is token-lowercase; surviving text keeps original case") {
    val out = run(
      train = Seq((1L, "KEEP This AA BB CC DD Tail Words")),
      eval = Seq("aa bb cc dd"))
    assert(out.head._2 === "KEEP This Tail Words")
  }

  test("cleaned corpus re-scans contamination-free at the same k") {
    import spark.implicits._
    val train = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "alpha beta one two three four five gamma delta"))
      .toDF("doc_id", "text")
    val eval = Seq((0L, "one two three four five")).toDF("doc_id", "text")
    val cleaned = Dedup.decontaminateSpans(train, eval, k = 4)
      .select(col("doc_id"), col("text_clean").as("text"))
    val recheck = Dedup.decontaminateSpans(cleaned, eval, k = 4)
    assert(recheck.agg(sum("n_removed")).head.getLong(0) === 0L)
  }

  test("overlapping eval windows merge into one interval") {
    val out = run(
      train = Seq((1L, "p q a b c d e f r s")),
      eval = Seq("a b c d e f"))
    assert(out.head._2 === "p q r s")
    assert(out.head._3 === 6L)
  }

  test("short documents (< k tokens) pass through renormalized") {
    val out = run(train = Seq((1L, "  one   two  ")), eval = Seq("a b c d"))
    assert(out.head === ((1L, "one two", 0L)))
  }
}
