package graft

import graft.operators.TextOps

/** C4-style line-level dedup: first occurrence (smallest (doc_id,
  * pos)) survives, every other copy corpus-wide drops, documents
  * reassemble in position order. */
class LineDedupSpec extends SparkTestBase {

  private def run(rows: Seq[(Long, String)]): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    TextOps.lineDedup(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("cross-document duplicate keeps only the earliest (doc_id, pos)") {
    val out = run(Seq(
      (1L, "alpha\nboiler"),
      (2L, "boiler\nbeta"),
      (3L, "boiler")))
    assert(out(1L) === (("alpha\nboiler", 2L, 0L)))
    assert(out(2L) === (("beta", 1L, 1L)))
    assert(out(3L) === (("", 0L, 1L)))
  }

  test("within-document repeat: first position wins, order preserved") {
    val out = run(Seq((7L, "x\ny\nx\nz")))
    assert(out(7L) === (("x\ny\nz", 3L, 1L)))
  }

  test("blank lines are exempt: paragraph separators survive in every doc") {
    val out = run(Seq(
      (1L, "para1\n\npara2"),
      (2L, "para3\n\npara4"),
      (3L, "  \nx")))
    // the empty separator line is NOT deduped corpus-wide
    assert(out(1L) === (("para1\n\npara2", 3L, 0L)))
    assert(out(2L) === (("para3\n\npara4", 3L, 0L)))
    // whitespace-only lines are trivial too
    assert(out(3L) === (("  \nx", 2L, 0L)))
  }

  test("minDedupLen exempts sub-minimum lines from corpus-wide dedup") {
    import spark.implicits._
    val docs = Seq((1L, "ok\nlong shared line"), (2L, "ok\nlong shared line"))
      .toDF("doc_id", "text")
    val out = TextOps.lineDedup(docs, minDedupLen = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "ok\nlong shared line")
    assert(out(2L) === "ok") // short "ok" exempt; long line deduped
  }

  test("paragraphDedup: blank-line-separated blocks dedup corpus-wide") {
    import spark.implicits._
    val docs = Seq(
      (1L, "intro one\n\nshared legal boilerplate\nblock two lines"),
      (2L, "other intro\n\nshared legal boilerplate\nblock two lines"))
      .toDF("doc_id", "text")
    val out = TextOps.paragraphDedup(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "intro one\n\nshared legal boilerplate\nblock two lines")
    assert(out(2L) === "other intro") // whole repeated block dropped
  }

  test("gopher repetition signals: duplicated lines/paragraphs/bigrams") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b\na b\nc d"),                 // 3 lines, one dup; bigrams of "a b a b c d"
      (2L, "p q\n\np q\n\nr s"),             // 3 paragraphs, one dup
      (3L, "unique text only here"),
      (4L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.gopherRepetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // doc 1: 3 lines, 2 distinct → 1/3 dup; tokens a b a b c d → 5
    // bigrams, "a b" appears twice → 0.4
    assert(got(1L)._1 === 0.333333)
    assert(got(1L)._3 === 0.4)
    // doc 2: paragraphs (p q, p q, r s) → 1/3 dup
    assert(got(2L)._2 === 0.333333)
    assert(got(3L) === ((0.0, 0.0, round2(1.0 / 3))))
    assert(got(4L) === ((0.0, 0.0, 0.0)))
  }

  private def round2(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("no duplicates anywhere is the identity") {
    val docs = Seq((1L, "a\nb"), (2L, "c\nd"))
    val out = run(docs)
    assert(out(1L) === (("a\nb", 2L, 0L)))
    assert(out(2L) === (("c\nd", 2L, 0L)))
  }

  test("idempotent on random corpora: a second pass never drops a line") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // random docs over a tiny line vocabulary → heavy cross-doc and
    // within-doc duplication in the first pass
    val docs = (0L until 60L).map { i =>
      (i, (0 until 1 + rnd.nextInt(5))
        .map(_ => s"line${rnd.nextInt(12)}").mkString("\n"))
    }
    val once = TextOps.lineDedup(docs.toDF("doc_id", "text"))
    val onceRows = once.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // global invariant: each surviving line appears at most once
    val survivingLines = onceRows.flatMap(_._2.split("\n").filter(_.nonEmpty))
    assert(survivingLines.distinct.length === survivingLines.length)
    // conservation: per doc, kept + dropped = original line count
    val orig = docs.toMap
    onceRows.foreach { case (id, _, kept, dropped) =>
      assert(kept + dropped === orig(id).split("\n", -1).length.toLong, s"doc $id")
    }
    // idempotence: the deduped corpus passes through unchanged
    val again = TextOps.lineDedup(
        once.select($"doc_id", $"clean_text".as("text"))
          .where($"clean_text" =!= ""))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(again.forall(_._3 === 0L), "second pass dropped a line")
  }
}
