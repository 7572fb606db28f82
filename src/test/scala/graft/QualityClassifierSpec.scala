package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

/** QualityClassifier (x57): trained NB quality filter over hashed
  * word+bigram features — certified against a DRIVER-SIDE naive twin
  * (plain-Scala NB with the same salted-md5 hashing, a different
  * implementation of the same contract), plus edge cases and the
  * broadcast plan shape. */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // --- naive driver-side twin ---------------------------------------------

  private def md5Bucket(term: String, d: Int): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(("qc_" + term).getBytes("UTF-8"))
    val hex = dig.map("%02x".format(_)).mkString.substring(0, 7)
    java.lang.Long.parseLong(hex, 16) % d
  }

  private def terms(text: String): Seq[String] = {
    val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
  }

  private def naiveScores(labeled: Seq[(Long, String, Int)],
                          docs: Seq[(Long, String)],
                          d: Int, k: Double): Map[Long, Option[Double]] = {
    val trainRows = labeled.flatMap { case (_, t, y) =>
      terms(t).map(term => (md5Bucket(term, d), y)) }
    val cPos = trainRows.filter(_._2 == 1).groupBy(_._1).view.mapValues(_.size).toMap
    val cNeg = trainRows.filter(_._2 == 0).groupBy(_._1).view.mapValues(_.size).toMap
    val (tPos, tNeg) = (trainRows.count(_._2 == 1), trainRows.count(_._2 == 0))
    docs.map { case (id, t) =>
      val fs = terms(t).map(md5Bucket(_, d))
      id -> (if (fs.isEmpty) None else Some {
        val llrs = fs.map { f =>
          math.log((cPos.getOrElse(f, 0) + k) / (tPos + k * d)) -
          math.log((cNeg.getOrElse(f, 0) + k) / (tNeg + k * d))
        }
        BigDecimal(llrs.sum / llrs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      })
    }.toMap
  }

  private val labeled = Seq(
    (0L, "the curious reader finds careful prose and clear argument here", 1),
    (2L, "a well written essay explains the clear idea with careful care", 1),
    (4L, "click here buy now cheap cheap deals click buy now", 0),
    (6L, "win free money now click click cheap pills buy", 0))
  private val docsAll = Seq(
    (0L, "the curious reader finds careful prose and clear argument here"),
    (1L, "a careful clear essay the reader finds curious"),
    (3L, "buy cheap pills click now free money win deals"),
    (5L, ""),
    (7L, "zzz qqq vvv"))

  test("scores match the driver-side naive twin, including collisions") {
    for (d <- Seq(8, 4096)) { // d=8 forces heavy hash collisions
      val (counts, totals) = QualityClassifier.train(
        labeled.toDF("doc_id", "text", "label"), numBuckets = d)
      val got = QualityClassifier.score(
          docsAll.toDF("doc_id", "text"), counts, totals, numBuckets = d, k = 1.0)
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val want = naiveScores(labeled, docsAll, d, 1.0)
      for ((id, w) <- want) (got(id), w) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) <= 1e-6, s"doc $id d=$d")
        case (g, e)             => assert(g === e, s"doc $id d=$d")
      }
    }
  }

  test("the trained filter separates the classes it was trained on") {
    val (counts, totals) = QualityClassifier.train(
      labeled.toDF("doc_id", "text", "label"), numBuckets = 4096)
    val s = QualityClassifier.score(
        docsAll.toDF("doc_id", "text"), counts, totals, numBuckets = 4096)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(s(1L) > 0, "wiki-like doc must score positive")
    assert(s(3L) < 0, "spam-like doc must score negative")
    assert(s(1L) > s(3L) + 0.5, "classes must separate clearly")
  }

  test("edges: empty text scores null with n_terms 0; n_terms = 2n-1") {
    val (counts, totals) = QualityClassifier.train(
      labeled.toDF("doc_id", "text", "label"), numBuckets = 64)
    val out = QualityClassifier.score(
        Seq((5L, ""), (8L, null: String), (9L, "one two three"))
          .toDF("doc_id", "text"), counts, totals, numBuckets = 64)
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.getLong(2))).toMap
    assert(out(5L) === ((true, 0L)))  // empty → no terms
    assert(out(8L) === ((true, 0L)))  // null text → no silent drop
    assert(out(9L) === ((false, 5L))) // 3 words + 2 bigrams
  }

  test("scores are partition-invariant") {
    val (counts, totals) = QualityClassifier.train(
      labeled.toDF("doc_id", "text", "label"), numBuckets = 4096)
    def run(parts: Int) = QualityClassifier.score(
        docsAll.toDF("doc_id", "text").repartition(parts), counts, totals,
        numBuckets = 4096)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val (a, b) = (run(1), run(7))
    for ((id, va) <- a) (va, b(id)) match {
      case (Some(x), Some(y)) => assert(math.abs(x - y) <= 1e-6, s"doc $id")
      case (x, y)             => assert(x === y, s"doc $id")
    }
  }

  test("fastHash path: same term counts, classes still separate") {
    val (counts, totals) = QualityClassifier.train(
      labeled.toDF("doc_id", "text", "label"), numBuckets = 4096,
      fastHash = true)
    val s = QualityClassifier.score(
        docsAll.toDF("doc_id", "text"), counts, totals, numBuckets = 4096,
        fastHash = true)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) Double.NaN else r.getDouble(1)), r.getLong(2))).toMap
    assert(s(1L)._2 === 15L) // 8 words + 7 bigrams — hashing doesn't change counts
    assert(s(1L)._1 > 0 && s(3L)._1 < 0, s"fast-hash model must separate: $s")
  }

  test("plan: the model join broadcasts — no sort-merge join in score") {
    val (counts, totals) = QualityClassifier.train(
      labeled.toDF("doc_id", "text", "label"), numBuckets = 4096)
    val plan = QualityClassifier.score(
        docsAll.toDF("doc_id", "text"), counts, totals, numBuckets = 4096)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
           plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
