package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** TextOps.exactSpanDedup (x58): ExactSubstr-style duplicated-span
  * removal — certified against a DRIVER-SIDE naive twin that applies
  * the first-occurrence rule positionally (no hashing, no intervals:
  * it marks every covered token of every non-first k-gram occurrence
  * directly), plus the contract's edge cases and the plan shape. */
class ExactSpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  // --- naive twin: literal grams, direct position marking ------------------

  private def naive(docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long)] = {
    // original tokens; matching is on the per-token-lowercased stream
    val words = docs.map { case (id, t) =>
      id -> Option(t).map(_.trim.split("\\s+").filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
    }.toMap
    // every k-gram occurrence in corpus order (lowercased keys)
    val occs = for {
      (id, ws) <- words.toSeq.sortBy(_._1)
      s <- 0 to ws.length - k
    } yield (ws.slice(s, s + k)
      .map(_.toLowerCase(java.util.Locale.ROOT)).mkString(" "), id, s)
    val firsts = occs.groupBy(_._1).view
      .mapValues(_.map(o => (o._2, o._3)).min).toMap
    val counts = occs.groupBy(_._1).view.mapValues(_.size).toMap
    val removedPos: Map[Long, Set[Int]] = occs
      .filter { case (g, id, s) => counts(g) > 1 && firsts(g) != ((id, s)) }
      .groupBy(_._2).view
      .mapValues(_.flatMap { case (_, _, s) => s until s + k }.toSet).toMap
    docs.map { case (id, _) =>
      val ws = words(id)
      val rm = removedPos.getOrElse(id, Set.empty)
      val keptText = ws.zipWithIndex.collect { case (w, i) if !rm(i) => w }
      id -> (keptText.mkString(" "), rm.size.toLong)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long)] =
    TextOps.exactSpanDedup(docs.toDF("doc_id", "text"), k = k)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("matches the naive positional twin on overlapping shared spans") {
    val boiler = "all rights reserved contact us terms of service apply here"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"unrelated words only zeta eta theta iota kappa"),
      (3L, s"$boiler and then some more original content follows now"),
      (4L, s"prefix words here $boiler"),        // span at the very end
      (5L, s"$boiler $boiler"))                  // duplicated within one doc too
    for (k <- Seq(4, 8)) {
      assert(run(docs, k) === naive(docs, k), s"k=$k")
    }
  }

  test("mixed-case text survives excision with casing intact; matching is case-insensitive") {
    val docs = Seq(
      (1L, "Intro Words Here ALL Rights Reserved Contact Us Terms Apply"),
      (2L, "Other Content all rights reserved contact us terms APPLY Tail Words"))
    val out = run(docs, k = 7)
    // doc 1 keeps everything (first occurrence), ORIGINAL casing intact
    assert(out(1L) === ((docs.head._2, 0L)))
    // doc 2 loses the boilerplate span (case-insensitive match with doc
    // 1's differently-cased copy) but its surviving tokens keep casing
    assert(out(2L) === (("Other Content Tail Words", 7L)))
    assert(out === naive(docs, 7))
  }

  test("an exact duplicate document is fully excised; the first survives") {
    val text = "one two three four five six seven eight nine ten"
    val out = run(Seq((1L, text), (2L, text)), k = 4)
    assert(out(1L) === ((text, 0L)))
    assert(out(2L) === (("", 10L)))
  }

  test("edges: shorter-than-k, null, and empty docs pass through") {
    val out = run(Seq((1L, "just three words"), (2L, null), (3L, "  ")), k = 8)
    assert(out(1L) === (("just three words", 0L)))
    assert(out(2L) === (("", 0L)))
    assert(out(3L) === (("", 0L)))
  }

  test("within-document periodic repetition collapses to one token") {
    val out = run(Seq((1L, ("spam " * 12).trim)), k = 4)
    // grams all identical and OVERLAPPING: the non-first occurrences at
    // s=1..8 cover positions [1,12), so only position 0 survives — the
    // documented contract for self-overlapping periodic text
    assert(out(1L) === (("spam", 11L)))
    assert(out(1L) === naive(Seq((1L, ("spam " * 12).trim)), 4)(1L))
  }

  test("plan: no cartesian products, keeper aggregation is partial") {
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val plan = TextOps.exactSpanDedup(docs, k = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"), plan)
  }
}
