package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranking
import graft.sources.Tables

class RankingSpec extends SparkTestBase {
  import spark.implicits._

  test("topKPerGroup equals the window rank on documents") {
    val docs = Tables.documents(spark, sfDir)
    val viaHeap = Ranking.topKPerGroup(docs, "lang", "n_chars", "doc_id", k = 5)
    val viaWindow = docs
      .withColumn("rank", row_number().over(
        Window.partitionBy($"lang").orderBy($"n_chars".desc, $"doc_id".asc))
        .cast("int"))
      .where($"rank" <= 5)
      .select($"lang", $"doc_id", $"n_chars", $"rank")
    assert(viaHeap.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaHeap).isEmpty)
  }

  test("topKPerGroup: groups smaller than k rank densely; asc mode") {
    val df = Seq(("a", 3L, 1L), ("a", 1L, 2L), ("b", 9L, 3L))
      .toDF("g", "score", "id")
    val out = Ranking.topKPerGroup(df, "g", "score", "id", k = 5,
      desc = false).orderBy("g", "rank")
      .as[(String, Long, Long, Int)].collect().toSeq
    assert(out == Seq(("a", 2L, 1L, 1), ("a", 1L, 3L, 2), ("b", 3L, 9L, 1)))
  }

  test("rrfFuse: overlap sums both sides, one-sided candidates score one term") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q_id", "vec_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("q_id", "vec_id", "rank")
    val out = Ranking.rrfFuse(a, b, k = 3).orderBy("rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    // 11: 1/62 + 1/61 (both) > 10: 1/61 > 12: 1/62
    assert(out.map(_._2) == Seq(11L, 10L, 12L))
    assert(out.head._3 == 1.0 / 62 + 1.0 / 61)
    assert(out(1)._3 == 1.0 / 61 && out(2)._3 == 1.0 / 62)
    assert(out.map(_._4) == Seq(1, 2, 3))
  }

  test("rrfFuse ties break to the lower id") {
    // X only in a at rank 1, Y only in b at rank 1 -> equal rrf
    val a = Seq((7L, 5L, 1)).toDF("q_id", "vec_id", "rank")
    val b = Seq((7L, 2L, 1)).toDF("q_id", "vec_id", "rank")
    val out = Ranking.rrfFuse(a, b, k = 2).orderBy("rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(out.map(_._2) == Seq(2L, 5L))
  }

  test("evalBinaryRetrieval: perfect, partial, miss and no-relevant queries") {
    // q1: 2 relevant, both retrieved at ranks 1-2 of k=3 -> ndcg 1, recall 1
    // q2: 3 relevant, one retrieved at rank 3 -> dcg=d3, idcg=d1+d2+d3
    // q3: 1 relevant, none retrieved -> ndcg 0, recall 0
    // q4: no relevant pairs at all -> null ndcg/recall
    val ranking = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      (3L, 30L, 1), (4L, 40L, 1)).toDF("q_id", "vec_id", "rank")
    val qrels = Seq(
      (1L, 10L), (1L, 11L),
      (2L, 22L), (2L, 98L), (2L, 99L),
      (3L, 77L)).toDF("q_id", "vec_id")
    val out = graft.operators.Ranking
      .evalBinaryRetrieval(ranking, qrels, k = 3)
      .orderBy("q_id")
      .as[(Long, Int, Int, Option[Double], Option[Double])].collect().toSeq
    def d(i: Int) = graft.operators.Ranking.dcgDiscount(i)
    assert(out(0) == ((1L, 2, 2, Some((d(1) + d(2)) / (d(1) + d(2))), Some(1.0))))
    assert(out(1) == ((2L, 3, 1, Some(d(3) / (d(1) + d(2) + d(3))), Some(1.0 / 3))))
    assert(out(2) == ((3L, 1, 0, Some(0.0), Some(0.0))))
    assert(out(3)._1 == 4L && out(3)._4.isEmpty && out(3)._5.isEmpty)
  }

  test("evalBinaryRetrieval scores a query the retriever returned NOTHING for") {
    // q9 has relevant pairs but zero ranking rows — dropping it would
    // inflate downstream mean ndcg/recall; it must score 0.0, not vanish
    val ranking = Seq((1L, 10L, 1)).toDF("q_id", "vec_id", "rank")
    val qrels = Seq((1L, 10L), (9L, 90L), (9L, 91L)).toDF("q_id", "vec_id")
    val out = graft.operators.Ranking
      .evalBinaryRetrieval(ranking, qrels, k = 2)
      .orderBy("q_id")
      .as[(Long, Int, Int, Option[Double], Option[Double])].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 9L), s"zero-hit query dropped: $out")
    assert(out(1) == ((9L, 2, 0, Some(0.0), Some(0.0))))
  }

  test("mmrSelect ranks string ids (tie to the LOWER id, lexicographic)") {
    GraftExtensions.register(spark)
    val cands = Seq(("q1", "b", 0.7), ("q1", "a", 0.7)).toDF("q_id", "vec_id", "rel")
    val codes = Seq(("a", Seq[Byte](1, 2)), ("b", Seq[Byte](-3, 4)))
      .toDF("vec_id", "q_codes")
    val out = Ranking.mmrSelect(cands, codes, k = 2)
      .orderBy("round").as[(String, String, Double, Int)].collect().toSeq
    assert(out.map(_._2) == Seq("a", "b"), s"string-id tie-break broke: $out")
  }

  test("rrfFuse ≡ topKPerGroup over rrfScoresTagged on the union form") {
    GraftExtensions.register(spark)
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("q_id", "vec_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2), (2L, 21L, 1))
      .toDF("q_id", "vec_id", "rank")
    val fused = Ranking.rrfFuse(a, b, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    val tagged = a.withColumn("src", lit("a"))
      .unionByName(b.withColumn("src", lit("b")))
    val viaTagged = Ranking.topKPerGroup(
        Ranking.rrfScoresTagged(tagged), "q_id", "rrf", "vec_id", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    assert(viaTagged == fused, "tagged-union fusion diverged from rrfFuse")
  }

  test("evalBinaryRetrievalStream == the batch eval minus zero-hit queries") {
    val ranking = Seq((1L, 10L, 1), (1L, 11L, 2), (3L, 30L, 1))
      .toDF("q_id", "vec_id", "rank")
    val qrels = Seq((1L, 10L), (3L, 77L), (9L, 90L)).toDF("q_id", "vec_id")
    val batch = graft.operators.Ranking
      .evalBinaryRetrieval(ranking, qrels, k = 2)
      .as[(Long, Int, Int, Option[Double], Option[Double])].collect().toSeq
    val core = graft.operators.Ranking
      .evalBinaryRetrievalStream(ranking, qrels, k = 2)
      .as[(Long, Int, Int, Option[Double], Option[Double])].collect().toSeq
    assert(core.sorted == batch.filter(_._1 != 9L).sorted)
    assert(batch.exists(r => r._1 == 9L && r._4 == Some(0.0)))
  }

  test("evalBinaryRetrieval dcgDiscount table is the shared literal contract") {
    val d = graft.operators.Ranking.dcgDiscount _
    assert(d(1) == 1.0)
    assert(d(2) == 1.0 / (math.log(3.0) / math.log(2.0)))
    // printed form must round-trip (the oracle parses these strings)
    (1 to 10).foreach(i => assert(d(i).toString.toDouble == d(i)))
  }

  test("bm25 topKJoin equals the per-query single-path topK run by run") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val qs = Seq(1L -> Seq("spark", "vector"),
      2L -> Seq("customer", "zzz", "spark"))
    val queries = qs.toDF("q_id", "terms")
    val batch = graft.operators.Bm25.topKJoin(docs, queries, k = 5)
    qs.foreach { case (qid, terms) =>
      val b = batch.where($"q_id" === qid).orderBy("rank")
        .select("doc_id", "bm25", "n_hit")
        .as[(Long, Double, Long)].collect().toSeq
      val single = graft.operators.Bm25.topK(docs, terms, k = 5)
        .select("doc_id", "bm25", "n_hit")
        .as[(Long, Double, Long)].collect().toSeq
      assert(b == single, s"batch != single for query $qid")
    }
  }

  test("bm25 topKJoin refuses an unbounded query vocabulary loudly") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val queries = Seq((1L, Seq("a", "b", "c"))).toDF("q_id", "terms")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Bm25.topKJoin(docs, queries, k = 2, maxVocab = 2)
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  test("mmrSelect: diversity beats a redundant higher-rel candidate") {
    GraftExtensions.register(spark)
    // query 1 pool: ids 10,11 are near-duplicates (identical codes),
    // id 12 is orthogonal-ish with lower rel. Plain top-2 = {10, 11};
    // MMR must pick 10 then 12 (11's penalty ~1.0 kills it).
    val cands = Seq((1L, 10L, 0.99), (1L, 11L, 0.98), (1L, 12L, 0.60))
      .toDF("q_id", "vec_id", "rel")
    val codes = Seq(
      (10L, Seq[Byte](127, 0, 0, 0)),
      (11L, Seq[Byte](127, 1, 0, 0)),
      (12L, Seq[Byte](0, 0, 127, 0)))
      .toDF("vec_id", "q_codes")
    val out = Ranking.mmrSelect(cands, codes, k = 2)
      .orderBy("round").as[(Long, Long, Double, Int)].collect().toSeq
    assert(out.map(_._2) == Seq(10L, 12L),
      s"expected diverse pick {10, 12}, got ${out.map(_._2)}")
    assert(out.head._3 == 0.5 * 0.99)
  }

  test("mmrSelect: round 1 ties go to the lower id; pool smaller than k") {
    GraftExtensions.register(spark)
    val cands = Seq((5L, 30L, 0.7), (5L, 20L, 0.7)).toDF("q_id", "vec_id", "rel")
    val codes = Seq((20L, Seq[Byte](1, 2)), (30L, Seq[Byte](-3, 4)))
      .toDF("vec_id", "q_codes")
    val out = Ranking.mmrSelect(cands, codes, k = 5)
      .orderBy("round").as[(Long, Long, Double, Int)].collect().toSeq
    assert(out.map(_._2) == Seq(20L, 30L)) // tie -> lower id first
    assert(out.map(_._4) == Seq(1, 2))     // pool exhausts at 2 rounds
  }

  test("topKPerGroup plan: partial+final ObjectHashAggregate, no corpus window") {
    val docs = Tables.documents(spark, sfDir)
    val df = Ranking.topKPerGroup(docs, "lang", "n_chars", "doc_id", k = 5)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("(?i)objecthashaggregate".r.findAllIn(p).size >= 2,
      s"heap not partial-aggregated map-side:\n$p")
    assert(!p.contains("Window ["), s"corpus hit a window:\n$p")
  }
}
