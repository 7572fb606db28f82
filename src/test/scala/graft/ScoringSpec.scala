package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Kneser-Ney LM scoring and fractional-overlap contamination.
  * Semantics on constructed corpora where the right answer is
  * checkable by hand (including a driver-side naive KN twin); the
  * DuckDB hash certification is x77/x78.
  */
class ScoringSpec extends SparkTestBase {
  import spark.implicits._

  // ---- Kneser-Ney -------------------------------------------------

  /** Driver-side naive KN twin: same formula, computed with plain
    * Scala collections over the reference bigram list. */
  private def naiveKn(ref: Seq[String], doc: String, d: Double): Option[Double] = {
    def toks(s: String) = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val refBgs = ref.flatMap(t => toks(t).sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val c12 = refBgs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val types = c12.keySet
    val c1 = refBgs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n1p = types.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nleft = types.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val t = types.size.toLong
    val v = ref.flatMap(toks).distinct.size.toLong
    def pc(w2: String) = (nleft.getOrElse(w2, 0L) + 1.0) / (t + math.max(v, 1L))
    val bgs = toks(doc).sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
    if (bgs.isEmpty) None
    else Some(bgs.map { case (w1, w2) =>
      math.log(c1.get(w1) match {
        case Some(cw1) =>
          math.max(c12.getOrElse((w1, w2), 0L) - d, 0.0) / cw1 +
            d * n1p(w1) / cw1 * pc(w2)
        case None => pc(w2)
      })
    }.sum / bgs.size)
  }

  private def knOf(ref: Seq[(Long, String)], docs: Seq[(Long, String)],
                   d: Double = 0.75): Map[Long, (Option[Double], Long)] = {
    val refDf = ref.toDF("doc_id", "text")
    val docsDf = docs.toDF("doc_id", "text")
    val (_, bigrams, vocab) = TextOps.bigramCounts(refDf)
    TextOps.knScore(docsDf, bigrams, vocab, discount = d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.get(r.fieldIndex("kn_score"))).map(_.asInstanceOf[Double]),
          r.getAs[Long]("n_bigrams"))))
      .toMap
  }

  test("kn score matches the driver-side naive twin, incl. OOV and unseen contexts") {
    val ref = Seq(1L -> "the cat sat on the mat", 2L -> "the dog sat on the rug",
      3L -> "a cat and a dog")
    val docs = Seq(
      10L -> "the cat sat",            // all bigrams seen
      11L -> "the zebra sat",          // seen context, OOV continuation
      12L -> "zebra runs fast",        // unseen contexts throughout
      13L -> "cat")                    // 1 token: null score
    val got = knOf(ref, docs)
    for ((id, text) <- docs) {
      val expected = naiveKn(ref.map(_._2), text, 0.75)
      (got(id)._1, expected) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 1e-6, s"doc $id: $a vs $b")
        case (None, None) => // both null: <2 tokens
        case (a, b) => fail(s"doc $id nullability mismatch: $a vs $b")
      }
    }
    assert(got(13L) === ((None, 0L)))
    assert(got(10L)._2 === 2L)
  }

  test("kn continuation semantics: versatile words beat frozen collocations") {
    // "francisco" and "common" are equally frequent in the reference,
    // but francisco only ever follows "san" (1 left context) while
    // common follows 4 different words. After an unseen context, KN
    // backs off to the continuation probability, which rewards
    // versatility — the property that separates KN from add-k.
    val ref = Seq(
      1L -> "san francisco san francisco san francisco san francisco",
      2L -> "very common quite common so common most common")
    val got = knOf(ref, Seq(10L -> "zzz francisco", 11L -> "zzz common"))
    assert(got(11L)._1.get > got(10L)._1.get,
      "KN must score the versatile continuation higher after an unseen context")
  }

  test("kn discount moves mass: higher D lowers seen-bigram probability") {
    val ref = Seq(1L -> "a b a b a b a c")
    val lo = knOf(ref, Seq(10L -> "a b"), d = 0.1)(10L)._1.get
    val hi = knOf(ref, Seq(10L -> "a b"), d = 0.9)(10L)._1.get
    assert(lo > hi, "discounting the dominant seen bigram must lower its score")
  }

  test("docBigrams map-only pairing equals the window-lead derivation") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir).limit(200)
    val mapSide = TextOps.docBigrams(docs, "doc_id", "text")
      .groupBy("doc_id", "w1", "w2").count()
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val windowed = TextOps.tokenRows(docs, "doc_id", "text")
      .withColumn("w2", lead("w", 1).over(w))
      .where(col("w2").isNotNull)
      .select(col("doc_id"), col("w").as("w1"), col("w2"))
      .groupBy("doc_id", "w1", "w2").count()
    assert(mapSide.exceptAll(windowed).isEmpty && windowed.exceptAll(mapSide).isEmpty,
      "pairings diverge")
    // and the pairing itself must not shuffle (on the raw table — the
    // limit(200) above injects its own single-partition exchange)
    val p = TextOps.docBigrams(Tables.documents(spark, sfDir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"docBigrams must be map-only:\n$p")
  }

  // ---- trained logistic quality filter ----------------------------

  test("logistic quality: learns a separable corpus, orders the classes") {
    import graft.operators.LogisticQuality
    // label 1 = prose-like, label 0 = punctuation garbage: the quality
    // feature separates them, so 5 GD rounds must order the classes
    val good = (0L until 40L).map(i =>
      (i, "a clean readable sentence with ordinary words number " + i, 60L, 1))
    val bad = (100L until 140L).map(i =>
      (i, "@@## $$%% ^^&& !!(( ))++ " + i, 25L, 0))
    val docs = (good ++ bad).toDF("doc_id", "text", "n_chars", "label")
    val w = LogisticQuality.train(docs, col("label") === 1, lr = 0.5, iters = 50)
    val scored = LogisticQuality.score(docs, w)
      .join(docs.select("doc_id", "label"), "doc_id")
      .groupBy("label").agg(avg("p_quality").as("p")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(scored(1) > scored(0) + 0.1,
      s"classes not separated: ${scored(1)} vs ${scored(0)}")
  }

  test("logistic quality: Spark training equals a driver-side naive twin") {
    import graft.operators.LogisticQuality
    val docs = Tables.documents(spark, sfDir).limit(200)
    val w = LogisticQuality.train(docs, col("doc_id") % 3 === 0,
      lr = 0.5, iters = 5)
    // naive twin: collect the (bit-identical, rational) features, run
    // the same rounded-gradient GD in plain Scala
    val f = docs.select(col("doc_id"),
        (col("doc_id") % 3 === 0).cast("double").as("y"),
        graft.operators.TextOps.qualityScore(col("text")).as("x1"),
        (graft.operators.TextOps.wsTokenCount(col("text")).cast("double") /
          (graft.operators.TextOps.wsTokenCount(col("text")).cast("double") +
            lit(100.0))).as("x2"),
        (col("n_chars").cast("double") /
          (col("n_chars").cast("double") + lit(1000.0))).as("x3"))
      .collect().map(r => (r.getDouble(1),
        Array(1.0, r.getDouble(2), r.getDouble(3), r.getDouble(4))))
    def round6(x: Double) =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var wN = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 5) {
      val g = Array.fill(4)(0.0)
      f.foreach { case (y, x) =>
        val p = 1.0 / (1.0 + math.exp(-(wN(0) * x(0) + wN(1) * x(1) +
          wN(2) * x(2) + wN(3) * x(3))))
        for (j <- 0 until 4) g(j) += (p - y) * x(j)
      }
      wN = Array.tabulate(4)(j => wN(j) - 0.5 * round6(g(j) / f.length))
    }
    // tolerance: the twin's sequential gradient sum can differ from
    // Spark's partition-ordered sum by a last ulp pre-round; a 6th-
    // decimal flip in one round moves a weight by 0.5e-6
    w.zip(wN).zipWithIndex.foreach { case ((a, b), j) =>
      assert(math.abs(a - b) <= 1e-5, s"weight $j: $a vs $b")
    }
  }

  test("logistic quality scoring is a map-only projection") {
    import graft.operators.LogisticQuality
    val p = LogisticQuality.score(Tables.documents(spark, sfDir),
        Array(0.1, 0.2, 0.3, 0.4))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"scoring must be map-only:\n$p")
    assert(!p.contains("Join"), s"scoring must not join:\n$p")
  }

  // ---- fractional contamination -----------------------------------

  private def fracOf(train: Seq[(Long, String)], eval: Seq[(Long, String)],
                     minFrac: Double): Map[(Long, Long), (Long, Long, Double)] = {
    GraftExtensions.register(spark)
    Dedup.contaminationFraction(train.toDF("doc_id", "text"),
        eval.toDF("doc_id", "text"), n = 2, minFrac = minFrac).collect()
      .map(r => (r.getAs[Long]("eval_id"), r.getAs[Long]("train_id")) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Long]("eval_total"),
          r.getAs[Double]("overlap_frac"))))
      .toMap
  }

  test("contamination fraction: exact copy = 1.0, half overlap = 0.5, threshold cuts") {
    val train = Seq(0L -> "alpha beta gamma delta epsilon")
    val eval = Seq(
      1L -> "alpha beta gamma delta epsilon",   // identical: frac 1.0
      2L -> "alpha beta gamma zzz yyy",         // shares {alpha beta, beta gamma} of 4
      3L -> "unrelated text entirely here")     // no overlap
    val got = fracOf(train, eval, minFrac = 0.4)
    assert(got((1L, 0L)) === ((4L, 4L, 1.0)))
    assert(got((2L, 0L)) === ((2L, 4L, 0.5)))
    assert(!got.contains((3L, 0L)))
    // raising the threshold drops the half-overlap pair
    val strict = fracOf(train, eval, minFrac = 0.6)
    assert(strict.keySet === Set((1L, 0L)))
  }

  test("contamination fraction normalizes by eval length where the count rule cannot") {
    // same absolute overlap (2 shared bigrams) against a short and a
    // long eval doc: the short one is mostly-contained (frac 2/3),
    // the long one barely touched (frac 2/9)
    val train = Seq(0L -> "alpha beta gamma")
    val evalDocs = Seq(
      1L -> "alpha beta gamma zzz",                            // 3 bigrams, 2 shared
      2L -> "alpha beta gamma q w e r t y u")                  // 9 bigrams, 2 shared
    val got = fracOf(train, evalDocs, minFrac = 0.5)
    assert(got.keySet === Set((1L, 0L)),
      "only the mostly-contained short doc may pass a 0.5 fraction")
    val all = fracOf(train, evalDocs, minFrac = 0.01)
    assert(all((1L, 0L))._1 === all((2L, 0L))._1,
      "identical absolute overlap by construction")
    assert(all((1L, 0L))._3 > all((2L, 0L))._3)
  }

  // ---- novelty ----------------------------------------------------

  test("novelty score: all-seen 0, all-new 1, mixed exact quotient") {
    GraftExtensions.register(spark)
    val ref = Seq(0L -> "alpha beta gamma delta").toDF("doc_id", "text")
    val docs = Seq(
      1L -> "alpha beta gamma delta",      // bigrams... n=2: all 3 seen
      2L -> "zz yy xx ww",                 // all new
      3L -> "alpha beta qq rr")            // {alpha beta, beta qq, qq rr}: 1 of 3 seen
    val got = Dedup.noveltyScore(docs.toDF("doc_id", "text"), ref, n = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_matched"), r.getAs[Long]("n_shingles"),
          r.getAs[Double]("novelty")))).toMap
    assert(got(1L) === ((3L, 3L, 0.0)))
    assert(got(2L) === ((0L, 3L, 1.0)))
    assert(got(3L) === ((1L, 3L, 1.0 - 1.0 / 3.0)))
  }

  test("bloom novelty is a lower bound on exact novelty; tight at tiny fpp; map-only") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val ref = docs.where(col("doc_id") % 2 === 0)
    val ev = docs.where(col("doc_id") % 2 === 1)
    def render(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.get(r.fieldIndex("novelty"))).map(_.asInstanceOf[Double]))
      .toMap
    val exact = render(Dedup.noveltyScore(ev, ref, n = 3))
    // tiny fpp: the bloom answer should coincide with exact here
    val tight = render(Dedup.noveltyScoreBloom(ev,
      Dedup.buildShingleBloom(ref, n = 3, fpp = 1e-6), n = 3))
    assert(tight === exact, "fpp=1e-6 bloom diverged from exact on this corpus")
    // hostile fpp: matches only ever OVERcount → novelty never above exact
    val loose = render(Dedup.noveltyScoreBloom(ev,
      Dedup.buildShingleBloom(ref, n = 3, fpp = 0.5), n = 3))
    exact.foreach { case (id, e) =>
      (loose(id), e) match {
        case (Some(l), Some(x)) => assert(l <= x + 1e-12, s"doc $id: $l > $x")
        case (l, x) => assert(l.isDefined === x.isDefined)
      }
    }
    // and the bloom scorer must plan as one shuffle-free projection
    val p = Dedup.noveltyScoreBloom(docs,
        Dedup.buildShingleBloom(ref, n = 3, fpp = 0.01), n = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"bloom novelty must be map-only:\n$p")
    assert(!p.contains("Join"), s"bloom novelty must not join:\n$p")
  }

  test("contamination fraction at minFrac→0 recovers the minOverlap=1 pair set") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sfDir).limit(300)
    val train = docs.where(col("doc_id") % 2 === 0)
    val eval = docs.where(col("doc_id") % 2 === 1)
    def pairs(df: DataFrame) = df.select("eval_id", "train_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Dedup.contaminationFraction(train, eval, n = 3, minFrac = 1e-9))
      === pairs(Dedup.contamination(train, eval, n = 3, minOverlap = 1)))
  }
}
