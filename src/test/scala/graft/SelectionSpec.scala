package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Dsir, Sampling}
import graft.sources.Tables

/** Retrieval/selection operators: BM25, DSIR importance resampling,
  * cluster-balanced sampling. Semantics on constructed corpora where
  * the right answer is checkable by hand; the DuckDB hash
  * certification is x74/x75/x76.
  */
class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  private def bm25Of(df: org.apache.spark.sql.DataFrame, terms: Seq[String]) = {
    GraftExtensions.register(spark)
    Bm25.scores(df, terms).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
  }

  test("bm25: rarer term outweighs common term; tf raises the score") {
    // "rare" appears in 1 of 4 docs, "common" in all 4. Equal lengths.
    val docs = Seq(
      (0L, "common rare pad pad"),
      (1L, "common pad pad pad"),
      (2L, "common common pad pad"),
      (3L, "common pad pad pad")).toDF("doc_id", "text")
    val s = bm25Of(docs, Seq("common", "rare"))
    assert(s(0L) > s(2L), "one rare hit must beat doubled common tf")
    assert(s(2L) > s(1L), "higher tf of the same term must score higher")
    assert(s(1L) === s(3L), "identical docs score identically")
  }

  test("bm25: length normalization — same tf in a shorter doc scores higher") {
    val docs = Seq(
      (0L, "term pad"),
      (1L, "term pad pad pad pad pad pad pad pad pad")).toDF("doc_id", "text")
    val s = bm25Of(docs, Seq("term"))
    assert(s(0L) > s(1L))
  }

  test("bm25: docs matching nothing are absent; absent query terms are inert") {
    val docs = Seq((0L, "alpha beta"), (1L, "gamma delta")).toDF("doc_id", "text")
    val withGhost = bm25Of(docs, Seq("alpha", "ghost"))
    assert(withGhost.keySet === Set(0L))
    assert(withGhost === bm25Of(docs, Seq("alpha")))
    intercept[IllegalArgumentException](Bm25.scores(docs, Seq.empty))
  }

  test("bm25 topK: k best by score, ties to the lower id") {
    GraftExtensions.register(spark)
    val docs = Seq(
      (0L, "x y"), (1L, "x y"), (2L, "x x y"), (3L, "pad")).toDF("doc_id", "text")
    val top = Bm25.topK(docs, Seq("x"), k = 2).collect().map(_.getLong(0))
    assert(top.head === 2L)            // highest tf
    assert(top(1) === 0L)              // 0 and 1 tie → lower id
  }

  test("bm25 scoreWithModel: map-only scorer equals the corpus-join scorer") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sfDir).limit(120)
    val terms = Seq("spark", "vector", "customer", "zzz")
    val (idfs, avgdl) = Bm25.collectModel(docs, terms)
    val joinPath = Bm25.scores(docs, terms).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("bm25"), r.getAs[Long]("n_hit"))).toMap
    val mapPath = Bm25.scoreWithModel(docs, idfs, avgdl).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("bm25"), r.getAs[Long]("n_hit"))).toMap
    assert(mapPath.size === 120, "map-only scorer must emit every row")
    joinPath.foreach { case (id, (s, n)) =>
      assert(mapPath(id)._2 === n)
      assert(math.abs(mapPath(id)._1 - s) <= 1e-6, s"doc $id: ${mapPath(id)._1} vs $s")
    }
    mapPath.filterNot(kv => joinPath.contains(kv._1)).values.foreach { v =>
      assert(v === ((0.0, 0L)), "non-matching rows score 0")
    }
  }

  test("dsir: target-like docs get higher importance weights") {
    // target: "good" docs; raw contains good-like and bad-like docs
    val target = (0L to 9L).map(i => (i, "quality prose words " + i % 2))
      .toDF("doc_id", "text")
    val raw = Seq(
      (100L, "quality prose words 1"),      // looks like target
      (101L, "spam spam click here now")    // does not
    ).toDF("doc_id", "text")
    val nb = 1 << 10
    val lr = Dsir.logRatios(Dsir.bucketCounts(target, nb),
      Dsir.bucketCounts(raw, nb), nb)
    val w = Dsir.importanceWeights(raw, lr, nb).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    assert(w(100L) > w(101L))
  }

  test("dsir: map-only scorer matches the join-shaped scorer; empty docs weigh 0") {
    val docs = Tables.documents(spark, sfDir).limit(60)
      .unionByName(Seq((9999L, "", "en", "src0", 0L)).toDF(
        "doc_id", "text", "lang", "source", "n_chars"))
    val nb = 1 << 10
    val counts = Dsir.bucketCounts(docs, nb)
    val lr = Dsir.logRatios(counts, counts, nb) // self-ratio: all zeros is fine
    val joinPath = Dsir.importanceWeights(docs, lr, nb).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("logw"),
        r.getAs[Long]("n_terms"))).sortBy(_._1)
    val lut = Dsir.collectRatios(lr, nb)
    val mapPath = Dsir.importanceWeightsMapOnly(docs, lut, nb).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("logw"),
        r.getAs[Long]("n_terms"))).sortBy(_._1)
    assert(joinPath.length === mapPath.length)
    joinPath.zip(mapPath).foreach { case ((id1, w1, n1), (id2, w2, n2)) =>
      assert(id1 === id2)
      assert(n1 === n2, s"doc $id1 term counts differ")
      assert(math.abs(w1 - w2) <= 1e-6, s"doc $id1: $w1 vs $w2")
    }
    val empty = mapPath.find(_._1 === 9999L).get
    assert(empty._2 === 0.0 && empty._3 === 0L)
  }

  test("dsir bucketCountsSplit equals two separate bucketCounts passes") {
    val docs = Tables.documents(spark, sfDir).limit(80)
    val nb = 1 << 9
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (tc, rc) = Dsir.bucketCountsSplit(docs, col("doc_id") % 3 === 0, nb)
    assert(render(tc) === render(
      Dsir.bucketCounts(docs.where(col("doc_id") % 3 === 0), nb)))
    assert(render(rc) === render(
      Dsir.bucketCounts(docs.where(col("doc_id") % 3 =!= 0), nb)))
  }

  test("dsir gumbelTopK: deterministic, k rows, ordered by perturbed weight") {
    // spread ≫ Gumbel std (~1.28) so weight visibly dominates, while
    // near-tied neighbours can still swap — resampling, not argmax
    val w = (0L to 99L).map(i => (i, i.toDouble / 10.0, 5L))
      .toDF("doc_id", "logw", "n_terms")
    val a = Dsir.gumbelTopK(w, 10).collect().map(_.getLong(0)).toSeq
    val b = Dsir.gumbelTopK(w, 10).collect().map(_.getLong(0)).toSeq
    assert(a === b)
    assert(a.length === 10)
    // resampling, not argmax: the noise must actually reorder some of
    // the top-10 relative to pure logw ranking (logw 90..99)
    assert(a.toSet !== (90L to 99L).toSet,
      "gumbel noise never moved the selection — not resampling")
    // ...but weight still matters: high-logw docs dominate the draw
    assert(a.count(_ >= 50L) >= 6)
  }

  test("clusterBalancedSample: caps every cell, keeps whole small cells, " +
       "matches the single-window rule") {
    GraftExtensions.register(spark)
    val embs = Tables.embeddings(spark, sfDir)
    val kept = Sampling.clusterBalancedSample(embs, nlist = 4, perCell = 20)
    val counts = kept.groupBy("cell").count().collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("count")).toMap
    assert(counts.values.forall(_ <= 20))
    // naive single-window mirror over the same deterministic cells
    import org.apache.spark.sql.expressions.Window
    val cents = graft.operators.IvfIndex.meanCentroids(
      graft.operators.IvfIndex.hashCells(embs, 4, "vec_id"), "cell0", "embedding")
    val assigned = graft.operators.IvfIndex.assign(embs, cents)
    val rnd = conv(substring(md5(concat(lit("cbs_"),
      col("vec_id").cast("string"))), 1, 7), 16, 10).cast("long")
    val naive = assigned
      .withColumn("rank_in_cell", row_number().over(
        Window.partitionBy("cell").orderBy(rnd.asc, col("vec_id").asc)))
      .where(col("rank_in_cell") <= 20)
      .select("vec_id", "cell", "rank_in_cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = kept.select("vec_id", "cell", "rank_in_cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === naive)
  }

  private def mixDocs(sizes: Map[String, Int]) = {
    var id = 0L
    sizes.toSeq.sortBy(_._1).flatMap { case (src, n) =>
      (1 to n).map { _ => id += 1; (id, src, s"text $id") }
    }.toDF("doc_id", "source", "text")
  }

  test("temperatureMixture: sqrt quotas hit the floor formula per source") {
    // sizes 100/25/4 at alpha=0.5 → weights 10/5/2, tw=17
    val docs = mixDocs(Map("big" -> 100, "mid" -> 25, "small" -> 4))
    val kept = Sampling.temperatureMixture(docs, targetTotal = 85, alpha = 0.5)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("big") === math.floor(85.0 * 10 / 17).toLong)   // 50
    assert(bySrc("mid") === math.floor(85.0 * 5 / 17).toLong)    // 25 = all of mid
    assert(bySrc("small") === 4L, "source smaller than quota keeps everything")
  }

  test("temperatureMixture: alpha<1 flattens — small source share beats natural") {
    val docs = mixDocs(Map("big" -> 400, "small" -> 16))
    val kept = Sampling.temperatureMixture(docs, targetTotal = 100, alpha = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // natural share would give small 100*16/416 ≈ 3.8; sqrt gives
    // 100*4/24 ≈ 16.6 → every small doc survives
    assert(kept("small") === 16L)
    assert(kept("big") === 83L)   // floor(100*20/24)
    // alpha=1 recovers (floored) natural proportions
    val nat = Sampling.temperatureMixture(docs, targetTotal = 100, alpha = 1.0)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nat("small") === math.floor(100.0 * 16 / 416).toLong)
  }

  test("temperatureMixture: deterministic and partitioning-invariant") {
    val docs = mixDocs(Map("a" -> 50, "b" -> 30))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "rank_in_source").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    val once = ids(Sampling.temperatureMixture(docs, 40))
    assert(once === ids(Sampling.temperatureMixture(docs.repartition(13), 40)))
    assert(once === ids(Sampling.temperatureMixture(docs.coalesce(1), 40)))
    intercept[IllegalArgumentException](Sampling.temperatureMixture(docs, 0))
    intercept[IllegalArgumentException](
      Sampling.temperatureMixture(docs, 10, alpha = 1.5))
  }
}
