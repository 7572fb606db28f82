package graft

import org.apache.spark.sql.functions._

import graft.operators.{PqIndex, Similarity}
import graft.sources.Tables

/** Product quantization: structural invariants of the codebook/codes
  * and ADC quality vs exact brute force. */
class PqSpec extends SparkTestBase {

  private val (m, ksub, dim) = (32, 16, 64)

  test("codes form a complete partition: one code per (vector, subspace)") {
    val embs = Tables.embeddings(spark, sfDir)
    val cb = PqIndex.codebook(embs, m, ksub, dim)
    // codebook covers every (subspace, within) with <= ksub cells
    val perSub = cb.groupBy("subspace").agg(
      countDistinct("cell").as("cells"),
      countDistinct("within").as("dims")).collect()
    assert(perSub.length === m)
    assert(perSub.forall(r => r.getLong(1) <= ksub && r.getLong(2) === dim / m))
    val codes = PqIndex.encode(embs, cb, m, dim)
    assert(codes.count() === embs.count() * m)
    assert(codes.groupBy("vec_id", "subspace").count()
      .where(col("count") =!= 1).count() === 0)
  }

  test("fused pq_adc kernel is bit-identical to the relational encode->join->sum") {
    GraftExtensions.register(spark)
    val embs = Tables.embeddings(spark, sfDir)
    val q = 3L
    val cb = PqIndex.codebook(embs, m, ksub, dim).localCheckpoint()
    val codes = PqIndex.encode(embs, cb, m, dim)
    val table = PqIndex.queryTable(embs, q, cb, m, dim)
    // relational ADC distance for EVERY vector (shortlist = corpus)
    val n = embs.count().toInt
    val relational = PqIndex.adcShortlist(codes, table, q, n)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // fused kernel through the public operator path: adcTopK with the
    // full corpus as shortlist reranks everything, so instead compare
    // the raw scores by scoring directly with the same tables
    val dsub = dim / m
    val cbArr = new Array[Double](m * ksub * dsub)
    val qtArr = Array.fill(m * ksub)(Double.NaN)
    cb.collect().foreach { r =>
      val s = r.getAs[Number]("subspace").intValue()
      val c = r.getAs[Number]("cell").intValue()
      val w = r.getAs[Number]("within").intValue()
      cbArr((s * ksub + c) * dsub + w) = r.getAs[Double]("cx")
    }
    table.collect().foreach { r =>
      qtArr(r.getAs[Number]("subspace").intValue() * ksub +
        r.getAs[Number]("cell").intValue()) = r.getAs[Double]("qdist")
    }
    val fused = embs.where(col("vec_id") =!= q)
      .select(col("vec_id"), call_function("pq_adc",
        col("embedding").cast("array<double>"), lit(cbArr), lit(qtArr),
        lit(m), lit(ksub), lit(dsub)).as("adist"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused.keySet === relational.keySet)
    fused.foreach { case (id, a) =>
      assert(a === relational(id), s"vec $id: fused $a vs relational ${relational(id)}")
    }
  }

  test("ADC shortlist + rerank recovers >= 8 of the exact top-10") {
    val embs = Tables.embeddings(spark, sfDir)
    for (q <- Seq(0L, 3L, 17L)) {
      val exact = Similarity.cosineTopK(embs, queryId = q, k = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val pq = PqIndex.adcTopK(embs, queryId = q, k = 10, shortlist = 40,
          m, ksub, dim)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert((exact intersect pq).size >= 8,
        s"query $q: recall ${(exact intersect pq).size}/10")
    }
  }

  test("IVF-PQ: cell pruning composes with ADC, recall holds") {
    val embs = Tables.embeddings(spark, sfDir)
    for (q <- Seq(0L, 17L)) {
      val exact = Similarity.cosineTopK(embs, queryId = q, k = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val got = PqIndex.ivfPqTopK(embs, queryId = q, k = 10,
          nlist = 8, nprobe = 6, shortlist = 40, m, ksub, dim)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert((exact intersect got).size >= 7,
        s"query $q: ivf-pq recall ${(exact intersect got).size}/10")
    }
    // full probe + full shortlist degenerates to exact
    val n = embs.count().toInt
    val exact5 = Similarity.cosineTopK(embs, queryId = 5, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val full = PqIndex.ivfPqTopK(embs, queryId = 5, k = 10,
        nlist = 8, nprobe = 8, shortlist = n, m, ksub, dim)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full === exact5)
  }

  test("shortlist = corpus degenerates to the exact ranking") {
    val embs = Tables.embeddings(spark, sfDir)
    val n = embs.count().toInt
    val exact = Similarity.cosineTopK(embs, queryId = 5, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val full = PqIndex.adcTopK(embs, queryId = 5, k = 10, shortlist = n,
        m, ksub, dim)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full === exact)
  }

  test("on-disk IVF-PQ index: partition-pruned query matches the in-memory path") {
    GraftExtensions.register(spark)
    val embs = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    PqIndex.writeIndex(embs, dir, nlist = 8, m = m, ksub = ksub, dim = dim)
    val q = embs.where(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val fromDisk = PqIndex.topKFromIndex(spark, dir, q, k = 10, nprobe = 6,
      shortlist = 60, excludeId = Some(3L))
    val inMem = PqIndex.ivfPqTopK(embs, queryId = 3, k = 10,
      nlist = 8, nprobe = 6, shortlist = 60, m, ksub, dim)
    val got = fromDisk.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = inMem.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === want.map(_._1).toSeq)
    got.zip(want).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9) }

    // the nprobe cell selection must reach BOTH scans (codes for ADC,
    // vectors for rerank) as a PARTITION filter
    val plan = fromDisk.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*cell[^\\]]*\\]".r
      .findAllIn(plan).toSeq
    assert(pf.length >= 2, s"expected cell partition filters on both scans:\n$plan")
  }

  test("kmeans-quantized on-disk index: same reader, recall holds") {
    GraftExtensions.register(spark)
    val embs = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_km").toString
    PqIndex.writeIndexKMeans(embs, dir, nlist = 8, m = m, ksub = ksub, dim = dim)
    val q = embs.where(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val got = PqIndex.topKFromIndex(spark, dir, q, k = 10, nprobe = 6,
        shortlist = 60, excludeId = Some(3L))
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity.cosineTopK(embs, queryId = 3, k = 10)
      .collect().map(_.getLong(0)).toSet
    // trained cells must hold the recall bar the deterministic
    // quantizer carries (IvfSpec's >= 0.8 bound)
    assert(got.intersect(exact).size >= 8,
      s"recall ${got.intersect(exact).size}/10: $got vs $exact")
    // partition pruning is still a file-level filter with the kmeans
    // centroid table
    val plan = PqIndex.topKFromIndex(spark, dir, q, k = 10, nprobe = 6,
        shortlist = 60, excludeId = Some(3L))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined)
  }

  test("batch ANN join == the single-query index path, per query") {
    GraftExtensions.register(spark)
    val embs = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_annjoin").toString
    PqIndex.writeIndex(embs, dir, nlist = 8, m = m, ksub = ksub, dim = dim)
    val qids = Seq(3L, 57L, 111L, 204L)
    val queries = embs.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q_id"), col("embedding"))
    val joined = PqIndex
      .annJoinFromIndex(queries, dir, k = 7, nprobe = 5, shortlist = 40)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    qids.foreach { q =>
      val qv = embs.where(col("vec_id") === q)
        .select("embedding").head().getSeq[Float](0).map(_.toDouble)
      val single = PqIndex
        .topKFromIndex(spark, dir, qv, k = 7, nprobe = 5, shortlist = 40,
          excludeId = Some(q))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(joined(q).map(_._1) === single.map(_._1),
        s"neighbor ids diverge for query $q")
      joined(q).zip(single).foreach { case ((_, a), (_, b)) =>
        // single-query path reranks from a double-literal query column;
        // the join reranks from the float embedding column — identical
        // values, but not guaranteed the same codegen order
        assert(math.abs(a - b) < 1e-9, s"sim diverges for query $q")
      }
    }
    assert(joined.values.forall(_.size == 7))

    // excludePairs drops known positives BEFORE the shortlist and the
    // rank re-closes densely
    import spark.implicits._
    val top1 = joined(3L).head._1
    val banned = Seq((3L, top1)).toDF("q_id", "vec_id")
    val mined = PqIndex.annJoinFromIndex(
        queries.where(col("q_id") === 3), dir, k = 7, nprobe = 5,
        shortlist = 40, excludePairs = Some(banned))
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(!mined.map(_._1).contains(top1), "banned pair survived")
    assert(mined.map(_._2).sorted === (1 to 7), "ranks must re-close densely")
  }

  test("pq_adc names the subspace when the query table has no usable cell") {
    import graft.expressions.PqAdcScore
    // subspace 1's query-table slots are all NaN → loud failure, not a
    // silent read of subspace 0's last slot
    val cb = Array.tabulate(2 * 2 * 1)(_.toDouble) // m=2, ksub=2, dsub=1
    val qt = Array(0.1, 0.2, Double.NaN, Double.NaN)
    val ex = intercept[IllegalStateException] {
      PqAdcScore.score(Array(0.0, 1.0), cb, qt, m = 2, ksub = 2, dsub = 1)
    }
    assert(ex.getMessage.contains("subspace 1"))
    // a fully-covered table still scores
    val ok = PqAdcScore.score(Array(0.0, 1.0), cb,
      Array(0.1, 0.2, 0.3, 0.4), m = 2, ksub = 2, dsub = 1)
    assert(!ok.isNaN)
  }
}
