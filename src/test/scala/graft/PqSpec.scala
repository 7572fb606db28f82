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
}
