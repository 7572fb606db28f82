package graft

import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingOps, IvfIndex, Similarity}
import graft.sources.Tables

/** Matryoshka × at-rest composition (x100): a truncated-normalized
  * index is 1/4 the dims AND int8 — and the at-rest query must stay
  * bit-identical to the full-scan int8 cosine restricted to the probed
  * cells (integer arithmetic survives partitioning; the x73 argument
  * carried to the truncated space), with the nprobe cell selection
  * arriving as a file-level partition filter. */
class MatryoshkaAtRestSpec extends SparkTestBase {
  import spark.implicits._

  test("truncated at-rest query == full-scan int8 cosine in probed cells; " +
      "cells prune at file level") {
    val t = EmbeddingOps.truncateNormalize(
        Tables.embeddings(spark, sfDir), dims = 16)
      .select(col("vec_id"), col("embedding_t"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mat_idx").toString
    Similarity.writeInt8Index(t, dir, nlist = 8, vecCol = "embedding_t")
    val q = t.where(col("vec_id") === 0)
      .select("embedding_t").head().getSeq[Double](0)
    val df = Similarity.topKInt8FromIndex(spark, dir, q, k = 10, nprobe = 6,
      excludeId = Some(0L))
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty)

    // reference: full-scan int8 cosine over the truncated vectors,
    // restricted to the same probed cells, independent of the files
    val cents = IvfIndex.meanCentroids(
      IvfIndex.hashCells(t, 8), "cell0", "embedding_t")
    val probed = cents
      .withColumn("qdist", round(
        Similarity.dot(array(q.map(lit): _*), array(q.map(lit): _*)) -
          lit(2.0) * Similarity.dot(array(q.map(lit): _*), col("centroid")) +
          Similarity.dot(col("centroid"), col("centroid")), 6))
      .orderBy(col("qdist").asc, col("cell").asc).limit(6)
      .select("cell")
    val inCells = IvfIndex.assign(t, cents, vecCol = "embedding_t")
      .join(probed, "cell").select("vec_id", "embedding_t")
    val want = Similarity.cosineTopKInt8(
        Similarity.quantizeInt8(inCells.unionByName(
            t.where(col("vec_id") === 0).select("vec_id", "embedding_t"))
          .distinct(), vecCol = "embedding_t"),
        queryId = 0, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === want.map(_._1).toSeq)
    got.zip(want).foreach { case ((_, a), (_, b)) =>
      assert(java.lang.Double.doubleToLongBits(a) ===
        java.lang.Double.doubleToLongBits(b), s"$a != $b")
    }

    // the cell selection must be a file-level PartitionFilters entry
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"expected cell partition filter on the codes scan:\n$plan")

    // the storage lever is real: 16-dim int8 codes at rest vs 64-dim
    // float raws — the codes table bytes must come in well under the
    // raw embeddings parquet
    def bytesUnder(p: java.nio.file.Path): Long = {
      val it = java.nio.file.Files.walk(p)
      try it.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally it.close()
    }
    val codesBytes = bytesUnder(java.nio.file.Paths.get(s"$dir/codes"))
    val rawBytes = bytesUnder(java.nio.file.Paths.get(s"$sfDir/embeddings.parquet"))
    assert(codesBytes < rawBytes / 2,
      s"truncated int8 codes $codesBytes vs raw $rawBytes")
  }

  test("truncated vectors compose with the PQ index path too") {
    // x99's claim — "composes with every ANN path" — exercised on the
    // second at-rest machinery: a PQ index over the 16-dim truncated
    // space builds, partition-prunes, and ranks with usable recall
    // against the truncated brute-force cosine
    val t = EmbeddingOps.truncateNormalize(
        Tables.embeddings(spark, sfDir), dims = 16)
      .select(col("vec_id"), col("embedding_t"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mat_pq").toString
    graft.operators.PqIndex.writeIndex(t, dir, nlist = 8, m = 8, ksub = 16,
      dim = 16, vecCol = "embedding_t")
    val q = t.where(col("vec_id") === 0)
      .select("embedding_t").head().getSeq[Double](0)
    val df = graft.operators.PqIndex.topKFromIndex(spark, dir, q, k = 10,
      nprobe = 8, shortlist = 60, excludeId = Some(0L),
      vecCol = "embedding_t")
    val approx = df.collect().map(_.getLong(0)).toSet
    assert(approx.size === 10)
    // brute truncated cosine within the whole space (nprobe = nlist,
    // so the only approximation is the PQ shortlist)
    val exact = Similarity.cosineTopK(t, queryId = 0, k = 10,
        vecCol = "embedding_t")
      .collect().map(_.getLong(0)).toSet
    assert((approx & exact).size >= 8,
      s"truncated-PQ recall too low: $approx vs $exact")
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"expected cell partition filter:\n$plan")
  }
}
