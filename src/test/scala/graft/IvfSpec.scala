package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Similarity}
import graft.sources.Tables

class IvfSpec extends SparkTestBase {

  test("IVF build assigns every vector to exactly one of nlist cells") {
    val embs = Tables.embeddings(spark, sfDir)
    val (_, assigned) = IvfIndex.build(embs, nlist = 4)
    assert(assigned.count() == embs.count())
    val cells = assigned.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf(Set(0, 1, 2, 3)) && cells.size >= 2)
  }

  test("IVF top-k recall vs exact brute force") {
    val embs = Tables.embeddings(spark, sfDir)
    val (model, assigned) = IvfIndex.build(embs, nlist = 4)
    val cached = assigned.cache()
    val exact = Similarity.cosineTopK(embs, queryId = 0, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = IvfIndex.topK(model, cached, queryId = 0, k = 10, nprobe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall; exact=$exact approx=$approx")
    // full probe (nprobe = nlist) must equal exact
    val full = IvfIndex.topK(model, cached, queryId = 0, k = 10, nprobe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full == exact)
    cached.unpersist()
  }

  test("KMeans IVF: mean recall@10 >= 0.8 over 20 queries at nprobe 3/8") {
    // The production quantizer's cells as EVIDENCE: fixed-seed KMeans
    // (seed 42), a real prune (3 of 8 cells scanned), recall measured
    // against exact brute force over 20 query vectors — the same
    // recall bound the oracle-gated x22/x23 probes enforce for the
    // deterministic quantizer.
    val embs = Tables.embeddings(spark, sfDir).cache()
    val (model, assigned) = IvfIndex.build(embs, nlist = 8, seed = 42)
    val cached = assigned.cache()
    val recalls = (0L until 20L).map { q =>
      val exact = Similarity.cosineTopK(embs, queryId = q, k = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val approx = IvfIndex.topK(model, cached, queryId = q, k = 10, nprobe = 3)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 $mean; per-query: $recalls")
    cached.unpersist(); embs.unpersist()
  }

  test("deterministic IVF: full probe equals exact, partial probe prunes") {
    GraftExtensions.register(spark)
    val embs = Tables.embeddings(spark, sfDir)
    val exact = Similarity.cosineTopK(embs, queryId = 0, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // probing every cell must recover the exact answer
    val full = IvfIndex.topKDeterministic(embs, queryId = 0, k = 10,
        nlist = 8, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full == exact)
    // assignment is a partition: every vector lands in exactly one cell
    val cents = IvfIndex.meanCentroids(IvfIndex.hashCells(embs, nlist = 8))
    val assigned = IvfIndex.assign(embs, cents)
    assert(assigned.count() == embs.count())
    assert(assigned.select("vec_id").distinct().count() == embs.count())
  }

  test("on-disk index: partition-pruned query matches the in-memory path") {
    GraftExtensions.register(spark)
    val embs = Tables.embeddings(spark, sfDir)
    val cents = IvfIndex.meanCentroids(IvfIndex.hashCells(embs, nlist = 8))
    val assigned = IvfIndex.assign(embs, cents)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    IvfIndex.writeIndex(assigned, cents, dir)

    val q = embs.where(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val fromDisk = IvfIndex.topKFromIndex(spark, dir, q, k = 11, nprobe = 6)
      .where(col("vec_id") =!= 0)   // in-memory path excludes the query id
      .limit(10)
    val inMem = IvfIndex.topKDeterministic(embs, queryId = 0, k = 10,
      nlist = 8, nprobe = 6)
    assert(fromDisk.select("vec_id").collect().map(_.getLong(0)).toSeq ===
      inMem.select("vec_id").collect().map(_.getLong(0)).toSeq)

    // the nprobe cell selection must reach the scan as a PARTITION
    // filter (pruned before file listing), not a post-scan predicate
    val plan = fromDisk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && "cell".r.findFirstIn(
      "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")).isDefined,
      s"cell IN-list must prune partitions:\n$plan")
  }

  test("typed Dataset views round-trip the model case classes") {
    import spark.implicits._
    val ds = Seq(graft.model.CentroidCell(1L, 14.0, 122.0)).toDS()
    assert(ds.filter(_.lat > 10).count() == 1)
    val wind = graft.hazard.CentroidGrid.generate(spark, 122, 13, 123, 14, 0.5)
      .as[graft.model.CentroidCell]
    assert(wind.collect().forall(c => c.lat >= 13 && c.lat <= 14))
  }
}
