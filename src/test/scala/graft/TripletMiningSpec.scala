package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Similarity.mineTriplets (x115): the contrastive triplet factory —
  * hardest same-label positive + negK hardest negatives through the
  * at-rest int8 index — and its degenerate-label pre-flight guard
  * (a label covering half the corpus must fail FAST, before the
  * quadratic positives join or any index read). */
class TripletMiningSpec extends SparkTestBase {
  import spark.implicits._

  private def builtIndex(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_triplets").toString
    Similarity.writeInt8Index(Tables.embeddings(spark, sfDir), dir, nlist = 8)
    dir
  }

  test("triplets: hardest positive shares the label, negatives never do, " +
      "neg ranks are dense, guard on vs off is identical on bounded classes") {
    val embs = Tables.embeddings(spark, sfDir)
    val dir = builtIndex()
    val anchors = embs.where(col("vec_id") % 40 === 5)
      .select(col("vec_id").as("q_id"), col("embedding"), col("label"))
    def run(maxClassSize: Long) = Similarity
      .mineTriplets(anchors, embs, dir, negK = 3, nprobe = 4,
        maxClassSize = maxClassSize)
      .orderBy("q_id", "neg_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getInt(5))).toSeq
    val got = run(1000000L)
    // the guard pre-flight must not perturb results: identical with
    // the pre-flight skipped entirely
    assert(got === run(Long.MaxValue))
    assert(got.nonEmpty)
    val labels = embs.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    got.foreach { case (q, pos, posSim, neg, _, _) =>
      assert(labels(q) === labels(pos), s"positive label mismatch for $q")
      assert(labels(q) !== labels(neg), s"negative shares label for $q")
      assert(pos != q)
      assert(neg != q)
      assert(posSim <= 1.0 + 1e-9)
    }
    // neg ranks re-close densely 1..3 per anchor
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._6).sorted === (1 to rows.size))
      assert(rows.size <= 3)
    }
  }

  test("degenerate anchor-touched label fails fast, before any index read") {
    val labeled = (1L to 40L).map(i =>
        (i, Array.fill(8)(i.toFloat / 40f), if (i <= 30) "mega" else s"s$i"))
      .toDF("vec_id", "embedding", "label")
    val anchors = labeled.where(col("vec_id") === 1L)
      .select(col("vec_id").as("q_id"), col("embedding"), col("label"))
    // bogus index path: the pre-flight must throw before the path is
    // ever opened — a 100 TB job dies in the bounded count, not later
    val e = intercept[IllegalArgumentException] {
      Similarity.mineTriplets(anchors, labeled, "/nonexistent/graft_idx",
        negK = 2, nprobe = 2, maxClassSize = 10L)
    }
    assert(e.getMessage.contains("degenerate labeling"))
    assert(e.getMessage.contains("30"))
  }

  test("an oversize label NO anchor touches is exempt from the guard") {
    val embs = Tables.embeddings(spark, sfDir)
    val dir = builtIndex()
    // blow up one label's corpus size far past maxClassSize, but
    // anchor only on OTHER labels: the semi-join exempts it
    val hotLabel = embs.select("label").head().get(0)
    val inflated = embs.unionByName(
      embs.where(col("label") === hotLabel)
        .withColumn("vec_id", col("vec_id") + 1000000L))
    val anchors = inflated
      .where(col("label") =!= hotLabel && col("vec_id") % 40 === 5)
      .select(col("vec_id").as("q_id"), col("embedding"), col("label"))
    val hotN = inflated.where(col("label") === hotLabel).count()
    val out = Similarity.mineTriplets(anchors, inflated, dir,
      negK = 2, nprobe = 4, maxClassSize = hotN - 1)
    assert(out.limit(1).count() >= 0L) // guard did not fire
  }
}
