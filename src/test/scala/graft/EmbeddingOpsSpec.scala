package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingOps

/** Integer-lattice PCA head: eigenvector recovery on a known
  * covariance, the exactness properties the x85 oracle relies on
  * (max-norm lattice component, partition-invariant fit), and the
  * map-only scoring plan.
  */
class EmbeddingOpsSpec extends SparkTestBase {

  private def toDf(rows: Seq[Array[Float]]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
  }

  test("recovers the dominant direction of a rank-1-dominated cloud") {
    // points along (0.6, 0.8) with a small orthogonal wobble
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val t = rnd.nextGaussian() * 5
      val s = rnd.nextGaussian() * 0.1
      Array((0.6 * t - 0.8 * s).toFloat, (0.8 * t + 0.6 * s).toFloat)
    }
    val m = EmbeddingOps.fitPcaTopComponent(toDf(rows), dim = 2, iters = 12)
    // max-norm: the dominant direction (0.6, 0.8) normalizes to (0.75, 1)
    assert(math.abs(m.component(1)) === 1.0)
    assert(math.abs(math.abs(m.component(0)) - 0.75) < 0.01,
      s"component = ${m.component.toList}")
    // eigenvalue tracks the dominant variance (~ 25 * 0.6²+... ≈ var(t))
    assert(m.eigenvalue > 10)
  }

  test("component coordinates are exact 1e-6 lattice points, max-norm 1") {
    val rows = (1 to 50).map(i =>
      Array(math.sin(i * 1.7).toFloat, math.cos(i * 0.9).toFloat,
        (i % 5 - 2).toFloat))
    val m = EmbeddingOps.fitPcaTopComponent(toDf(rows), dim = 3)
    assert(m.component.map(math.abs).max === 1.0)
    m.component.foreach { c =>
      val micro = c * 1e6
      assert(micro === math.rint(micro), s"off-lattice coordinate $c")
    }
  }

  test("fit is partition-invariant") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map(_ => Array.fill(4)(rnd.nextGaussian().toFloat))
    val df = toDf(rows)
    val a = EmbeddingOps.fitPcaTopComponent(df.repartition(1), dim = 4)
    val b = EmbeddingOps.fitPcaTopComponent(df.repartition(7), dim = 4)
    assert(a.component.toList === b.component.toList)
    assert(a.mean.toList === b.mean.toList)
  }

  test("projection is centered and maximizes variance vs a raw axis") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 200).map { _ =>
      val t = rnd.nextGaussian() * 3
      Array((t + rnd.nextGaussian() * 0.2).toFloat,
        (t - rnd.nextGaussian() * 0.2).toFloat,
        (rnd.nextGaussian() * 0.1).toFloat)
    }
    val df = toDf(rows)
    val m = EmbeddingOps.fitPcaTopComponent(df, dim = 3)
    val pc = EmbeddingOps.projectPc1(df, m).collect().map(_.getDouble(1))
    assert(math.abs(pc.sum / pc.length) < 1e-3) // centered
    val varPc = pc.map(x => x * x).sum / pc.length
    val x2 = rows.map(_(2).toDouble)
    val mu2 = x2.sum / x2.length
    val varAxis2 = x2.map(x => (x - mu2) * (x - mu2)).sum / x2.length
    assert(varPc > varAxis2 * 10, s"pc1 variance $varPc vs axis-2 $varAxis2")
  }

  test("truncateNormalize: unit norms, zero-vector guard, recall vs full dim") {
    import graft.operators.EmbeddingOps
    val rnd = new scala.util.Random(31)
    // DIRECTIONAL clusters (cosine ignores magnitude — additive
    // offsets would collapse under normalization): cluster c points
    // along the j%3==c axes, in both kept and dropped dims
    val rows = (0 until 120).map { i =>
      val c = i % 3
      Array.tabulate(8)(j =>
        ((if (j % 3 == c) 3.0 else 0.0) + rnd.nextGaussian() * 0.3).toFloat)
    }
    val df = toDf(rows)
    val t = EmbeddingOps.truncateNormalize(df, dims = 4)
    val collected = t.select("vec_id", "embedding_t").collect()
    collected.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length === 4)
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"non-unit norm $n")
    }
    // zero prefix stays zero, not NaN
    val z = EmbeddingOps.truncateNormalize(
      toDf(Seq(Array(0f, 0f, 1f, 2f))), dims = 2)
      .select("embedding_t").head.getSeq[Double](0)
    assert(z === Seq(0.0, 0.0))
    // truncated top-10 of a query overlaps the full-dim top-10 heavily
    def top10(vecCol: String, frame: org.apache.spark.sql.DataFrame): Set[Long] = {
      val q = frame.where(col("vec_id") === 0).select(col(vecCol).as("q"))
      frame.where(col("vec_id") =!= 0).crossJoin(q)
        .select(col("vec_id"),
          aggregate(zip_with(col(vecCol), col("q"), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
    }
    // truncation preserves CLUSTER identity (the retrieval property
    // that matters; within-cluster fine ranking depends on the
    // dropped noise dims and legitimately reshuffles)
    val full = top10("embedding_t",
      EmbeddingOps.truncateNormalize(df, dims = 8))
    val trunc = top10("embedding_t", t)
    assert(full.forall(_ % 3 == 0), s"full-dim neighbors off-cluster: $full")
    assert(trunc.forall(_ % 3 == 0), s"truncated neighbors off-cluster: $trunc")
  }

  test("degenerate inputs fail loudly") {
    val zeros = toDf((1 to 5).map(_ => Array(0f, 0f)))
    intercept[IllegalArgumentException](
      EmbeddingOps.fitPcaTopComponent(zeros, dim = 2))
    val df = toDf(Seq(Array(1f, 2f)))
    intercept[Exception](
      EmbeddingOps.fitPcaTopComponent(df, dim = 3)) // dim mismatch
  }

  test("projectPc1 plan is map-only (zero exchanges)") {
    val df = toDf(Seq(Array(1f, 2f), Array(3f, 4f)))
    val m = EmbeddingOps.fitPcaTopComponent(df, dim = 2)
    val p = EmbeddingOps.projectPc1(df, m).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("HashAggregate"),
      s"projectPc1 must be a pure projection:\n$p")
  }

  test("fit plan is one aggregation pass (single exchange)") {
    val df = toDf((1 to 20).map(i => Array(i.toFloat, (i * i).toFloat)))
    val agg = udaf(new EmbeddingOps.VecStatsAggregator(2))
    val p = df.select(agg(col("embedding")))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size === 1, s"fit must be one agg:\n$p")
    assert(p.contains("partial_vecstatsaggregator") ||
      p.toLowerCase.contains("partial"), s"map-side partials expected:\n$p")
  }
}
