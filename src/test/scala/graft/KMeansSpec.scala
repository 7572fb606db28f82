package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.sources.Tables

/** Full deterministic Lloyd (x101): round semantics, the Lloyd
  * monotonicity the loop exists for, partition invariance, the
  * k-shrink contract, and the scale-shape plan gates. */
class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  private def inertia(rounds: Int): Double = {
    val embs = Tables.embeddings(spark, sfDir)
    val (cents, assigned) = IvfIndex.lloydIterate(embs, nlist = 8, rounds)
    assigned.join(broadcast(cents), Seq("cell"))
      .agg(sum(IvfIndex.sqDist(col("embedding"), col("centroid"))))
      .head().getDouble(0)
  }

  test("rounds = 1 is exactly the one-step quantizer composition") {
    val embs = Tables.embeddings(spark, sfDir)
    val (_, got) = IvfIndex.lloydIterate(embs, nlist = 8, rounds = 1)
    val cents = IvfIndex.meanCentroids(
      IvfIndex.hashCells(embs, 8), "cell0", "embedding")
    val want = IvfIndex.assign(embs, cents)
    assert(got.select("vec_id", "cell").orderBy("vec_id").collect().toSeq ===
      want.select("vec_id", "cell").orderBy("vec_id").collect().toSeq)
  }

  test("inertia is non-increasing across rounds (Lloyd's guarantee)") {
    val i1 = inertia(1)
    val i2 = inertia(2)
    val i3 = inertia(3)
    // round-6 quantization can wiggle the last decimal places; the
    // Lloyd descent is orders of magnitude bigger on real data
    assert(i2 <= i1 + 1e-3, s"round 2 worsened: $i1 -> $i2")
    assert(i3 <= i2 + 1e-3, s"round 3 worsened: $i2 -> $i3")
    assert(i3 < i1, s"three rounds did not improve at all: $i1 -> $i3")
  }

  test("assignment is partition-invariant") {
    val embs = Tables.embeddings(spark, sfDir)
    def run(parts: Int) =
      IvfIndex.lloydIterate(embs.repartition(parts), nlist = 8, rounds = 3)
        ._2.select("vec_id", "cell").orderBy("vec_id").collect().toSeq
    assert(run(1) === run(7))
  }

  test("a cell that empties drops out; assignment stays total") {
    // two tight clusters, nlist = 4: md5-init scatters ids over 4
    // cells, but after one mean step every point snaps to one of the
    // two surviving attractors and the other cells empty
    val pts = (0 until 12).map { i =>
      val base = if (i % 2 == 0) 0.0f else 100.0f
      (i.toLong, Array(base + i / 10.0f, base - i / 10.0f))
    }
    val df = pts.toDF("vec_id", "embedding")
    val (cents, assigned) = IvfIndex.lloydIterate(df, nlist = 4, rounds = 4)
    assert(assigned.count() === 12) // every vector still assigned
    val k = cents.count()
    assert(k <= 4 && k >= 2, s"surviving cells: $k")
    // the two physical clusters never share a cell
    val byCell = assigned.select("vec_id", "cell").collect()
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0) % 2).toSet)
    byCell.foreach { case (c, parities) =>
      assert(parities.size === 1, s"cell $c mixes clusters")
    }
  }

  test("plan shape: no window, broadcast centroids, partial-agg argmin") {
    val embs = Tables.embeddings(spark, sfDir)
    val (_, assigned) = IvfIndex.lloydIterate(embs, nlist = 8, rounds = 2)
    val p = assigned.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"argmin must be the partial-aggregable min(struct), not a window:\n$p")
    assert(p.contains("BroadcastNestedLoop") || p.contains("BroadcastExchange"),
      s"centroids must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"product join:\n$p")
  }
}
