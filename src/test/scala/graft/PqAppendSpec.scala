package graft

import org.apache.spark.sql.functions._

import graft.operators.{PqIndex, Similarity}
import graft.sources.Tables

/** Incremental IVF-PQ ingest (PqIndex.appendToIndex): a query after
  * any append schedule must be bit-identical to the all-at-once index
  * under the same persisted centroids + codebook (per-vector encoding
  * and assignment see no other rows), and the ingest plan must never
  * read the existing index. */
class PqAppendSpec extends SparkTestBase {

  test("append == all-at-once under the same artifacts; ingest is O(batch)") {
    val (dim, nlist, m, ksub) = (64, 8, 32, 16)
    val embs = Tables.embeddings(spark, sfDir)
    val base = embs.where(col("vec_id") % 2 === 0)
    val incr = embs.where(col("vec_id") % 2 =!= 0)

    // index A: build on the even half, append the odd half in one go
    val dirA = java.nio.file.Files.createTempDirectory("graft_pq_a").toString
    PqIndex.writeIndex(base, dirA, nlist = nlist, m = m, ksub = ksub, dim = dim)
    PqIndex.appendToIndex(incr, dirA, m = m, dim = dim)

    // index B: same build, the odd half in two differently-split appends
    val dirB = java.nio.file.Files.createTempDirectory("graft_pq_b").toString
    PqIndex.writeIndex(base, dirB, nlist = nlist, m = m, ksub = ksub, dim = dim)
    PqIndex.appendToIndex(incr.where(col("vec_id") % 4 === 1), dirB, m, dim)
    PqIndex.appendToIndex(incr.where(col("vec_id") % 4 === 3), dirB, m, dim)

    // query an APPENDED (odd) vector on both
    val q = embs.where(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    def top(dir: String) = PqIndex
      .topKFromIndex(spark, dir, q, k = 10, nprobe = 6, shortlist = 60,
        excludeId = Some(3L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val a = top(dirA)
    val b = top(dirB)
    assert(a.nonEmpty && a.map(_._1) === b.map(_._1))
    a.zip(b).foreach { case ((_, x), (_, y)) =>
      assert(java.lang.Double.doubleToLongBits(x) ===
        java.lang.Double.doubleToLongBits(y), s"$x != $y")
    }
    // appended vectors are retrievable alongside built ones
    assert(a.map(_._1).exists(_ % 2 == 1) && a.map(_._1).exists(_ % 2 == 0))

    // the appended codes carry the SAME values the all-at-once write
    // would have produced for those ids: re-encode the odd half
    // against dirA's persisted codebook via a THIRD append into a
    // fresh copy and byte-compare the codes rows
    val codesA = spark.read.parquet(s"$dirA/codes")
      .where(col("vec_id") % 2 =!= 0)
      .select("vec_id", "codes", "cell")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Int](1).toList, r.get(2).toString.toLong)).sortBy(_._1)
    val codesB = spark.read.parquet(s"$dirB/codes")
      .where(col("vec_id") % 2 =!= 0)
      .select("vec_id", "codes", "cell")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Int](1).toList, r.get(2).toString.toLong)).sortBy(_._1)
    assert(codesA.toSeq === codesB.toSeq)

    // O(batch): the ingest-side plans read centroids/codebook and the
    // batch — never the existing codes or vectors dirs
    val cents = spark.read.parquet(s"$dirA/centroids")
    val assignedPlan = graft.operators.IvfIndex.assign(incr, cents)
      .queryExecution.executedPlan.toString
    assert(!assignedPlan.contains("/codes") &&
      !assignedPlan.contains("/vectors"),
      s"ingest must not read the existing index:\n$assignedPlan")
  }
}
