package graft

import org.apache.spark.sql.functions._

import graft.operators.{PqIndex, Similarity}
import graft.sources.Tables

/** Incremental IVF-PQ ingest (PqIndex.appendToIndex): append-schedule
  * invariance, GENUINE build-vs-append code equality under the same
  * persisted artifacts, the O(batch) plan property captured from the
  * plans the append actually executes, and the geometry guard. */
class PqAppendSpec extends SparkTestBase {

  /** Every executed plan during `f`, captured via a
    * QueryExecutionListener — the production plans, not a replica the
    * test hand-builds (a replica cannot fail). */
  private def executedPlans(f: => Unit): Seq[String] = {
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      f
      // listener events post asynchronously; poll until they land
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (plans.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500)
    } finally spark.listenerManager.unregister(l)
    import scala.jdk.CollectionConverters._
    plans.asScala.toSeq
  }

  test("append == build-written codes under the same artifacts; O(batch)") {
    val (dim, nlist, m, ksub) = (64, 8, 32, 16)
    val embs = Tables.embeddings(spark, sfDir)
    val base = embs.where(col("vec_id") % 2 === 0)
    val incr = embs.where(col("vec_id") % 2 =!= 0)

    // index A: build on the even half, append the odd half in one go
    val dirA = java.nio.file.Files.createTempDirectory("graft_pq_a").toString
    PqIndex.writeIndex(base, dirA, nlist = nlist, m = m, ksub = ksub, dim = dim)
    val ingestPlans = executedPlans {
      PqIndex.appendToIndex(incr, dirA)
    }
    // O(batch): none of the plans the append executed SCANNED the
    // existing codes or vectors (the writes TARGET those dirs, so
    // only FileScan lines are inspected)
    ingestPlans.flatMap(_.split("\n")).filter(_.contains("FileScan"))
      .foreach { scan =>
        assert(!scan.contains("/codes") && !scan.contains("/vectors"),
          s"append scanned the existing index:\n$scan")
      }

    // index B: same build, the odd half in two differently-split appends
    val dirB = java.nio.file.Files.createTempDirectory("graft_pq_b").toString
    PqIndex.writeIndex(base, dirB, nlist = nlist, m = m, ksub = ksub, dim = dim)
    PqIndex.appendToIndex(incr.where(col("vec_id") % 4 === 1), dirB)
    PqIndex.appendToIndex(incr.where(col("vec_id") % 4 === 3), dirB)

    // GENUINE build-vs-append: copy dirA's artifacts into a scratch
    // index and APPEND the even half — those ids' codes were written
    // by the BUILD in dirA, so equality pins append-encode ==
    // build-encode under identical artifacts (not just
    // append-schedule invariance)
    val dirC = java.nio.file.Files.createTempDirectory("graft_pq_c").toString
    def copyDir(from: String, to: String): Unit = {
      val src = java.nio.file.Paths.get(from)
      val dst = java.nio.file.Paths.get(to)
      val it = java.nio.file.Files.walk(src)
      try it.forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      } finally it.close()
    }
    copyDir(s"$dirA/centroids", s"$dirC/centroids")
    copyDir(s"$dirA/codebook", s"$dirC/codebook")
    PqIndex.appendToIndex(base, dirC)
    def codesOf(dir: String, evenOnly: Boolean) =
      spark.read.parquet(s"$dir/codes")
        .where(if (evenOnly) col("vec_id") % 2 === 0 else col("vec_id") % 2 =!= 0)
        .select("vec_id", "codes", "cell")
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList,
          r.get(2).toString.toLong)).sortBy(_._1).toSeq
    assert(codesOf(dirC, evenOnly = true) === codesOf(dirA, evenOnly = true),
      "append-encoded codes differ from build-encoded codes")
    // and the append-schedule invariance of the odd half
    assert(codesOf(dirA, evenOnly = false) === codesOf(dirB, evenOnly = false))

    // query an APPENDED (odd) vector on both append schedules
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
    assert(a.map(_._1).exists(_ % 2 == 1) && a.map(_._1).exists(_ % 2 == 0))
  }

  test("geometry guard: a wrong-dimension batch fails fast; markers make replays no-ops") {
    import spark.implicits._
    val (dim, nlist, m, ksub) = (64, 8, 32, 16)
    val embs = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_g").toString
    PqIndex.writeIndex(embs.where(col("vec_id") % 2 === 0), dir,
      nlist = nlist, m = m, ksub = ksub, dim = dim)
    // 16-dim batch against the 64-dim index: loud failure, not silent
    // min-length truncation
    val wrong = Seq((9001L, Array.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      PqIndex.appendToIndex(wrong, dir)
    }
    assert(e.getMessage.contains("dim"))
    // marker-gated replay: the second call with the same marker is a
    // no-op (no duplicate rows)
    val batch = embs.where(col("vec_id") === 1)
    PqIndex.appendToIndex(batch, dir, doneMarker = Some("b7"))
    PqIndex.appendToIndex(batch, dir, doneMarker = Some("b7"))
    val n = spark.read.parquet(s"$dir/codes")
      .where(col("vec_id") === 1).count()
    assert(n === 1L, s"replayed append duplicated rows: $n")
    // empty batch is a no-op, not a crash
    PqIndex.appendToIndex(batch.where(col("vec_id") === -1), dir)
  }
}
