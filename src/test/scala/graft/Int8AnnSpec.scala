package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Similarity.quantizeInt8 / cosineTopKInt8 (x71): scalar int8
  * embedding quantization — code bounds, reconstruction error, zero
  * vectors, and recall against the exact cosine path. */
class Int8AnnSpec extends SparkTestBase {
  import spark.implicits._

  test("codes stay in [-127,127]; reconstruction error is within scale/2") {
    val qz = Similarity.quantizeInt8(Tables.embeddings(spark, sfDir))
    val joined = qz.join(Tables.embeddings(spark, sfDir), "vec_id")
      .select(col("vec_id"), col("q_scale"),
        zip_with(col("q_codes"), col("embedding"),
          (c, v) => abs(c.cast("double") * col("q_scale") - v.cast("double")))
          .as("err"),
        array_max(transform(col("q_codes"), c => abs(c.cast("int")))).as("cmax"))
    val r = joined.agg(max(col("cmax")),
      max(array_max(col("err")) / col("q_scale"))).head()
    assert(r.getInt(0) <= 127)
    assert(r.getDouble(1) <= 0.5 + 1e-9) // |v̂ - v| ≤ scale/2 per component
  }

  test("zero vector quantizes to zero codes without dividing by zero") {
    val df = Seq((1L, Array.fill(8)(0.0f)), (2L, Array(1.0f, -2.0f, 0.5f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val qz = Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](2)).toMap
    assert(qz(1L).forall(_ == 0))
    assert(qz(2L)(1) === (-127).toByte) // maxabs component hits full scale
  }

  test("int8 top-k recall vs exact cosine is high on the real corpus") {
    val embs = Tables.embeddings(spark, sfDir)
    val approx = Similarity.cosineTopKInt8(
        Similarity.quantizeInt8(embs), queryId = 3, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val exact = Similarity.cosineTopK(embs, queryId = 3, k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert((approx & exact).size >= 8, s"recall too low: $approx vs $exact")
  }

  test("at-rest index: bit-identical to full-scan int8 cosine within probed " +
      "cells, and the cell selection is a file-level partition filter") {
    import graft.operators.IvfIndex
    val embs = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_int8_idx").toString
    Similarity.writeInt8Index(embs, dir, nlist = 8)
    val q = embs.where(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val df = Similarity.topKInt8FromIndex(spark, dir, q, k = 10, nprobe = 6,
      excludeId = Some(3L))
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1)))

    // reference: the certified full-scan path restricted to the same
    // probed cells, derived independently of the index files
    val cents = IvfIndex.meanCentroids(
      IvfIndex.hashCells(embs, 8), "cell0", "embedding")
    val probed = cents
      .withColumn("qdist", org.apache.spark.sql.functions.round(
        Similarity.dot(array(q.map(lit): _*), array(q.map(lit): _*)) -
          lit(2.0) * Similarity.dot(array(q.map(lit): _*), col("centroid")) +
          Similarity.dot(col("centroid"), col("centroid")), 6))
      .orderBy(col("qdist").asc, col("cell").asc).limit(6)
      .select("cell")
    val inCells = IvfIndex.assign(embs, cents)
      .join(probed, "cell").select("vec_id", "embedding")
    val want = Similarity.cosineTopKInt8(
        Similarity.quantizeInt8(inCells.unionByName(
          embs.where(col("vec_id") === 3).select("vec_id", "embedding")).distinct()),
        queryId = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === want.map(_._1).toSeq)
    got.zip(want).foreach { case ((_, a), (_, b)) =>
      assert(java.lang.Double.doubleToLongBits(a) ===
        java.lang.Double.doubleToLongBits(b), s"$a != $b")
    }

    // plan gate: the nprobe cell selection must arrive as a file-level
    // PartitionFilters entry on the codes scan — the shape that reads
    // ~nprobe/nlist of the corpus at 100 TB
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"expected cell partition filter on the codes scan:\n$plan")
  }

  test("incremental append: query equals the all-at-once index; ingest is O(batch)") {
    val embs = Tables.embeddings(spark, sfDir)
    val base = embs.where(col("vec_id") % 2 === 0)
    val incr = embs.where(col("vec_id") % 2 =!= 0)
    // index A: build on the even half, append the odd half
    val dirA = java.nio.file.Files.createTempDirectory("graft_append_a").toString
    Similarity.writeInt8Index(base, dirA, nlist = 8)
    // capture the plans the append ACTUALLY executes (a hand-built
    // replica of the ingest plan cannot fail the O(batch) assertion)
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Similarity.appendToInt8Index(incr, dirA)
      // listener events post asynchronously; poll until they land
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (plans.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500)
    } finally spark.listenerManager.unregister(listener)
    // O(batch): no executed plan SCANNED the existing codes (the
    // write targets the codes dir; only FileScan lines are inspected)
    import scala.jdk.CollectionConverters._
    plans.asScala.flatMap(_.split("\n")).filter(_.contains("FileScan"))
      .foreach { scan =>
        assert(!scan.contains("/codes"),
          s"append scanned the existing codes:\n$scan")
      }
    // index B: all vectors at once, but against the SAME centroids
    // (the versioned-quantizer contract): write base's index and
    // append everything missing — i.e. assignment/quantization of a
    // vector never depends on other rows, so any split schedule is
    // byte-equivalent in VALUES
    val dirB = java.nio.file.Files.createTempDirectory("graft_append_b").toString
    Similarity.writeInt8Index(base, dirB, nlist = 8)
    // second batch split differently: two appends
    Similarity.appendToInt8Index(incr.where(col("vec_id") % 4 === 1), dirB)
    Similarity.appendToInt8Index(incr.where(col("vec_id") % 4 === 3), dirB)
    val q = embs.where(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    def top(dir: String) = Similarity
      .topKInt8FromIndex(spark, dir, q, k = 10, nprobe = 6,
        excludeId = Some(3L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val a = top(dirA)
    val b = top(dirB)
    assert(a.map(_._1) === b.map(_._1))
    a.zip(b).foreach { case ((_, x), (_, y)) =>
      assert(java.lang.Double.doubleToLongBits(x) ===
        java.lang.Double.doubleToLongBits(y))
    }
    // appended vectors are actually retrievable (query id 3 is odd)
    assert(a.nonEmpty && a.map(_._1).exists(_ % 2 == 1))

    // marker-gated replay (the at-least-once foreachBatch contract):
    // a second append with the same marker is a no-op
    val batch1 = incr.where(col("vec_id") === 1)
    Similarity.appendToInt8Index(batch1, dirB, doneMarker = Some("rb1"))
    Similarity.appendToInt8Index(batch1, dirB, doneMarker = Some("rb1"))
    assert(spark.read.parquet(s"$dirB/codes")
      .where(col("vec_id") === 1).count() === 2L, // 1 original + 1 marked
      "marked replay must not re-append")
    // wrong-dimension batch fails fast instead of silently writing
    // codes that integer cosine NULLs out
    import spark.implicits._
    val wrong = Seq((9001L, Array.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToInt8Index(wrong, dirB)
    }
    assert(e.getMessage.contains("dim"))
    // empty batch is a no-op
    Similarity.appendToInt8Index(incr.where(col("vec_id") === -1), dirB)
  }

  test("batch ANN join == the single-query index path, per query") {
    val embs = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_annjoin").toString
    Similarity.writeInt8Index(embs, dir, nlist = 8)
    val qids = Seq(3L, 57L, 111L, 204L)
    val queries = embs.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q_id"), col("embedding"))
    val joined = Similarity
      .annJoinInt8FromIndex(queries, dir, k = 7, nprobe = 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    qids.foreach { q =>
      val qv = embs.where(col("vec_id") === q)
        .select("embedding").head().getSeq[Float](0).map(_.toDouble)
      val single = Similarity
        .topKInt8FromIndex(spark, dir, qv, k = 7, nprobe = 5,
          excludeId = Some(q))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(joined(q).map(_._1) === single.map(_._1),
        s"neighbor ids diverge for query $q")
      joined(q).zip(single).foreach { case ((_, a), (_, b)) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b),
          s"sim not bit-identical for query $q")
      }
    }
    // ranks are 1..k dense per query
    assert(joined.values.forall(_.size == 7))

    // excludePairs drops known positives and the rank re-closes
    import spark.implicits._
    val top1 = joined(3L).head._1
    val banned = Seq((3L, top1)).toDF("q_id", "vec_id")
    val mined = Similarity.annJoinInt8FromIndex(
        queries.where(col("q_id") === 3), dir, k = 7, nprobe = 5,
        excludePairs = Some(banned))
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(!mined.map(_._1).contains(top1), "banned pair survived")
    assert(mined.map(_._2).sorted === (1 to 7), "ranks must re-close densely")
  }

  test("cosinePairsInt8FromIndex: build ∪ ingest pairs equal ALL " +
      "within-cell threshold pairs of the full corpus (the split-" +
      "independence the semantic registry flagship rests on)") {
    import graft.operators.IvfIndex
    val embs = Tables.embeddings(spark, sfDir)
    val w0 = embs.where($"vec_id" % 3 =!= 2)
    val w1 = embs.where($"vec_id" % 3 === 2)
    val dir = java.nio.file.Files.createTempDirectory("cpix").toString
    Similarity.writeInt8Index(w0, dir, nlist = 8)
    val render = (df: org.apache.spark.sql.DataFrame) =>
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val buildP = render(Similarity.cosinePairsInt8FromIndex(w0, dir, 0.25))
    val ingestP = render(Similarity.cosinePairsInt8FromIndex(w1, dir, 0.25))
    // expected: assign EVERYONE against the persisted centroids, all
    // within-cell int8-cosine pairs at the same raw threshold
    val cents = spark.read.parquet(s"$dir/centroids")
    val all = Similarity.quantizeInt8(embs)
      .join(IvfIndex.assign(embs, cents).select("vec_id", "cell"),
        Seq("vec_id"))
    val expect = render(all
      .select($"cell", $"vec_id".as("id_a"), $"q_codes".as("_ca"))
      .join(all.select($"cell", $"vec_id".as("id_b"), $"q_codes".as("_cb")),
        Seq("cell"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        Similarity.int8CosineHof($"_ca", $"_cb").as("sim"))
      .where($"sim" >= 0.25))
    assert((buildP ++ ingestP).sorted === expect,
      "build-internal ∪ (batch×corpus + batch-internal) must cover " +
        "exactly the full corpus's within-cell pairs, each once")
    assert(buildP.intersect(ingestP).isEmpty,
      "the two calls partition the pair set")
  }

  test("cosinePairsInt8FromIndex prunes the codes scan to the batch's " +
      "cells, refuses a dim mismatch, and is empty on an empty batch") {
    val embs = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("cpix_pl").toString
    Similarity.writeInt8Index(embs.where($"vec_id" % 3 =!= 2), dir,
      nlist = 8)
    val batch = embs.where($"vec_id" % 3 === 2 && $"vec_id" < 60)
    val pairs = Similarity.cosinePairsInt8FromIndex(batch, dir, 0.25)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell#"),
      s"the codes scan must carry the cell partition filter:\n$plan")
    intercept[IllegalArgumentException] {
      Similarity.cosinePairsInt8FromIndex(
        embs.select($"vec_id",
          slice($"embedding", 1, 8).as("embedding")), dir, 0.25)
    }
    assert(Similarity.cosinePairsInt8FromIndex(
      embs.where($"vec_id" < 0), dir, 0.25).count() === 0L)
  }
}
