package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.{Bm25, CountMin, HeavyHitters, Hll}
import graft.sources.Tables

/** Streaming ingest into the at-rest artifact family: documents land
  * as a stream, each micro-batch appends through the same O(batch)
  * `appendTo*` the batch schedulers use (marker = micro-batch id, so
  * an at-least-once replay of a batch is a no-op), and the resulting
  * artifact serves queries identically to one built from the same
  * rows all at once. The int8 ANN index twin lives in StreamingSpec;
  * these cover the r13 members: the BM25 lexical index and the
  * HLL / Count-Min / Misra-Gries sketches.
  *
  * Merge-semantics nuance, pinned per artifact: HLL (max) and
  * Count-Min (exact sum) are schedule-INDEPENDENT — streamed ≡
  * one-shot, value-for-value. BM25 postings are row-disjoint appends —
  * also schedule-independent. The MG summary is schedule-DEPENDENT
  * within its error bound (each batch prune may subtract), so the
  * streamed artifact is held to the mergeable-summaries GUARANTEE
  * against exact union counts, not to one-shot equality.
  */
class AtRestStreamingSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType)))

  /** Land `incr` as 3 parquet files and drain them as 3 SEPARATE
    * micro-batches (maxFilesPerTrigger=1) through `append`. */
  private def streamIn(incr: DataFrame)(append: (DataFrame, Long) => Unit): Int = {
    val landing = Files.createTempDirectory("graft_atrest_landing").toString
    val ckpt = Files.createTempDirectory("graft_atrest_ckpt").toString
    incr.repartition(3).write.mode("append").parquet(landing)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        nBatches.incrementAndGet()
        append(batch, id)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    nBatches.get()
  }

  private def docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")

  test("streaming ingest into the at-rest BM25 index equals batch build") {
    val base = docs.where(col("doc_id") % 2 === 0)
    val incr = docs.where(col("doc_id") % 2 =!= 0)
    val dirS = Files.createTempDirectory("graft_bm25_stream").toString
    val dirB = Files.createTempDirectory("graft_bm25_batch").toString
    Bm25.writeIndex(base, dirS, nBuckets = 16)
    Bm25.writeIndex(base, dirB, nBuckets = 16)
    Bm25.appendToIndex(incr, dirB)
    val n = streamIn(incr) { (batch, id) =>
      Bm25.appendToIndex(batch, dirS, doneMarker = Some(id.toString))
    }
    assert(n >= 2, s"expected multiple micro-batches, got $n")
    import spark.implicits._
    val queries = Seq((1L, Seq("the", "of")), (2L, Seq("data")))
      .toDF("q_id", "terms")
    def top(dir: String) =
      Bm25.topKJoinFromIndex(queries, dir, k = 5)
        .collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
          r.getAs[Double]("bm25"), r.getAs[Int]("rank")))
        .sortBy(t => (t._1, t._4))
    val s = top(dirS); val b = top(dirB)
    assert(s.nonEmpty)
    assert(s.map(t => (t._1, t._2, t._4)) === b.map(t => (t._1, t._2, t._4)))
    s.zip(b).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToLongBits(x._3) ===
        java.lang.Double.doubleToLongBits(y._3), s"score drift: $x vs $y")
    }
  }

  test("streaming ingest into the HLL and Count-Min sketches equals one-shot build") {
    val base = docs.where(col("doc_id") % 2 === 0)
    val incr = docs.where(col("doc_id") % 2 =!= 0)

    val hllS = Files.createTempDirectory("graft_hll_stream").toString
    val hllB = Files.createTempDirectory("graft_hll_oneshot").toString
    Hll.writeSketch(base, "text", Seq("lang"), hllS, p = 8)
    Hll.writeSketch(docs, "text", Seq("lang"), hllB, p = 8)

    val cmS = Files.createTempDirectory("graft_cm_stream").toString
    val cmB = Files.createTempDirectory("graft_cm_oneshot").toString
    CountMin.writeSketch(base, "text", cmS, width = 4096, depth = 4)
    CountMin.writeSketch(docs, "text", cmB, width = 4096, depth = 4)

    // ONE ingest loop maintains both sketches — the shape of a real
    // corpus-stats job; each artifact gets the batch id as its marker
    val n = streamIn(incr) { (batch, id) =>
      Hll.appendToSketch(batch, hllS, doneMarker = Some(id.toString))
      CountMin.appendToSketch(batch, cmS, doneMarker = Some(id.toString))
    }
    assert(n >= 2, s"expected multiple micro-batches, got $n")

    def hllEst(dir: String) =
      Hll.estimateFromSketch(spark, dir).collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val hs = hllEst(hllS)
    assert(hs === hllEst(hllB))
    assert(hs.nonEmpty)

    import spark.implicits._
    val words = docs.limit(20)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .distinct().as[String].collect().toSeq
    def cmEst(dir: String) =
      CountMin.estimateFromSketch(spark, dir, words.toDF("w"), "w")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = cmEst(cmS)
    assert(est === cmEst(cmB))
    assert(est.values.sum > 0L)
  }

  test("streaming ingest into the MG summary keeps the mergeable guarantee") {
    val base = docs.where(col("doc_id") % 2 === 0)
    val incr = docs.where(col("doc_id") % 2 =!= 0)
    val dir = Files.createTempDirectory("graft_mg_stream").toString
    val capacity = 64
    HeavyHitters.writeSummary(base, "text", dir, capacity)
    val n = streamIn(incr) { (batch, id) =>
      HeavyHitters.appendToSummary(batch, dir, doneMarker = Some(id.toString))
    }
    assert(n >= 2, s"expected multiple micro-batches, got $n")
    val merged = HeavyHitters.readSummary(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.size <= capacity)
    // guarantee vs EXACT union counts — schedule-independent even
    // though the per-entry values are schedule-dependent in the bound
    val exact = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val threshold = total.toDouble / (capacity + 1)
    for ((w, c) <- exact if c > threshold) {
      assert(merged.contains(w), s"heavy $w lost in the streamed summary")
      assert(merged(w) <= c, s"$w over-counted")
      assert(c - merged(w) <= threshold + 1, s"$w past the bound")
    }
  }

  test("streaming ingest into the packed-stream ledger: every doc lands " +
      "exactly once, sequences stay exactly full, replay is a no-op") {
    import graft.operators.Packing
    val base = docs.where(col("doc_id") % 2 === 0)
    val incr = docs.where(col("doc_id") % 2 =!= 0)
    val dir = Files.createTempDirectory("graft_pack_stream").toString + "/l"
    val seqLen = 64
    Packing.writeLedger(base, "text", "doc_id", dir, 4, seqLen)
    var lastId = -1L
    val n = streamIn(incr) { (batch, id) =>
      Packing.appendToLedger(batch, "text", "doc_id", dir,
        doneMarker = Some(id.toString))
      lastId = id
    }
    assert(n >= 2, s"expected multiple micro-batches, got $n")
    // the ledger is SCHEDULE-DEPENDENT by contract (arrival order is
    // part of the layout), so the streamed artifact is held to the
    // layout INVARIANTS + exactly-once, not to one-shot equality:
    val sp = Packing.readLedgerSpans(spark, dir)
    val rows = sp.collect().map(r => (r.getAs[Int]("sh"),
      r.getAs[Long]("seq"), r.getAs[Long]("doc_id"), r.getAs[Long]("t0"),
      r.getAs[Long]("t1"), r.getAs[Long]("seq_off")))
    val ntok = docs.select(col("doc_id"),
        Packing.tokenCount(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc exactly once, tiled [0, ntok)
    assert(rows.map(_._3).toSet === ntok.keySet)
    rows.groupBy(_._3).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._4 === 0L && sorted.last._5 === ntok(id))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 === b._4, s"doc $id gap/overlap")
        case _ =>
      }
    }
    // every non-final sequence holds exactly seqLen tokens
    val lastSeq = rows.groupBy(_._1).map { case (sh, ss) =>
      sh -> ss.map(_._2).max }
    rows.groupBy(r => (r._1, r._2)).foreach { case ((sh, seq), ss) =>
      val filled = ss.map(r => r._5 - r._4).sum
      if (seq != lastSeq(sh)) assert(filled === seqLen.toLong)
    }
    // at-least-once redelivery of the last micro-batch: a no-op
    val before = sp.count()
    Packing.appendToLedger(incr, "text", "doc_id", dir,
      doneMarker = Some(lastId.toString))
    assert(Packing.readLedgerSpans(spark, dir).count() === before)
  }
}
