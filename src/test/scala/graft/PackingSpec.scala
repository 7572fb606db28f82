package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Training-sequence materialization (x146–x149): concat-and-cut span
  * invariants (docs and sequences both tile exactly), overlap-chunk
  * geometry and content keys, the at-rest packed-stream ledger
  * (append ≡ rebuild under the same schedule including batch-boundary
  * straddle, marker-gated replay, compaction, pruned reads), and the
  * plan gates (one Exchange for packing, zero for chunking). */
class PackingSpec extends SparkTestBase {

  import spark.implicits._

  /** `n` docs with `tok(i)` whitespace tokens each. */
  private def corpus(ids: Seq[Long], tok: Long => Int): DataFrame =
    ids.map(i => (i, Seq.fill(tok(i))(s"w$i").mkString(" "), s"src${i % 3}"))
      .toDF("doc_id", "text", "source")

  /** Sequential reference packing: group rows by shard, order by
    * (b, okey, doc_id), run the cursor by hand, cut every `seqLen`. */
  private def referenceSpans(
      keyed: Seq[(Int, Long, Long, Long, Long)], // (sh, b, okey, id, ntok)
      seqLen: Int): Set[(Int, Long, Long, Long, Long, Long)] =
    keyed.groupBy(_._1).toSeq.flatMap { case (sh, rows) =>
      var off = 0L
      rows.sortBy(r => (r._2, r._3, r._4)).flatMap { case (_, _, _, id, ntok) =>
        val spans = (off / seqLen) to ((off + ntok - 1) / seqLen)
        val out = spans.map { seq =>
          (sh, seq, id,
            math.max(0L, seq * seqLen - off),
            math.min(ntok, (seq + 1) * seqLen - off),
            math.max(0L, off - seq * seqLen))
        }
        off += ntok
        out
      }
    }.toSet

  private def keyedOf(docs: DataFrame, nShards: Int,
                      b: Long => Long): Seq[(Int, Long, Long, Long, Long)] =
    docs.select(col("doc_id"), col("text")).collect().map { r =>
      val id = r.getLong(0)
      val md = java.security.MessageDigest.getInstance("MD5")
      def k60(s: String): Long = java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_))
          .mkString.take(15), 16)
      val ntok = r.getString(1).trim.split("\\s+").length.toLong
      ((k60(s"sh_$id") % nShards).toInt, b(id), k60(s"ok_$id"), id, ntok)
    }.toSeq

  private def spanSet(df: DataFrame) =
    df.select("sh", "seq", "doc_id", "t0", "t1", "seq_off").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet

  // ------------------------------------------------------------------
  // packSpans
  // ------------------------------------------------------------------

  test("packSpans matches an independent sequential reference packing " +
      "exactly (coordinates, offsets, shard+order keys)") {
    val docs = corpus(1L to 60L, i => (i % 13 + 1).toInt)
    val got = spanSet(Packing.packSpans(docs, "text", "doc_id", 4, 16))
    val want = referenceSpans(keyedOf(docs, 4, _ => 0L), 16)
    assert(got === want)
  }

  test("spans tile every document and every sequence exactly; token " +
      "mass is conserved") {
    val docs = corpus(1L to 50L, i => (i % 29 + 1).toInt)
    val sp = Packing.packSpans(docs, "text", "doc_id", 4, 16)
    val rows = sp.collect().map(r => (r.getAs[Int]("sh"),
      r.getAs[Long]("seq"), r.getAs[Long]("doc_id"), r.getAs[Long]("t0"),
      r.getAs[Long]("t1"), r.getAs[Long]("seq_off")))
    // doc tiling: per doc the spans are contiguous [0, ntok)
    val ntok = docs.select(col("doc_id"),
        Packing.tokenCount(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._3).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._4 === 0L, s"doc $id does not start at 0")
      assert(sorted.last._5 === ntok(id), s"doc $id does not end at ntok")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 === b._4, s"doc $id has a gap")
        case _ =>
      }
    }
    // sequence tiling: per (sh, seq) the spans are contiguous from 0
    // and fill seqLen except the shard-final remainder sequence
    val lastSeq = rows.groupBy(_._1).map { case (sh, ss) =>
      sh -> ss.map(_._2).max }
    rows.groupBy(r => (r._1, r._2)).foreach { case ((sh, seq), ss) =>
      val sorted = ss.sortBy(_._6)
      assert(sorted.head._6 === 0L, s"seq ($sh,$seq) does not start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 + (a._5 - a._4) === b._6, s"seq ($sh,$seq) gap")
        case _ =>
      }
      val filled = sorted.last._6 + (sorted.last._5 - sorted.last._4)
      if (seq != lastSeq(sh)) assert(filled === 16L,
        s"non-final seq ($sh,$seq) holds $filled tokens")
      else assert(filled >= 1L && filled <= 16L)
    }
    assert(rows.map(r => r._5 - r._4).sum === ntok.values.sum)
  }

  test("packSpans pays exactly one Exchange (the per-shard window) — " +
      "never a global window") {
    val docs = corpus(1L to 20L, _ => 5)
    val sp = Packing.packSpans(docs, "text", "doc_id", 4, 16)
    val p = sp.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size === 1, p)
    assert(p.contains("hashpartitioning(sh"), p)
  }

  // ------------------------------------------------------------------
  // chunkTokens
  // ------------------------------------------------------------------

  test("chunkTokens: exact windows, strides, final short chunk, and " +
      "content keys") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Packing.chunkTokens(docs, "text", "doc_id", w = 4, s = 3)
      .orderBy("chunk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    def key(a: Int, b: Int) = {
      val txt = (a to b).map(i => s"t$i").mkString(" ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(txt.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(got.toSeq === Seq(
      (0L, 0L, 4L, key(1, 4)),
      (1L, 3L, 4L, key(4, 7)),
      (2L, 6L, 4L, key(7, 10))))
  }

  test("chunkTokens: short doc yields one chunk; stride = window tiles " +
      "disjointly; stride > window refused") {
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    val one = Packing.chunkTokens(short, "text", "doc_id", 4, 3).collect()
    assert(one.length === 1 && one(0).getAs[Long]("n_tok") === 2L)
    val docs = Seq((1L, (1 to 12).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val tiled = Packing.chunkTokens(docs, "text", "doc_id", 4, 4)
      .orderBy("chunk").collect()
    assert(tiled.map(_.getAs[Long]("t0")).toSeq === Seq(0L, 4L, 8L))
    assert(tiled.map(_.getAs[Long]("n_tok")).sum === 12L)
    intercept[IllegalArgumentException] {
      Packing.chunkTokens(docs, "text", "doc_id", 4, 5)
    }
  }

  test("chunkTokens is map-only: zero Exchange in the plan") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val p = Packing.chunkTokens(docs, "text", "doc_id", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  // ------------------------------------------------------------------
  // packWhole / binReport
  // ------------------------------------------------------------------

  /** Sequential reference for the greedy no-split scan. */
  private def referenceWhole(
      keyed: Seq[(Int, Long, Long, Long, Long)], // (sh, b, okey, id, ntok)
      cap: Long): Set[(Int, Long, Long, Long, Long, Boolean)] =
    keyed.groupBy(_._1).toSeq.flatMap { case (sh, rows) =>
      var bin = -1L
      var fill = cap
      rows.sortBy(r => (r._3, r._4)).map { case (_, _, _, id, ntok) =>
        val oversize = ntok > cap
        val off = if (oversize || fill + ntok > cap) { bin += 1; 0L }
                  else fill
        fill = if (oversize) cap else off + ntok
        (sh, bin, id, ntok, off, oversize)
      }
    }.toSet

  test("packWhole matches an independent sequential greedy reference; " +
      "bins never exceed capacity, oversize docs sit alone, bin ids " +
      "are dense, and the layout is partitioning-independent") {
    val docs = corpus(1L to 80L, i => (i % 37 + 2).toInt)
    val cap = 40L
    val out = Packing.packWhole(docs, "text", "doc_id", 4, cap,
      Seq("source"))
    val got = out.collect().map(r => (r.getAs[Int]("sh"),
      r.getAs[Long]("bin"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("ntok"), r.getAs[Long]("bin_off"),
      r.getAs[Boolean]("oversize"))).toSet
    assert(got === referenceWhole(keyedOf(docs, 4, _ => 0L), cap))
    // invariants
    val byBin = got.groupBy(r => (r._1, r._2))
    byBin.foreach { case ((sh, bin), rs) =>
      if (rs.exists(_._6)) assert(rs.size === 1,
        s"oversize doc shares bin ($sh,$bin)")
      else assert(rs.map(_._4).sum <= cap, s"bin ($sh,$bin) overflows")
    }
    got.groupBy(_._1).foreach { case (sh, rs) =>
      val bins = rs.map(_._2)
      assert(bins.min === 0L && bins.max === bins.size - 1L,
        s"shard $sh bin ids not dense")
    }
    // same layout no matter how the input arrives
    val shuffled = Packing.packWhole(docs.repartition(7), "text",
      "doc_id", 4, cap, Seq("source"))
    assert(spanlessSet(shuffled) === spanlessSet(out))
  }

  private def spanlessSet(df: DataFrame) =
    df.select("sh", "bin", "doc_id", "ntok", "bin_off", "oversize")
      .collect().map(_.toSeq).toSet

  test("binReport: exact bins/oversize/tokens/padding per shard and " +
      "the utilization quotient") {
    val docs = corpus(1L to 50L, i => (i % 23 + 2).toInt)
    val cap = 30L
    val packed = Packing.packWhole(docs, "text", "doc_id", 2, cap, Nil)
    val rep = Packing.binReport(packed, cap).collect()
      .map(r => r.getAs[Int]("sh") -> ((r.getAs[Long]("n_bins"),
        r.getAs[Long]("n_oversize"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("padding"), r.getAs[Double]("utilization")))).toMap
    val ref = referenceWhole(keyedOf(docs, 2, _ => 0L), cap)
    ref.toSeq.groupBy(_._1).foreach { case (sh, rs) =>
      val bins = rs.groupBy(_._2)
      val nBins = bins.size.toLong
      val nOver = bins.count(_._2.exists(_._6)).toLong
      val toks = rs.map(_._4).sum
      val pad = bins.values.filterNot(_.exists(_._6))
        .map(b => cap - b.map(_._4).sum).sum
      val (gB, gO, gT, gP, gU) = rep(sh)
      assert((gB, gO, gT, gP) === ((nBins, nOver, toks, pad)))
      assert(gU === toks.toDouble / (nBins * cap))
    }
  }

  // ------------------------------------------------------------------
  // materializeSequences
  // ------------------------------------------------------------------

  test("materializeSequences reconstructs each sequence's exact text " +
      "(content keys match an independent per-shard stream cut) and " +
      "restores order without a Window") {
    val docs = corpus(1L to 40L, i => (i % 9 + 1).toInt)
    // materialize from spans AT REST (the ledger consumer's reality),
    // so the plan gate sees x150's own shape, not packSpans' window
    val spDir = java.nio.file.Files.createTempDirectory("pack_mat").toString
    Packing.packSpans(docs, "text", "doc_id", 3, 16)
      .write.mode("overwrite").parquet(spDir)
    val mat = Packing.materializeSequences(
      spark.read.parquet(spDir), docs, "text", "doc_id")
    val got = mat.collect().map(r => (r.getAs[Int]("sh"),
      r.getAs[Long]("seq")) -> ((r.getAs[Long]("n_tok"),
      r.getAs[String]("skey")))).toMap
    // independent reconstruction: concatenate each shard's stream in
    // (okey, id) order and cut every 16 tokens
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = keyedOf(docs, 3, _ => 0L).groupBy(_._1).flatMap {
      case (sh, rows) =>
        val stream = rows.sortBy(r => (r._2, r._3, r._4))
          .flatMap(r => texts(r._4).trim.split("\\s+"))
        stream.grouped(16).zipWithIndex.map { case (seqToks, i) =>
          val txt = seqToks.mkString(" ")
          val key = java.security.MessageDigest.getInstance("MD5")
            .digest(txt.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (sh, i.toLong) -> ((seqToks.length.toLong, key))
        }
    }
    assert(got === want)
    val p = mat.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
  }

  // ------------------------------------------------------------------
  // the packed-stream ledger
  // ------------------------------------------------------------------

  private def tmpDir(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString + "/ledger"

  test("ledger: append continues each shard's stream from the persisted " +
      "cursors — append ≡ rebuild under the same schedule, including a " +
      "sequence straddling the batch boundary") {
    val docs = corpus(1L to 60L, i => (i % 13 + 1).toInt)
    val a = docs.where(col("doc_id") <= 40)
    val b = docs.where(col("doc_id") > 40)
    val dir = tmpDir("pack_led")
    Packing.writeLedger(a, "text", "doc_id", dir, 4, 16, Seq("source"))
    Packing.appendToLedger(b, "text", "doc_id", dir, Some("b1"))
    val got = spanSet(Packing.readLedgerSpans(spark, dir))
    val want = referenceSpans(
      keyedOf(docs, 4, id => if (id <= 40) 0L else 1L), 16)
    assert(got === want)
    // the straddle actually occurs: some sequence holds docs of both
    // batches (cursor totals are not multiples of 16 on every shard)
    val bySeq = got.groupBy(r => (r._1, r._2))
      .map { case (k, v) => k -> v.map(_._3) }
    assert(bySeq.exists { case (_, ids) =>
      ids.exists(_ <= 40) && ids.exists(_ > 40) })
  }

  test("ledger: marked replay is a no-op (spans AND cursors); an " +
      "unmarked replay lands twice — the documented failure mode") {
    val docs = corpus(1L to 30L, _ => 7)
    val a = docs.where(col("doc_id") <= 20)
    val b = docs.where(col("doc_id") > 20)
    val dir = tmpDir("pack_rep")
    Packing.writeLedger(a, "text", "doc_id", dir, 2, 16, Seq("source"))
    Packing.appendToLedger(b, "text", "doc_id", dir, Some("b1"))
    val n1 = Packing.readLedgerSpans(spark, dir).count()
    val c1 = Packing.readCursors(spark, dir).collect()
      .map(r => r.getAs[Int]("sh") -> r.getAs[Long]("n_tokens")).toMap
    Packing.appendToLedger(b, "text", "doc_id", dir, Some("b1")) // replay
    assert(Packing.readLedgerSpans(spark, dir).count() === n1)
    val c2 = Packing.readCursors(spark, dir).collect()
      .map(r => r.getAs[Int]("sh") -> r.getAs[Long]("n_tokens")).toMap
    assert(c2 === c1)
    Packing.appendToLedger(b, "text", "doc_id", dir, None) // unmarked
    assert(Packing.readLedgerSpans(spark, dir).count() > n1)
  }

  test("ledger: cursors report exact per-shard token totals and ceil'd " +
      "sequence counts") {
    val docs = corpus(1L to 30L, i => (i % 5 + 1).toInt)
    val dir = tmpDir("pack_cur")
    Packing.writeLedger(docs.where(col("doc_id") <= 15), "text", "doc_id",
      dir, 2, 16, Nil)
    Packing.appendToLedger(docs.where(col("doc_id") > 15), "text",
      "doc_id", dir, Some("b1"))
    val want = keyedOf(docs, 2, _ => 0L).groupBy(_._1)
      .map { case (sh, rs) => sh -> rs.map(_._5).sum }
    val got = Packing.readCursors(spark, dir).collect()
      .map(r => (r.getAs[Int]("sh"),
        (r.getAs[Long]("n_batches"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_seqs")))).toMap
    want.foreach { case (sh, n) =>
      assert(got(sh) === ((2L, n, (n + 15) / 16)))
    }
  }

  test("epochPlan: a full per-shard permutation of the dense sequence " +
      "universe, different per epoch, served without reading spans") {
    val docs = corpus(1L to 60L, i => (i % 13 + 1).toInt)
    val dir = tmpDir("pack_ep")
    Packing.writeLedger(docs.where(col("doc_id") <= 40), "text", "doc_id",
      dir, 4, 16, Nil)
    Packing.appendToLedger(docs.where(col("doc_id") > 40), "text",
      "doc_id", dir, Some("b1"))
    val nSeqs = Packing.readCursors(spark, dir).collect()
      .map(r => r.getAs[Int]("sh") -> r.getAs[Long]("n_seqs")).toMap
    val p3 = Packing.epochPlan(spark, dir, 3L)
    val rows = p3.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (sh, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (0L until nSeqs(sh)).toSeq,
        s"shard $sh positions not dense")
      assert(rs.map(_._3).sorted.toSeq === (0L until nSeqs(sh)).toSeq,
        s"shard $sh sequence universe wrong")
    }
    // reproducible, and a different epoch is a different permutation
    val again = Packing.epochPlan(spark, dir, 3L).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === rows.toSet)
    val p4 = Packing.epochPlan(spark, dir, 4L).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(p4 !== rows.toSet, "epoch 4 must reshuffle")
    // bounded-artifact read: the plan never scans the spans directory
    val files = p3.queryExecution.executedPlan.toString
    assert(!files.contains("/spans"), files)
    assert(files.contains("/cursors"), files)
  }

  test("ledger: compaction folds per-append files to one per shard " +
      "directory, is value-preserving, and the ledger stays appendable") {
    val docs = corpus(1L to 45L, _ => 5)
    val dir = tmpDir("pack_cmp")
    Packing.writeLedger(docs.where(col("doc_id") <= 15), "text", "doc_id",
      dir, 2, 16, Seq("source"))
    Packing.appendToLedger(
      docs.where(col("doc_id") > 15 && col("doc_id") <= 30),
      "text", "doc_id", dir, Some("b1"))
    val before = spanSet(Packing.readLedgerSpans(spark, dir))
    Packing.compactLedger(spark, dir)
    assert(spanSet(Packing.readLedgerSpans(spark, dir)) === before)
    val shDir = new java.io.File(s"$dir/spans/sh=0")
    assert(shDir.listFiles().count(f =>
      f.getName.endsWith(".parquet") || f.getName.startsWith("part-")) <= 1,
      shDir.listFiles().map(_.getName).mkString(","))
    Packing.appendToLedger(docs.where(col("doc_id") > 30), "text",
      "doc_id", dir, Some("b2"))
    val want = referenceSpans(keyedOf(docs, 2,
      id => if (id <= 15) 0L else if (id <= 30) 1L else 2L), 16)
    assert(spanSet(Packing.readLedgerSpans(spark, dir)) === want)
  }

  test("ledger: a one-shard read prunes to the shard's partition " +
      "directories; a batch lacking a carried column is refused") {
    val docs = corpus(1L to 20L, _ => 5)
    val dir = tmpDir("pack_prn")
    Packing.writeLedger(docs, "text", "doc_id", dir, 4, 16, Seq("source"))
    val sh0 = Packing.readLedgerSpans(spark, dir)
      .select("sh").head.getInt(0)
    val q = Packing.readLedgerSpans(spark, dir).where(col("sh") === sh0)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("sh"), p)
    assert(q.count() > 0)
    intercept[IllegalArgumentException] {
      Packing.appendToLedger(docs.drop("source"), "text", "doc_id", dir,
        Some("b9"))
    }
  }
}
