package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence materialization — the LAST MILE of a training-data
  * pipeline: turning the curated corpus into the fixed-length token
  * sequences a trainer actually consumes, plus the retrieval-side
  * chunking twin. Nothing here tokenizes with a learned vocabulary —
  * the unit is the whitespace token (the repo-wide convention shared
  * with BM25/TF-IDF/sketches); a BPE pass (Bpe.encode, x50) composes
  * upstream when subword units are wanted.
  *
  * Three operators:
  *
  *   - [[packSpans]] — GPT-style "concatenate and cut" packing: every
  *     document is assigned to a shard by a deterministic 60-bit md5
  *     key, documents within a shard are concatenated in deterministic
  *     shuffled order, and the shard's token stream is cut every
  *     `seqLen` tokens. The output is not the sequences themselves but
  *     the PROVENANCE relation — one row per (document × sequence it
  *     overlaps) with exact token coordinates on both axes — which is
  *     simultaneously the writer plan (group by (shard, seq), slice
  *     each doc's tokens, concatenate) and the attribution/audit table
  *     ("which sequences contain bytes of doc X").
  *   - [[chunkTokens]] — overlapping token windows per document
  *     (size `w`, stride `s ≤ w`), the retrieval/RAG twin of packing.
  *     Map-only: no shuffle anywhere in the plan.
  *   - the at-rest PACKED-STREAM LEDGER ([[writeLedger]] /
  *     [[appendToLedger]] / [[readLedgerSpans]] / [[readCursors]] /
  *     [[compactLedger]]) — packing is inherently ARRIVAL-ORDERED
  *     state (a sequence id is a position in a stream), so the ledger
  *     persists the span relation shard-partitioned together with
  *     per-(batch, shard) token cursors; a new batch packs from the
  *     persisted cursors and lands as an O(batch) crash-atomic append
  *     ([[Compaction.appendWithMarker]]), never re-reading or
  *     renumbering ingested history. Append ≡ rebuild UNDER THE SAME
  *     BATCH SCHEDULE (the arrival order is part of the contract, as
  *     in any real pretraining data layout).
  *
  * Scale shape (100 TB): packSpans pays exactly ONE shuffle — the
  * window partitioned by shard. Choose nShards so a shard's token
  * stream fits a task comfortably (corpus_tokens / nShards ≈ 10⁷–10⁸);
  * shards are md5-balanced so no salting is needed. The explode is
  * map-side; spans are ~1 row per document plus one per boundary
  * crossing (≤ 1 + ntok/seqLen), carrying ids and coordinates only —
  * like the manifest, ~1% of corpus bytes. The ledger's append reads
  * the bounded cursor relation (batches × shards rows), packs ONLY the
  * batch, and lands files next to existing ones; readers prune to a
  * shard via the `sh=` partition directories.
  *
  * NOT retractable, loudly: a sequence id is a stream position, so
  * removing an ingested batch would renumber every later token —
  * retraction of packed state is a REBUILD of the affected shards (or
  * an exclusion list applied downstream), not a negated append; see
  * the x143 family for the sketch artifacts where subtraction is exact.
  */
object Packing {

  /** 60-bit non-negative key: first 15 md5 hex digits of `c` — the
    * repo-wide engine-agreeable hash (DuckDB mirror:
    * `CAST(('0x' || substring(md5(c), 1, 15)) AS BIGINT)`). */
  private[operators] def md560(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace token count — the repo-wide token unit. (Empty text
    * counts 1 — `split` on "" yields one empty token in BOTH engines;
    * the testdata corpus has no empty docs.) */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** Core span derivation. `batchOrd` orders batches WITHIN a shard
    * ahead of the shuffled doc order (one-shot packing passes a
    * constant); `baseOffsets` (sh → tokens already packed) shifts the
    * stream origin for incremental appends. */
  private def spans(docs: DataFrame, textCol: String, idCol: String,
                    nShards: Int, seqLen: Int, carryCols: Seq[String],
                    batchOrd: Column,
                    baseOffsets: Option[DataFrame]): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(seqLen > 0, "seqLen must be positive")
    val id = col(idCol)
    val keyed = docs.select(
      (md560(concat(lit("sh_"), id)) % nShards).cast("int").as("sh"),
      md560(concat(lit("ok_"), id)).as("okey"),
      batchOrd.cast("long").as("b"),
      id.as(idCol),
      tokenCount(col(textCol)).as("ntok"),
      struct((carryCols :+ idCol).map(col): _*).as("__carry"))
    val based = baseOffsets match {
      case None => keyed.withColumn("base", lit(0L))
      case Some(bo) =>
        // bounded relation (nShards rows) — broadcast into the batch
        keyed.join(broadcast(bo.select(col("sh"),
            col("base").cast("long").as("base"))), Seq("sh"), "left")
          .withColumn("base", coalesce(col("base"), lit(0L)))
    }
    // THE one shuffle: per-shard running token offset. Arrival order
    // (b) outranks the shuffled order (okey, id) so an appended batch
    // extends the stream instead of interleaving into it.
    val w = Window.partitionBy("sh").orderBy(col("b"), col("okey"), id)
    val off = based
      .withColumn("off", col("base") + sum("ntok").over(w) - col("ntok"))
      .withColumn("first_seq", expr(s"off div $seqLen"))
      .withColumn("last_seq", expr(s"(off + ntok - 1) div $seqLen"))
    off.select(col("sh"), col("off"), col("ntok"), col("__carry"),
        explode(expr("sequence(first_seq, last_seq)")).as("seq"))
      .select(
        col("sh"), col("seq"),
        col("__carry.*"),
        greatest(lit(0L), col("seq") * seqLen - col("off")).as("t0"),
        least(col("ntok"),
          (col("seq") + 1) * seqLen - col("off")).as("t1"),
        greatest(lit(0L), col("off") - col("seq") * seqLen).as("seq_off"))
  }

  /** One-shot concat-and-cut packing of `docs` into `nShards`
    * independent token streams cut every `seqLen` tokens.
    *
    * Output: one row per (document × overlapped sequence) —
    * `(sh, seq, <carryCols>, idCol, t0, t1, seq_off)` where `[t0, t1)`
    * is the doc-local token span landing in sequence `seq` of shard
    * `sh` at sequence-local offset `seq_off`. Spans tile each document
    * exactly and tile each sequence exactly (`seqLen` tokens per
    * sequence except the shard-final remainder) — invariants pinned in
    * PackingSpec. Deterministic: shard and order keys are md5 of the
    * id, so the layout is a pure function of the corpus. */
  def packSpans(docs: DataFrame, textCol: String, idCol: String,
                nShards: Int, seqLen: Int,
                carryCols: Seq[String] = Nil): DataFrame =
    spans(docs, textCol, idCol, nShards, seqLen, carryCols,
      lit(0L), None)

  /** Overlapping token-window chunking: window `w` tokens, stride
    * `s ≤ w` (chunk i covers doc tokens `[i·s, i·s+w)`; the final
    * chunk is the first whose window reaches the end — short, never
    * empty). Output per chunk: `(idCol, chunk, t0, n_tok, ckey)` with
    * `ckey` = md5 of the space-joined chunk text (certifying content,
    * not just coordinates). Map-only — zero Exchange. */
  def chunkTokens(docs: DataFrame, textCol: String, idCol: String,
                  w: Int, s: Int): DataFrame = {
    require(w > 0, "window must be positive")
    require(s > 0 && s <= w, "stride must be in [1, window]")
    val toks = split(trim(col(textCol)), "\\s+")
    val d = docs.select(col(idCol), toks.as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("nchunks",
        lit(1L) + expr(s"(greatest(n - $w, 0L) + ${s - 1}) div $s"))
    d.select(col(idCol), col("toks"), col("n"),
        explode(expr("sequence(0L, nchunks - 1)")).as("chunk"))
      .select(col(idCol), col("chunk"),
        (col("chunk") * s).as("t0"),
        least(lit(w.toLong), col("n") - col("chunk") * s).as("n_tok"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("chunk") * s).cast("int") + 1, lit(w))))
          .as("ckey"))
  }

  /** Whole-document greedy packing — the NO-SPLIT mode (padded SFT
    * batches, instruction-tuning sets, any consumer that cannot take a
    * document across a sequence boundary). Documents travel whole:
    * within a shard, in the same deterministic md5-shuffled arrival
    * order as [[packSpans]], each doc lands in the current bin if it
    * fits (`fill + ntok ≤ capacity`) and otherwise OPENS a new bin;
    * a doc with `ntok > capacity` gets a bin of its own, flagged
    * `oversize = true` (truncate/split/drop is the downstream caller's
    * policy decision, not silently taken here).
    *
    * Output: one row per doc — `(sh, bin, <carry>, idCol, ntok,
    * bin_off, oversize)` with `bin_off` the doc's token offset inside
    * its bin. Greedy first-fit-in-arrival-order is inherently
    * SEQUENTIAL state, so this is the repo's sanctioned last-resort
    * shape: ONE shuffle (repartition by shard), an in-partition sort,
    * and a linear mapPartitions scan with O(1) state — each shard is
    * scanned exactly once by exactly one task; nShards is the
    * parallelism knob exactly as in [[packSpans]]. Deterministic under
    * any partitioning: the (sh, okey, id) sort is a total order, and a
    * shard never spans two partitions (hash-partitioned on sh). */
  def packWhole(docs: DataFrame, textCol: String, idCol: String,
                nShards: Int, capacity: Long,
                carryCols: Seq[String] = Nil): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(capacity > 0, "capacity must be positive")
    import org.apache.spark.sql.types._
    val id = col(idCol)
    val keyed = docs.select(
      (md560(concat(lit("sh_"), id)) % nShards).cast("int").as("sh"),
      md560(concat(lit("ok_"), id)).as("okey"),
      id.cast("long").as("__ord"),
      tokenCount(col(textCol)).as("ntok"),
      struct((carryCols :+ idCol).map(col): _*).as("__carry"))
    val sorted = keyed.repartition(col("sh"))
      .sortWithinPartitions(col("sh"), col("okey"), col("__ord"))
    val carryType = keyed.schema("__carry").dataType
    val outSchema = StructType(Seq(
      StructField("sh", IntegerType), StructField("bin", LongType),
      StructField("ntok", LongType), StructField("bin_off", LongType),
      StructField("oversize", BooleanType),
      StructField("__carry", carryType)))
    val packed = sorted.mapPartitions { it =>
      var curSh = Int.MinValue
      var bin = -1L
      var fill = 0L
      it.map { r =>
        val sh = r.getInt(0)
        val ntok = r.getLong(3)
        if (sh != curSh) { curSh = sh; bin = -1L; fill = capacity }
        val oversize = ntok > capacity
        val off =
          if (oversize || fill + ntok > capacity) { bin += 1; 0L }
          else fill
        fill = if (oversize) capacity else off + ntok
        org.apache.spark.sql.Row(sh, bin, ntok, off, oversize, r.get(4))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    packed.select(col("sh"), col("bin"), col("__carry.*"), col("ntok"),
      col("bin_off"), col("oversize"))
  }

  /** Bin-efficiency report over a [[packWhole]] result: per shard the
    * bin/doc/oversize counts, exact token mass, total padding
    * (capacity − bin fill, over non-oversize bins) and the utilization
    * share (one IEEE division of exact longs). The governance readout
    * that decides whether `capacity` or the shard geometry needs
    * retuning — two bounded partial-aggregated passes, no window. */
  def binReport(packed: DataFrame, capacity: Long): DataFrame = {
    val bins = packed.groupBy("sh", "bin").agg(
      sum("ntok").as("bin_tokens"),
      max(col("oversize").cast("int")).as("os"))
    bins.groupBy("sh").agg(
        count(lit(1)).as("n_bins"),
        sum("os").as("n_oversize"),
        sum("bin_tokens").as("n_tokens"),
        sum(when(col("os") === 0, lit(capacity) - col("bin_tokens"))
          .otherwise(lit(0L))).as("padding"))
      .withColumn("utilization",
        col("n_tokens") / (col("n_bins") * capacity))
  }

  /** Materialize the packed sequences' CONTENT from a span relation
    * (one-shot [[packSpans]] output or the persisted ledger) joined
    * back to the corpus: per (sh, seq) the actual token count and an
    * md5 content key over the space-joined sequence text — the writer
    * step a trainer's data loader consumes, and the end-to-end
    * certification that the coordinate relation reconstructs exactly
    * the text it promises.
    *
    * Shape: ONE equi-join on the doc id (corpus-sized but
    * co-partitioned — both sides shuffle on the id, no broadcast of
    * anything corpus-sized) and ONE partial-aggregated groupBy
    * (sh, seq) whose per-group state is bounded by seqLen tokens; the
    * within-sequence order is restored by an array_sort over that
    * bounded state, never a window. */
  def materializeSequences(spans: DataFrame, docs: DataFrame,
                           textCol: String, idCol: String): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val joined = spans.join(docs.select(col(idCol), toks.as("__toks")),
      Seq(idCol))
    joined.select(col("sh"), col("seq"), col("seq_off"),
        (col("t1") - col("t0")).as("n"),
        slice(col("__toks"), col("t0").cast("int") + 1,
          (col("t1") - col("t0")).cast("int")).as("piece"))
      .groupBy("sh", "seq")
      .agg(sum("n").as("n_tok"),
        md5(concat_ws(" ", flatten(expr(
          "transform(array_sort(collect_list(struct(seq_off, piece)))," +
            " x -> x.piece)")))).as("skey"))
  }

  // ------------------------------------------------------------------
  // The at-rest packed-stream ledger
  // ------------------------------------------------------------------

  private def metaPath(dir: String) = s"$dir/meta"
  private def spansPath(dir: String) = s"$dir/spans"
  private def cursorsPath(dir: String) = s"$dir/cursors"

  /** Per-(batch, shard) token/doc counts of `sp` — the cursor delta a
    * batch contributes. Cursor of a shard = SUM over batches. */
  private def cursorDelta(sp: DataFrame, batchIdx: Long): DataFrame =
    sp.groupBy("sh").agg(
        sum(col("t1") - col("t0")).as("n_tokens"),
        count(lit(1)).as("n_rows"))
      .select(lit(batchIdx).as("batch_idx"), col("sh"),
        col("n_tokens"), col("n_rows"))

  /** Build the ledger from the day-0 corpus: geometry row, batch-0
    * spans partitioned by `sh`, batch-0 cursors. Overwrites `dir`. */
  def writeLedger(docs: DataFrame, textCol: String, idCol: String,
                  dir: String, nShards: Int, seqLen: Int,
                  carryCols: Seq[String] = Nil): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(dir), true)
    val sp = spans(docs, textCol, idCol, nShards, seqLen, carryCols,
      lit(0L), None)
    sp.write.partitionBy("sh").parquet(spansPath(dir))
    cursorDelta(spark.read.parquet(spansPath(dir)), 0L)
      .write.parquet(cursorsPath(dir))
    Seq((nShards, seqLen, carryCols.mkString(",")))
      .toDF("n_shards", "seq_len", "carry_cols")
      .write.mode("overwrite").parquet(metaPath(dir))
  }

  /** O(batch) incremental append: geometry and per-shard base offsets
    * come OFF THE ARTIFACT (meta + summed cursors — a bounded read;
    * ingested spans are never touched), the batch packs exactly as
    * [[packSpans]] would, shifted to continue each shard's stream, and
    * everything lands through the shared crash-atomic marker protocol.
    * A sequence straddling the batch boundary is completed by the new
    * batch under the SAME seq id — append ≡ rebuild with the same
    * schedule (spec-pinned). Replay with the same `doneMarker` is a
    * no-op; an unmarked replay lands duplicate spans AND doubles the
    * cursors (the documented at-least-once failure mode — packing is
    * positional, so the marker is load-bearing exactly as for the
    * SUM-merged sketches). */
  def appendToLedger(docs: DataFrame, textCol: String, idCol: String,
                     dir: String, doneMarker: Option[String]): Unit = {
    val spark = docs.sparkSession
    val meta = spark.read.parquet(metaPath(dir)).collect()(0)
    val nShards = meta.getAs[Int]("n_shards")
    val seqLen = meta.getAs[Int]("seq_len")
    val carryCols = meta.getAs[String]("carry_cols") match {
      case "" => Nil
      case s  => s.split(",").toSeq
    }
    carryCols.foreach(c => require(docs.columns.contains(c),
      s"ledger at $dir carries column '$c' which the batch lacks"))
    val cur = spark.read.parquet(cursorsPath(dir))
    val agg = cur.agg(max("batch_idx"), sum("n_tokens")).collect()(0)
    val nextBatch = agg.getLong(0) + 1L
    val base = cur.groupBy("sh").agg(sum("n_tokens").as("base"))
    val sp = spans(docs, textCol, idCol, nShards, seqLen, carryCols,
      lit(nextBatch), Some(base))
    Compaction.appendWithMarker(spark, dir, doneMarker) { staging =>
      sp.write.partitionBy("sh").parquet(s"$staging/spans")
      cursorDelta(spark.read.parquet(s"$staging/spans"), nextBatch)
        .write.parquet(s"$staging/cursors")
    }
  }

  /** The full persisted span relation. Filtering on `sh` prunes to
    * the shard's partition directories (plan-gated in PackingSpec). */
  def readLedgerSpans(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(spansPath(dir))

  /** Per-shard stream positions: `(sh, n_batches, n_tokens, n_seqs)` —
    * a bounded read (batches × shards rows + the 1-row meta). */
  def readCursors(spark: SparkSession, dir: String): DataFrame = {
    val seqLen = spark.read.parquet(metaPath(dir))
      .collect()(0).getAs[Int]("seq_len")
    spark.read.parquet(cursorsPath(dir))
      .groupBy("sh").agg(
        countDistinct("batch_idx").as("n_batches"),
        sum("n_tokens").as("n_tokens"))
      .withColumn("n_seqs",
        expr(s"(n_tokens + ${seqLen - 1}) div $seqLen"))
  }

  /** The epoch-`epoch` LOADING SCHEDULE, served off the persisted
    * cursors ALONE: sequence ids are dense per shard (0 until n_seqs,
    * a consequence of concat-and-cut), so the universe of sequences is
    * derivable from the bounded cursor relation — the plan never reads
    * spans, let alone the corpus. Per shard, the epoch order is the
    * deterministic md5 permutation keyed by (epoch, sh, seq): every
    * epoch is a fresh full shuffle, reproducible on any machine, and a
    * crashed training run resumes by filtering `epoch_pos >= k` — no
    * shuffle-buffer state to persist. Output: `(sh, epoch_pos, seq)`.
    *
    * Scale: |output| = total sequences (corpus_tokens / seqLen — for
    * 100 TB at 8k tokens/seq about 10⁹ rows of three longs), built
    * from a cursors read of batches × shards rows; the per-shard
    * ranking window is bounded by the shard's sequence count, the
    * same geometry the packing window already holds. */
  def epochPlan(spark: SparkSession, dir: String, epoch: Long): DataFrame = {
    val w = Window.partitionBy("sh").orderBy(col("rk"), col("seq"))
    readCursors(spark, dir)
      .select(col("sh"), explode(expr("sequence(0L, n_seqs - 1)")).as("seq"))
      .withColumn("rk", md560(concat(lit(s"ep${epoch}_"), col("sh"),
        lit("_"), col("seq"))))
      .withColumn("epoch_pos", (row_number().over(w) - 1).cast("long"))
      .select(col("sh"), col("epoch_pos"), col("seq"))
  }

  /** LSM maintenance: fold the per-append span files of every `sh=`
    * directory into one file each and the cursor micro-files into one,
    * value-preserving (spans are keyed facts; cursors keep their
    * per-batch rows so the schedule audit and next batch_idx survive).
    * Refuses while a marked append is in flight (shared protocol). */
  def compactLedger(spark: SparkSession, dir: String): Unit = {
    Compaction.compactPartitionedDir(spark, spansPath(dir), Seq("sh"))
    Compaction.compactValueDir(spark, cursorsPath(dir)) {
      spark.read.parquet(cursorsPath(dir))
    }
  }
}
