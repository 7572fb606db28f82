package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared offset-agreement matcher behind constellation
  * fingerprint dedup — audio spectral tokens ([[AudioFingerprint]],
  * probe x127) and temporally-aligned video perceptual-hash tokens
  * ([[graft.multimodal.PerceptualHash.videoNearDup]], probe x128)
  * both reduce to it: media become (media_id, t, token) relations,
  * candidates come from ONE equi-join on the token (the x06 LSH
  * band-bucket shape), and a true duplicate/containment reveals
  * itself by many matches agreeing on a single time offset t_a − t_b
  * while coincidental collisions scatter across offsets. */
object Constellation {

  /** Match two token relations (columns media_id, t, token):
    * (a_id, b_id, offset, n_matches) for each pair's best offset
    * (max matches, ties → smaller offset), n_matches ≥ minMatches.
    *
    * `maxTokenFreq` is the hot-bucket cap: a token carried by more
    * media than that on either side is dropped BEFORE the join (a
    * degenerate token — digital silence, a flat video frame — would
    * otherwise pair everything containing it quadratically). Recall
    * trade, stated: duplicates whose ONLY shared tokens are that
    * common are missed.
    *
    * Scale shape: the join is token-bucketed; scoring is a bounded
    * two-level aggregation (offset counts, then a partial-aggregable
    * max-struct argmax) — no window over candidates anywhere. */
  def matchPairs(a: DataFrame, b: DataFrame, minMatches: Int = 4,
                 maxTokenFreq: Long = 1000L,
                 bFreq: Option[DataFrame] = None): DataFrame = {
    require(minMatches >= 1, "minMatches must be >= 1")
    def rare(df: DataFrame, precomputed: Option[DataFrame]): DataFrame = {
      val hot = precomputed match {
        // a PERSISTED (token, n_media) relation — the at-rest index's
        // stats table — replaces the corpus-wide countDistinct re-
        // aggregation; equal to it whenever batches carried disjoint
        // media (the stats contract, see [[writeTokenIndex]])
        case Some(freq) => freq.where(col("n_media") > maxTokenFreq)
          .select("token")
        case None => df.groupBy("token")
          .agg(countDistinct("media_id").as("tf"))
          .where(col("tf") > maxTokenFreq)
          .select("token")
      }
      df.join(hot, Seq("token"), "left_anti")
    }
    val al = rare(a, None).select(col("media_id").as("a_id"),
      col("t").as("a_t"), col("token"))
    val bl = rare(b, bFreq).select(col("media_id").as("b_id"),
      col("t").as("b_t"), col("token"))
    al.join(bl, "token")
      .groupBy(col("a_id"), col("b_id"),
        (col("a_t") - col("b_t")).as("offset"))
      .agg(count(lit(1)).as("n"))
      .groupBy("a_id", "b_id")
      .agg(max(struct(col("n"), (-col("offset")).as("no"),
        col("offset"))).as("best"))
      .select(col("a_id"), col("b_id"),
        col("best.offset").as("offset"), col("best.n").as("n_matches"))
      .where(col("n_matches") >= minMatches)
  }

  /** Corpus-size-aware default for `maxTokenFreq`: a token carried by
    * more media than `headroom`× the EXPECTED per-token media count
    * (corpusMedia·tokensPerMedia / 2^tokenSpaceBits) is boilerplate,
    * not signal — under a uniform hash no organic token should sit
    * that far above expectation. The floor keeps small corpora at the
    * benchmark-scale default (where expectation ≪ 1 and any fixed cap
    * is generous).
    *
    * Why this must SCALE and not stay fixed: the match join's
    * coincidental-pair volume is ≤ Σ_token freq_a·freq_b ≤
    * |batch tokens|·cap — linear in the batch ONLY while the cap
    * dominates typical frequencies. Once the token space saturates
    * (expected frequency within headroom of a fixed cap — for the
    * 26-bit audio geometry that is ~10⁸⁺ media at ~20 tokens each)
    * a fixed cap stops distinguishing boilerplate from the MEAN, the
    * uncapped pair volume grows quadratically in corpus size, and no
    * cap value is simultaneously precise and complete. A derived cap
    * keeps the guard meaningful up to the saturation point; AT the
    * saturation point the correct fix is a wider token geometry (a
    * 4th audio peak, finer Δt quantization — a new index `kind`),
    * exactly as the video path widened single-frame tokens to
    * frame-pair tokens when its 18-bit space measurably saturated
    * (PerceptualHash.videoBandTokens). */
  def deriveMaxTokenFreq(corpusMedia: Long, tokensPerMedia: Double,
                         tokenSpaceBits: Int, headroom: Double = 64.0,
                         floor: Long = 1000L): Long = {
    require(corpusMedia >= 0L && tokensPerMedia >= 0.0,
      s"corpus shape must be non-negative: $corpusMedia × $tokensPerMedia")
    require(tokenSpaceBits >= 1 && tokenSpaceBits <= 62,
      s"tokenSpaceBits out of range: $tokenSpaceBits")
    require(headroom > 0.0 && floor >= 1L,
      s"headroom/floor must be positive: $headroom, $floor")
    val expected =
      corpusMedia.toDouble * tokensPerMedia / math.pow(2.0, tokenSpaceBits)
    math.max(floor, math.ceil(headroom * expected).toLong)
  }

  // --- The AT-REST token index (probe x129) -----------------------
  // Fingerprinting is the expensive pass (decode + DFT per audio,
  // decode + raster hash per video frame); the tokens are ~20 bytes
  // each. Persisting them makes media dedup INCREMENTAL — the x32
  // text-dedup / x104 ANN-append shape for the constellation family:
  // each ingest batch is fingerprinted ONCE (O(batch)), matched
  // against the persisted corpus tokens, and appended; raw corpus
  // media are never re-decoded. Layout under `path`:
  //   tokens/  (media_id, t, token) partitioned by tb =
  //            pmod(hash(token), n_buckets) — appends land beside
  //            existing files; the bucket key exists for compaction
  //            and parallel reads (queries carry many tokens, so
  //            partition PRUNING is not the point here)
  //   stats/   (token, n_media) per-batch distinct-media counts —
  //            the PERSISTED hot-token frequencies, merged by SUM at
  //            read; exists so the match-time rare() guard never
  //            re-aggregates the full token table (the one
  //            O(corpus-tokens) pass an otherwise O(batch) ingest
  //            cycle used to pay). Additive-merge contract: batches
  //            must carry DISJOINT media (each media fingerprinted
  //            into exactly one build/append batch), so per-batch
  //            countDistinct sums to the global countDistinct —
  //            the same assumption the token rows themselves make
  //            (re-landing a media inflates its match counts too)
  //   meta/    (kind, n_buckets) — `kind` names the tokenizer
  //            geometry (e.g. "audio_dft32_v1", "video_dhash_pair");
  //            appends and matches must present the same kind, or
  //            tokens from different geometries would silently mix
  // ---------------------------------------------------------------

  private def bucketed(tokens: DataFrame, nBuckets: Int): DataFrame =
    tokens.select(col("media_id"), col("t"), col("token"),
      pmod(hash(col("token")), lit(nBuckets)).as("tb"))

  /** One batch's per-token distinct-media counts (≤ distinct tokens
    * rows — no per-occurrence rows survive the agg). */
  private def tokenStats(tokens: DataFrame): DataFrame =
    tokens.groupBy("token").agg(countDistinct("media_id").as("n_media"))

  /** Build the at-rest index from a (media_id, t, token) relation —
    * tokens, their per-token media counts (the persisted hot-token
    * stats), and the geometry meta. */
  def writeTokenIndex(tokens: DataFrame, path: String, kind: String,
                      nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(kind.nonEmpty, "kind must name the tokenizer geometry")
    val spark = tokens.sparkSession
    import spark.implicits._
    bucketed(tokens, nBuckets)
      .write.partitionBy("tb").mode("overwrite").parquet(s"$path/tokens")
    tokenStats(tokens).write.mode("overwrite").parquet(s"$path/stats")
    Seq((kind, nBuckets)).toDF("kind", "n_buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def indexMeta(spark: org.apache.spark.sql.SparkSession,
                        path: String): (String, Int) = {
    val r = spark.read.parquet(s"$path/meta")
      .select("kind", "n_buckets").head()
    (r.getString(0), r.getInt(1))
  }

  private def requireKind(spark: org.apache.spark.sql.SparkSession,
                          path: String, kind: String): Int = {
    val (k, nb) = indexMeta(spark, path)
    require(k == kind,
      s"token index at $path holds '$k' tokens, caller presented '$kind' — " +
        "mixing tokenizer geometries would corrupt every later match")
    nb
  }

  /** Append a batch's tokens AND its per-token stats — O(batch),
    * existing tokens never read; both relations move into place
    * together under the family's crash-atomic staged protocol
    * ([[Compaction.appendWithMarker]]). Token rows are disjoint facts
    * (not merged), so a replayed batch would inflate n_matches for
    * its media — AND double its tokens' stats counts, breaking the
    * stats ≡ countDistinct contract: the `doneMarker` gate carries
    * the same weight as on the Count-Min artifact. */
  def appendToTokenIndex(batch: DataFrame, path: String, kind: String,
                         doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val nb = requireKind(spark, path, kind)
      bucketed(batch, nb)
        .write.partitionBy("tb").mode("overwrite").parquet(s"$staging/tokens")
      tokenStats(batch).write.mode("overwrite").parquet(s"$staging/stats")
    }
  }

  /** All persisted tokens (media_id, t, token). */
  def readTokenIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame =
    spark.read.parquet(s"$path/tokens").select("media_id", "t", "token")

  /** The merged persisted per-token media counts (token, n_media) —
    * one SUM over the ≤ batches·|distinct tokens| stats rows, never
    * the per-occurrence token table. */
  def readTokenStats(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame =
    spark.read.parquet(s"$path/stats")
      .groupBy("token").agg(sum("n_media").as("n_media"))

  /** Match one fingerprinted batch against the whole persisted
    * corpus: [[matchPairs]](batch, index) — the batch is the only
    * thing decoded this ingest cycle, and the index-side hot-token
    * guard filters against the PERSISTED stats table, so the full
    * per-occurrence token relation is scanned exactly ONCE (the
    * match join itself; plan-gated in ConstellationIndexSpec) —
    * ingest stays O(batch + matched tokens) with no corpus-wide
    * re-aggregation. Self-matches (same id on both sides) are
    * excluded. */
  def matchAgainstIndex(batch: DataFrame, path: String, kind: String,
                        minMatches: Int = 4,
                        maxTokenFreq: Long = 1000L): DataFrame = {
    val spark = batch.sparkSession
    requireKind(spark, path, kind)
    val statsPath = new org.apache.hadoop.fs.Path(s"$path/stats")
    val fs = statsPath.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(statsPath),
      s"no token stats at $path/stats — the index predates the persisted " +
        "hot-token statistics; rebuild it with writeTokenIndex")
    matchPairs(batch, readTokenIndex(spark, path), minMatches, maxTokenFreq,
      bFreq = Some(readTokenStats(spark, path)))
      .where(col("a_id") =!= col("b_id"))
  }

  /** LSM-style small-file compaction after an append schedule — token
    * rows are disjoint facts, so they take the generic value-
    * preserving partitioned rewrite; the stats rows SUM-merge, so
    * they compact to their merged form (read-equivalent, ≤ |distinct
    * tokens| rows). */
  def compactTokenIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String): Unit = {
    Compaction.compactPartitionedDir(spark, s"$path/tokens", Seq("tb"))
    Compaction.compactValueDir(spark, s"$path/stats")(
      readTokenStats(spark, path))
  }
}
