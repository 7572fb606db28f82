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
                 maxTokenFreq: Long = 1000L): DataFrame = {
    require(minMatches >= 1, "minMatches must be >= 1")
    def rare(df: DataFrame): DataFrame = {
      val freq = df.groupBy("token")
        .agg(countDistinct("media_id").as("tf"))
        .where(col("tf") > maxTokenFreq)
      df.join(freq, Seq("token"), "left_anti")
    }
    val al = rare(a).select(col("media_id").as("a_id"), col("t").as("a_t"),
      col("token"))
    val bl = rare(b).select(col("media_id").as("b_id"), col("t").as("b_t"),
      col("token"))
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
  //   meta/    (kind, n_buckets) — `kind` names the tokenizer
  //            geometry (e.g. "audio_dft32_v1", "video_dhash_pair");
  //            appends and matches must present the same kind, or
  //            tokens from different geometries would silently mix
  // ---------------------------------------------------------------

  private def bucketed(tokens: DataFrame, nBuckets: Int): DataFrame =
    tokens.select(col("media_id"), col("t"), col("token"),
      pmod(hash(col("token")), lit(nBuckets)).as("tb"))

  /** Build the at-rest index from a (media_id, t, token) relation. */
  def writeTokenIndex(tokens: DataFrame, path: String, kind: String,
                      nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(kind.nonEmpty, "kind must name the tokenizer geometry")
    val spark = tokens.sparkSession
    import spark.implicits._
    bucketed(tokens, nBuckets)
      .write.partitionBy("tb").mode("overwrite").parquet(s"$path/tokens")
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

  /** Append a batch's tokens — O(batch), existing tokens never read;
    * rows are disjoint facts (not merged), so a replayed batch would
    * inflate n_matches for its media: the `doneMarker` gate carries
    * the same weight as on the Count-Min artifact. */
  def appendToTokenIndex(batch: DataFrame, path: String, kind: String,
                         doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val marker = doneMarker.map { mk =>
      require(mk.matches("[A-Za-z0-9._-]+"), s"invalid marker id: $mk")
      new org.apache.hadoop.fs.Path(path, s"_append_${mk}_ok")
    }
    def fs(p0: org.apache.hadoop.fs.Path) =
      p0.getFileSystem(spark.sessionState.newHadoopConf())
    if (marker.exists(m => fs(m).exists(m))) return
    val nb = requireKind(spark, path, kind)
    bucketed(batch, nb)
      .write.partitionBy("tb").mode("append").parquet(s"$path/tokens")
    marker.foreach(m => fs(m).create(m, true).close())
  }

  /** All persisted tokens (media_id, t, token). */
  def readTokenIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame =
    spark.read.parquet(s"$path/tokens").select("media_id", "t", "token")

  /** Match one fingerprinted batch against the whole persisted
    * corpus: [[matchPairs]](batch, index) — the batch is the only
    * thing decoded this ingest cycle. Self-matches (same id on both
    * sides) are excluded. */
  def matchAgainstIndex(batch: DataFrame, path: String, kind: String,
                        minMatches: Int = 4,
                        maxTokenFreq: Long = 1000L): DataFrame = {
    val spark = batch.sparkSession
    requireKind(spark, path, kind)
    matchPairs(batch, readTokenIndex(spark, path), minMatches, maxTokenFreq)
      .where(col("a_id") =!= col("b_id"))
  }

  /** LSM-style small-file compaction after an append schedule — rows
    * are disjoint facts, so this is the generic value-preserving
    * partitioned rewrite. */
  def compactTokenIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String): Unit =
    Compaction.compactPartitionedDir(spark, s"$path/tokens", Seq("tb"))
}
