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
}
