package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction — corpus-level term weighting as two
  * aggregations and a join:
  *   tf(d, w)  = count of w in d,
  *   idf(w)    = ln((N + 1) / (df(w) + 1)) + 1   (smoothed),
  *   score     = tf · idf, top-k per document by rank.
  * At scale: one shuffle for tf, one for df (both partial-aggregated),
  * one broadcast-able join on the word dimension.
  */
object TfIdf {

  /** (id, word, tf) term frequencies, lowercased whitespace tokens. */
  def termFrequencies(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("tf"))

  /** (word, idf) with smoothed inverse document frequency. `tf` rows
    * are (id, word)-unique by construction, so df is a plain COUNT —
    * no countDistinct expansion pass. */
  def inverseDocFrequencies(tf: DataFrame, nDocs: Long,
                            idCol: String = "doc_id"): DataFrame =
    tf.groupBy("word")
      .agg(count(lit(1)).as("df"))
      .withColumn("idf",
        log((lit(nDocs.toDouble) + 1.0) / (col("df") + lit(1.0))) + 1.0)

  /** Top-k keywords per document by tf·idf (deterministic tie-break on
    * the word).
    *
    * The corpus size is a separate eager `count()` — parquet answers
    * it from row-group metadata (aggregate pushdown), and inlining it
    * as a literal keeps the idf subtree a plain two-stage aggregate.
    * (Measured: threading N through a broadcast single-row aggregate
    * serializes the plan into extra blocking stages and is slower.)
    */
  def topKeywords(docs: DataFrame, k: Int, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val idf = inverseDocFrequencies(tf, docs.count(), idCol)
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("word"))
    // no broadcast hint on the idf side: a hinted BROADCAST of a
    // COMPUTED subtree forces the whole tf→df aggregation through the
    // driver's broadcast-exchange thread ahead of the main stages
    // (measured ~4s of serial first-run work at sf0.1); AQE converts
    // the shuffle join to broadcast at runtime when the word dim is
    // small, and keeps the shuffle when it isn't — which is also the
    // right call when the vocabulary is web-scale.
    tf.join(idf.select("word", "idf"), "word")
      .withColumn("score", col("tf") * col("idf"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("word"), col("score"))
  }
}
