package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the vectors into `nlist` cells; a query scans
  * only the `nprobe` nearest cells. The third similarity path next to
  * brute force (exact) and hyperplane LSH:
  *
  *   - build: one KMeans fit (seeded, deterministic) + one assign pass,
  *     output persisted as an ordinary (cell, vec_id, embedding) table
  *     — at 100 TB this is the partitioning/bucketing column, so a
  *     query touches nprobe/nlist of the data.
  *   - query: rank cells by centroid distance, brute-force rerank
  *     within the selected cells.
  */
object IvfIndex {

  private val toVec = udf((a: Seq[Float]) =>
    Vectors.dense(a.map(_.toDouble).toArray))

  /** Fit the coarse quantizer and assign every vector to its cell. */
  def build(embs: DataFrame, nlist: Int, seed: Long = 42,
            idCol: String = "vec_id", vecCol: String = "embedding"):
      (KMeansModel, DataFrame) = {
    val featured = embs.withColumn("features", toVec(col(vecCol)))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(featured)
    val assigned = model.transform(featured)
      .select(col(idCol), col(vecCol), col("cell"))
    (model, assigned)
  }

  /** Approximate top-k by cosine for one query id: probe the nprobe
    * cells nearest (by euclidean centroid distance) to the query's
    * vector, exact-rerank inside them. */
  def topK(model: KMeansModel, assigned: DataFrame, queryId: Long,
           k: Int, nprobe: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val qRow = assigned.where(col(idCol) === queryId)
      .select(vecCol).head().getSeq[Float](0)
    val qVec = Vectors.dense(qRow.map(_.toDouble).toArray)
    val cells = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, Vectors.sqdist(c, qVec)) }
      .sortBy(_._2).take(nprobe).map(_._1)
    val target = assigned.where(col(idCol) === queryId)
      .select(col(vecCol).as("q"))
    assigned
      .where(col("cell").isin(cells.toSeq: _*) && col(idCol) =!= queryId)
      .crossJoin(broadcast(target))
      .withColumn("sim", Similarity.cosine(col(vecCol), col("q")))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
