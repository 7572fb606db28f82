package graft.operators

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Certification probe for the PCA power-iteration head (x85): the
  * oracle re-derives the ENTIRE fit in SQL — per-index moments, the
  * round-6-lattice covariance, all power-iteration rounds CTE-for-CTE
  * (matvec, norm, renormalize), and the centered projection — so the
  * hash compare certifies the trained component AND the scoring pass,
  * the linear-algebra analogue of the x81 GD-trajectory oracle.
  */
object EmbeddingProbes {

  /** The integer-lattice power iteration unrolled as SQL: the
    * covariance lands on the 1e-6 lattice (the ONE data-fed round
    * pin) as exact BIGINT micro-units, each iteration is pure integer
    * arithmetic (HUGEINT matvec sums, max-|·| normalization via
    * sign-pinned truncating division — `//` on the made-positive
    * operand, since DuckDB floors and the driver truncates), and the
    * projection re-derives the component as v/10⁶ doubles. */
  private def pcaSql(dim: Int, iters: Int): String = {
    val iterCtes = (1 to iters).map { t =>
      s"""v$t AS (
         |  SELECT i, CASE WHEN w < 0 THEN -((ABS(w) * 1000000) // m)
         |                 ELSE (w * 1000000) // m END AS v FROM (
         |    SELECT i, w, MAX(ABS(w)) OVER () AS m FROM (
         |      SELECT c.i AS i, SUM(c.ci * p.v) AS w
         |      FROM cov c JOIN v${t - 1} p ON p.i = c.j GROUP BY c.i)))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, g.i - 1 AS i, CAST(embedding[g.i] AS DOUBLE) AS x
       |  FROM embeddings, (SELECT unnest(generate_series(1, $dim)) AS i) g),
       |nn AS (SELECT COUNT(*) AS n FROM embeddings),
       |mu AS (SELECT i, SUM(x) / (SELECT n FROM nn) AS m FROM e GROUP BY i),
       |cov AS (
       |  SELECT a.i AS i, b.i AS j,
       |    CAST(ROUND(SUM(a.x * b.x) / (SELECT n FROM nn) - ma.m * mb.m, 6)
       |         * 1000000 AS BIGINT) AS ci
       |  FROM e a JOIN e b ON a.vec_id = b.vec_id
       |  JOIN mu ma ON ma.i = a.i JOIN mu mb ON mb.i = b.i
       |  GROUP BY a.i, b.i, ma.m, mb.m),
       |v0 AS (SELECT g.i - 1 AS i, CAST(1000000 AS HUGEINT) AS v
       |       FROM (SELECT unnest(generate_series(1, $dim)) AS i) g),
       |$iterCtes
       |SELECT e.vec_id,
       |  ROUND(SUM((e.x - mu.m) * (CAST(vz.v AS DOUBLE) / 1000000)), 6) AS pc1
       |FROM e JOIN mu ON mu.i = e.i JOIN v$iters vz ON vz.i = e.i
       |GROUP BY e.vec_id ORDER BY e.vec_id""".stripMargin
  }

  val probes: Seq[Probe] = Seq(

    // EmbeddingOps.fitPcaTopComponent + projectPc1: one moment
    // aggregation → 8 driver power-iteration rounds → zero-shuffle
    // centered projection --------------------------------------------
    Probe("x85_pca_project",
      (s, d) => {
        val embs = Tables.embeddings(s, d)
        val model = EmbeddingOps.fitPcaTopComponent(embs, dim = 64, iters = 8)
        EmbeddingOps.projectPc1(embs, model).orderBy("vec_id")
      },
      Some(pcaSql(64, 8))),

    // EmbeddingOps.truncateNormalize + cosine top-k over the
    // truncated space: the Matryoshka storage lever (keep 16 of 64
    // dims, renormalize) with the q27 cosine machinery on top — the
    // oracle re-derives slice, double-cast, L2 normalization with the
    // zero-vector guard, and the rounded dot-product ranking --------
    Probe("x99_matryoshka_topk",
      (s, d) => {
        val t = EmbeddingOps.truncateNormalize(
          Tables.embeddings(s, d), dims = 16)
        val q = t.where(col("vec_id") === 0)
          .select(col("embedding_t").as("q"))
        t.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(aggregate(
              zip_with(col("embedding_t"), col("q"), (a, b) => a * b),
              lit(0.0), (acc, x) => acc + x), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id")).limit(10)
      },
      Some("""WITH tn AS (
             |  SELECT vec_id,
             |    list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS t
             |  FROM embeddings),
             |n AS (SELECT vec_id, t,
             |        SQRT(list_dot_product(t, t)) AS nm FROM tn),
             |u AS (SELECT vec_id,
             |        CASE WHEN nm = 0 THEN t
             |             ELSE list_transform(t, x -> x / nm) END AS u
             |      FROM n),
             |q AS (SELECT u AS q FROM u WHERE vec_id = 0)
             |SELECT vec_id, ROUND(list_dot_product(u.u, q.q), 6) AS sim
             |FROM u, q WHERE vec_id <> 0
             |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin)),
  )
}
