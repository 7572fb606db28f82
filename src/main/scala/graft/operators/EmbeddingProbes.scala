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
  )
}
