package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** PCA over an embedding column via INTEGER-LATTICE power iteration —
  * a trained linear projection (the classic embedding
  * whitening/compression head) whose whole training trajectory is
  * engine-reproducible, the linear-algebra sibling of the
  * LogisticQuality GD head.
  *
  * Determinism contract: the covariance matrix is quantized once to
  * the 1e-6 decimal lattice and thereafter the ENTIRE power iteration
  * is EXACT integer arithmetic in micro-units — matvec sums of
  * bounded integer products, max-|·| normalization via sign-pinned
  * truncating integer division (`sign(w)·(|w|·10⁶ div max|w|)`) — so
  * every iterate is bit-identical cross-engine by construction, the
  * same exactness argument as the int8 quantized cosine (x71). A
  * first design round-6-pinned each iterate's DOUBLE sums instead and
  * failed cross-engine: sums of lattice-valued products land exactly
  * ON the half-boundary of the next lattice (structurally, not
  * rarely), where Spark-style decimal HALF_UP and DuckDB's
  * binary-double rounding disagree. Integer arithmetic has no
  * boundary to disagree on. The only ROUND(·, 6) pins left are the
  * covariance entries and the final projection sums — both fed by
  * full-precision corpus data, where a half-boundary hit is
  * measure-zero rather than structural (the x81 argument).
  *
  * Scale shape: the fit is ONE partial-aggregable pass over the corpus
  * (buffer = 1 + d + d(d+1)/2 doubles — 2 145 at d = 64; full-matrix
  * stats are for moderate dims, d ≲ 256; past that use a sketch), the
  * power loop is O(iters·d²) driver arithmetic on the collected
  * matrix, and scoring is a zero-shuffle projection against the
  * model's literal arrays.
  */
object EmbeddingOps {

  /** Spark-ROUND-compatible HALF_UP decimal rounding (the pin applied
    * to every order-sensitive double in the fit). */
  def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One-pass moment statistics: buffer [n, Σx (d), Σxxᵀ upper
    * triangle row-major (d(d+1)/2)]. Associative+commutative adds →
    * map-side partial aggregation. */
  class VecStatsAggregator(dim: Int)
      extends Aggregator[Seq[Float], Array[Double], Array[Double]] {
    private val tri = dim * (dim + 1) / 2
    override def zero: Array[Double] = new Array[Double](1 + dim + tri)
    override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
      val x = v.toArray
      require(x.length == dim, s"expected dim $dim, got ${x.length}")
      buf(0) += 1
      var i = 0
      var k = 1 + dim
      while (i < dim) {
        val xi = x(i).toDouble
        buf(1 + i) += xi
        var j = i
        while (j < dim) { buf(k) += xi * x(j); k += 1; j += 1 }
        i += 1
      }
      buf
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Double]): Array[Double] = buf
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** The fitted artifact: MLE mean; `component` is the dominant
    * eigenvector of the lattice covariance in max-norm (its largest
    * |coordinate| is exactly 1.0; every coordinate an exact multiple
    * of 1e-6); `eigenvalue` is the max-norm growth factor of the last
    * iteration (|w|∞ / 10⁶ in lattice units — the dominant
    * eigenvalue estimate under max-normalization). */
  case class PcaModel(n: Long, mean: Array[Double],
                      component: Array[Double], eigenvalue: Double)

  private final val Micro = 1000000L

  /** Fit the top principal component: one aggregation pass → driver
    * integer-lattice power iteration (`iters` rounds, v₀ = 10⁶ in
    * every coordinate; see the determinism contract above). */
  def fitPcaTopComponent(embs: DataFrame, dim: Int, iters: Int = 8,
                         vecCol: String = "embedding"): PcaModel = {
    val agg = udaf(new VecStatsAggregator(dim))
    val row = embs.select(agg(col(vecCol)).as("s"))
      .head.getSeq[Double](0).toArray
    val n = row(0)
    require(n > 0, "empty corpus")
    val mean = Array.tabulate(dim)(i => row(1 + i) / n)
    // covariance on the 1e-6 lattice, held in micro-units (exact ints)
    val c = Array.ofDim[Long](dim, dim)
    var k = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = Math.round(round6(row(k) / n - mean(i) * mean(j)) * Micro)
        c(i)(j) = v; c(j)(i) = v
        k += 1; j += 1
      }
      i += 1
    }
    var v = Array.fill(dim)(BigInt(Micro))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { i =>
        var s = BigInt(0)
        var j = 0
        while (j < dim) { s += BigInt(c(i)(j)) * v(j); j += 1 }
        s
      }
      val m = w.map(_.abs).max
      require(m > 0, "power iteration collapsed to the zero vector")
      lambda = m.toDouble / (Micro.toDouble * Micro.toDouble)
      v = w.map(wi => wi.sign * (wi.abs * Micro / m)) // truncating div
      it += 1
    }
    PcaModel(n.toLong, mean, v.map(_.toDouble / Micro), lambda)
  }

  /** Matryoshka-style truncation (Kusupati et al. 2022, MRL): keep
    * the first `dims` coordinates and L2-renormalize — the
    * dimension/eighth-the-storage lever for embeddings trained with
    * matryoshka losses (and the standard cheap approximation
    * otherwise). Zero-vector prefixes renormalize to zero vectors
    * (not NaN). Map-only; cosine over the truncated vectors is the
    * certified downstream (x99). The norm is one sqrt over a
    * left-to-right fold — deterministic given the float inputs. */
  def truncateNormalize(embs: DataFrame, dims: Int,
                        vecCol: String = "embedding",
                        outCol: String = "embedding_t"): DataFrame = {
    require(dims > 0, s"dims must be positive: $dims")
    val sliced = slice(col(vecCol), 1, dims)
    val trunc = graft.operators.TextOps.bindOnce(
      transform(sliced, x => x.cast("double"))) { t =>
      graft.operators.TextOps.bindOnce(
        sqrt(aggregate(t, lit(0.0), (a, x) => a + x * x))) { n =>
        when(n === 0.0, t).otherwise(transform(t, x => x / n))
      }
    }
    embs.withColumn(outCol, trunc)
  }

  /** Score the corpus on the fitted component: pc1 = round6(Σⱼ (xⱼ −
    * μⱼ)·vⱼ) — a ZERO-shuffle projection (model arrays ride as
    * literals), streams unchanged. */
  def projectPc1(embs: DataFrame, model: PcaModel,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val centered = zip_with(col(vecCol), lit(model.mean), (x, m) => x - m)
    val dot = aggregate(
      zip_with(centered, lit(model.component), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    embs.select(col(idCol), round(dot, 6).as("pc1"))
  }
}
