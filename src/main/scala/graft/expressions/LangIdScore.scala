package graft.expressions

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The MAP-ONLY langid scorer (the x75 `importanceWeightsMapOnly`
  * pattern, applied to the multiclass NB head of
  * [[graft.operators.LangId]]).
  *
  * The trained model is bounded at numBuckets·L log-likelihood doubles
  * plus L priors — broadcastable at any corpus size — so scoring does
  * not need the terms×L model JOIN of the reference path (distinct
  * (doc, feature) rows fanned out × languages through a shuffle): it
  * is ONE projection evaluating this kernel over each document's
  * hashed-trigram array. Semantics are pinned to `LangId.predict`:
  * per-language score = round6(prior + Σ_f m_f · llr_lang(f)) with the
  * multiplicity sum over DISTINCT features in ascending feature order
  * (a deterministic order; the join path's shuffle order differs, and
  * round-6 is the established absorber — the same policy that
  * certifies the join path against DuckDB's own sum order); argmax
  * ties resolve to the binary-larger language code, `max(struct)`'s
  * rule. No features → (null, null, 0).
  */
object LangIdScoreOps {

  /** Dense per-language model: `llr(l)(f)` = ln((c(f,l)+k)/(t_l+k·D))
    * over ALL f (unseen buckets hold the smoothing floor), `priors(l)`
    * = ln(n_docs_l / Σ n_docs). `langs` sorted ascending. */
  final case class Model(langs: Array[String], priors: Array[Double],
                         llr: Array[Array[Double]]) extends Serializable {
    require(langs.length == priors.length && langs.length == llr.length)
    // UTF8String byte order = Spark's string comparison in max(struct)
    @transient lazy val langsU8: Array[UTF8String] =
      langs.map(UTF8String.fromString)
  }

  def score(feats: ArrayData, model: Model): InternalRow = {
    val n = feats.numElements()
    if (n == 0) return InternalRow(null, null, 0L)
    val fs = new Array[Long](n)
    var i = 0
    while (i < n) { fs(i) = feats.getLong(i); i += 1 }
    java.util.Arrays.sort(fs)
    val L = model.langs.length
    var bestIdx = -1
    var bestScore = 0.0
    var l = 0
    while (l < L) {
      val tab = model.llr(l)
      // Σ over distinct features ascending of m · llr — runs of the
      // sorted array give the multiplicities without a hash map
      var ll = 0.0
      var j = 0
      while (j < n) {
        val f = fs(j)
        var m = 1
        while (j + m < n && fs(j + m) == f) m += 1
        ll += m * tab(f.toInt)
        j += m
      }
      val s = graft.operators.EmbeddingOps.round6(model.priors(l) + ll)
      if (bestIdx < 0 || s > bestScore ||
        (s == bestScore &&
          model.langsU8(l).compareTo(model.langsU8(bestIdx)) > 0)) {
        bestIdx = l; bestScore = s
      }
      l += 1
    }
    InternalRow(model.langsU8(bestIdx), bestScore, n.toLong)
  }

  private val registry = new ConcurrentHashMap[String, Model]()
  private val nextId = new AtomicInteger(0)
  def register(m: Model): String = {
    val key = s"mem:lid:${nextId.incrementAndGet()}"
    registry.put(key, m)
    key
  }
  def resolve(key: String): Model = {
    val m = registry.get(key)
    require(m != null, s"no langid model registered under '$key'")
    m
  }
}

/** langid_scores(features, model-key-literal) →
  * struct<lang_pred, lid_score, n_grams>. */
case class LangIdScores(child: Expression, model: LangIdScoreOps.Model)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lang_pred", StringType, nullable = true),
    StructField("lid_score", DoubleType, nullable = true),
    StructField("n_grams", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"langid_scores expects array<bigint> features, got ${t.simpleString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    LangIdScoreOps.score(input.asInstanceOf[ArrayData], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("lidModel", model,
      "graft.expressions.LangIdScoreOps.Model")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LangIdScoreOps$$.MODULE$$.score($c, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): LangIdScores =
    copy(child = newChild)
}
