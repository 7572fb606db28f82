package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The MAP-ONLY langid scorer (the x75 `importanceWeightsMapOnly`
  * pattern, applied to the multiclass NB head of
  * [[graft.operators.LangId]]).
  *
  * The trained model is bounded at numBuckets·L log-likelihood doubles
  * plus L priors — broadcastable at any corpus size — so scoring does
  * not need the terms×L model JOIN of the reference path: it is ONE
  * projection evaluating this kernel over each document's NORMALIZED
  * text (normalization stays the certified Spark expression chain).
  *
  * The kernel owns trigram extraction and the salted-md5 bucket hash,
  * NOT per-gram Spark expressions: the expression-chain formulation
  * (md5 → hex string → substring → conv → cast per gram) measured
  * 3.7 µs/gram — 5.4 s for the sf0.1 corpus on its single-row-group
  * scan — where a thread-local digest over the UTF-8 byte window
  * (the x40 CountMin fix, bit-identical by construction: the first 7
  * hex digits of md5 ARE the top 28 bits of its first 4 bytes) pays
  * ~0.2 µs. Windows are CODEPOINT-aligned byte slices, matching
  * Spark `substr` semantics on UTF8String.
  *
  * Per-language score = round6(prior + Σ_f m_f · llr_lang(f)) with
  * the multiplicity sum over DISTINCT features in ascending feature
  * order (deterministic; the join path's shuffle order differs, and
  * round-6 is the established absorber — the same policy that
  * certifies the join path against DuckDB's own sum order); argmax
  * ties resolve to the binary-larger language code, `max(struct)`'s
  * rule. Fewer than n codepoints → (null, null, 0).
  */
object LangIdScoreOps {

  /** Dense per-language model: `llr(l)(f)` = ln((c(f,l)+k)/(t_l+k·D))
    * over ALL f (unseen buckets hold the smoothing floor), `priors(l)`
    * = ln(n_docs_l / Σ n_docs). `langs` sorted ascending. */
  final case class Model(langs: Array[String], priors: Array[Double],
                         llr: Array[Array[Double]]) extends Serializable {
    require(langs.length == priors.length && langs.length == llr.length)
    require(llr.nonEmpty && llr.forall(_.length == llr.head.length),
      "ragged llr table")
    /** The training bucket count — scoring MUST hash mod this. */
    def numBuckets: Int = llr.head.length
    // UTF8String byte order = Spark's string comparison in max(struct)
    @transient lazy val langsU8: Array[UTF8String] =
      langs.map(UTF8String.fromString)
  }

  private val SaltBytes = "lid_".getBytes("UTF-8")
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Trigram-hash + score one normalized document. `numBuckets` must
    * match the model's training bucketing. */
  def scoreNormText(norm: UTF8String, n: Int, numBuckets: Int,
                    model: Model): InternalRow = {
    val bytes = norm.getBytes
    // codepoint start offsets (UTF-8 lead-byte scan) + end sentinel
    var cp = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) cp += 1
      i += 1
    }
    if (cp < n) return InternalRow(null, null, 0L)
    val offs = new Array[Int](cp + 1)
    var k = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(k) = i; k += 1 }
      i += 1
    }
    offs(k) = bytes.length
    val nGrams = cp - (n - 1)
    val fs = new Array[Long](nGrams)
    val md = digests.get()
    val out = new Array[Byte](16)
    var g = 0
    while (g < nGrams) {
      md.reset()
      md.update(SaltBytes)
      md.update(bytes, offs(g), offs(g + n) - offs(g))
      md.digest(out, 0, 16)
      // first 7 hex digits of the md5 = top 28 bits of bytes 0..3 —
      // identical to conv(substring(md5_hex, 1, 7), 16, 10)
      fs(g) = ((((out(0) & 0xFFL) << 20) | ((out(1) & 0xFFL) << 12) |
        ((out(2) & 0xFFL) << 4) | ((out(3) & 0xFFL) >>> 4))
        % numBuckets)
      g += 1
    }
    scoreFeatures(fs, model)
  }

  private def scoreFeatures(fs: Array[Long], model: Model): InternalRow = {
    val n = fs.length
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

  /** Most models a driver keeps registered at once. A long-lived
    * driver that retrains per micro-batch holds at most this many
    * numBuckets·L tables; older ones evict LRU. NOTE the lifecycle:
    * `resolve` runs at ANALYSIS time only (the function builder turns
    * the key literal into the Model object, which then rides inside
    * the expression) — a running plan never touches the registry
    * again, so eviction can only affect a NEW analysis that
    * references an old key string (e.g. SQL text or a view built >64
    * registrations ago); such callers re-register and re-derive the
    * key. */
  val MaxRegisteredModels = 64
  // access-order LinkedHashMap = LRU; guarded by its own monitor
  private val registry =
    new java.util.LinkedHashMap[String, Model](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Model]): Boolean =
        size() > MaxRegisteredModels
    }
  // identity fast-path in FRONT of the content hash: re-registering
  // the SAME instance (a driver caching its trained model) must stay
  // O(1), not re-hash numBuckets·L doubles per micro-batch. Weak keys
  // (Model equality over Array fields is reference equality) so the
  // map never outlives the models it indexes.
  private val byInstance = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Model, String]())
  /** Keyed by a CONTENT hash, not instance identity: a driver that
    * retrains per micro-batch on stationary data re-derives the same
    * table and reuses one entry instead of leaking a numBuckets·L
    * copy per retrain; genuinely-new models rotate through the
    * bounded LRU above. Same-instance re-registration short-circuits
    * through the identity map (refreshing LRU recency). */
  def register(m: Model): String = {
    val cached = byInstance.get(m)
    if (cached != null) {
      registry.synchronized { registry.put(cached, m) } // refresh recency
      return cached
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(8)
    def putD(d: Double): Unit = {
      bb.clear(); bb.putDouble(d); md.update(bb.array())
    }
    m.langs.foreach { l => md.update(l.getBytes("UTF-8")); md.update(0: Byte) }
    m.priors.foreach(putD)
    m.llr.foreach(_.foreach(putD))
    val key = "mem:lid:" + md.digest().map("%02x".format(_)).mkString
    registry.synchronized { registry.put(key, m) }
    byInstance.put(m, key)
    key
  }
  def resolve(key: String): Model = registry.synchronized {
    val m = registry.get(key)
    require(m != null, s"no langid model registered under '$key' — " +
      s"never registered, unregistered, or evicted after " +
      s"$MaxRegisteredModels newer registrations; re-register the model " +
      "(resolve runs at analysis time only, so this can only affect a " +
      "NEW analysis referencing an old key string)")
    m
  }
  /** Drop a model eagerly (e.g. a micro-batch driver that knows the
    * retrain superseded it) instead of waiting for LRU eviction. */
  def unregister(key: String): Unit =
    registry.synchronized { registry.remove(key) }
}

/** langid_score_text(normalized_text, model-key-literal, n, numBuckets)
  * → struct<lang_pred, lid_score, n_grams>. */
case class LangIdScoreText(child: Expression, model: LangIdScoreOps.Model,
                           n: Int, numBuckets: Int)
    extends UnaryExpression {
  require(n >= 1 && numBuckets >= 1)
  require(model.numBuckets == numBuckets,
    s"model trained with ${model.numBuckets} buckets, scoring with " +
      s"$numBuckets — silently-wrong buckets (or an out-of-range " +
      "lookup); pass the training numBuckets")
  override def dataType: DataType = StructType(Seq(
    StructField("lang_pred", StringType, nullable = true),
    StructField("lid_score", DoubleType, nullable = true),
    StructField("n_grams", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"langid_score_text expects a string input, got ${t.simpleString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    LangIdScoreOps.scoreNormText(input.asInstanceOf[UTF8String], n,
      numBuckets, model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("lidModel", model,
      "graft.expressions.LangIdScoreOps.Model")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LangIdScoreOps$$.MODULE$$.scoreNormText($c, $n, $numBuckets, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): LangIdScoreText =
    copy(child = newChild)
}
