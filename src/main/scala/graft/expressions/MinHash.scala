package graft.expressions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash / shingle kernels as native codegen'd Catalyst
  * expressions.
  *
  * The relational formulation (explode word n-grams → md5 → groupBy id
  * with numPerm MIN aggregates; `operators.Dedup.shingles/
  * minhashSignatures`) is the semantic reference and what the DuckDB
  * oracle mirrors. These expressions compute the SAME values in a
  * single pass over each document — no shingle-row explosion, no
  * shuffle: signature extraction becomes a map-only scan, which is the
  * plan you want when the documents table is 100 TB (the only shuffle
  * left in MinHash+LSH dedup is the tiny band-bucket join).
  *
  * Value contract (must stay bit-identical to the relational path):
  *  - words  = split(trim(text), "\\s+")  — trim removes ' ' only
  *    (Spark semantics), split keeps trailing empties (limit -1);
  *  - shingles = word n-grams joined by single spaces; a document with
  *    fewer than n words contributes ONE shingle = all words joined;
  *  - shingle hash h = first 7 hex chars of md5(shingle) = top 28 bits
  *    of the digest (`Dedup.md5Long31`);
  *  - signature(i) = min over shingles of (aᵢ·h + bᵢ) mod (2³¹−1) with
  *    md5-derived constants (`MinHashOps.permutationConstants`);
  *  - set hashes (for Jaccard) = top 60 bits of md5(shingle)
  *    (`Dedup.md5Long`, 15 hex chars), distinct, ascending.
  */
object MinHashOps {

  val MinhashPrime = 2147483647L // 2^31 - 1

  private val Ws = Pattern.compile("\\s+")

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Deterministic (aᵢ odd, bᵢ), md5-derived — engine-portable; same
    * derivation as the round-1 relational path. */
  def permutationConstants(numPerm: Int): Array[(Long, Long)] = {
    def h(s: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
      val hex = d.take(7).map("%02x".format(_)).mkString // 28 bits
      java.lang.Long.parseLong(hex, 16)
    }
    Array.tabulate(numPerm)(i => ((h(s"graft_minhash_a_$i") % MinhashPrime) | 1L,
                                   h(s"graft_minhash_b_$i") % MinhashPrime))
  }

  private val MaxPerm = 64
  private lazy val constA: Array[Long] = permutationConstants(MaxPerm).map(_._1)
  private lazy val constB: Array[Long] = permutationConstants(MaxPerm).map(_._2)

  /** Spark `trim`: strips leading/trailing 0x20 ONLY (not \t\n\r). */
  private def trimSpaces(s: String): String = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi)
  }

  /** Words of trim(text) split on \s+ with limit -1, pre-encoded. */
  private def wordBytes(text: UTF8String): Array[Array[Byte]] =
    Ws.split(trimSpaces(text.toString), -1).map(_.getBytes(UTF_8))

  private def digestShingle(md: MessageDigest, words: Array[Array[Byte]],
                            from: Int, until: Int): Array[Byte] = {
    md.reset()
    var j = from
    while (j < until) {
      if (j > from) md.update(' '.toByte)
      md.update(words(j))
      j += 1
    }
    md.digest()
  }

  /** Top 28 bits of an md5 digest = first 7 hex chars as a long. */
  private def top28(d: Array[Byte]): Long =
    (((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4))

  /** Top 60 bits of an md5 digest = first 15 hex chars as a long. */
  private def top60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** MinHash signature of `text` under the first `numPerm` md5-derived
    * permutations, word n-gram shingles. */
  def signature(text: UTF8String, n: Int, numPerm: Int): ArrayData = {
    val words = wordBytes(text)
    val md = digests.get()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    val nShingles = if (words.length < n) 1 else words.length - n + 1
    val span = math.min(n, words.length)
    var i = 0
    while (i < nShingles) {
      val until = if (words.length < n) words.length else i + span
      val h = top28(digestShingle(md, words, i, until))
      var p = 0
      while (p < numPerm) {
        val v = (constA(p) * h + constB(p)) % MinhashPrime
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct 60-bit shingle hashes, ascending — the document's
    * shingle SET, for exact Jaccard over candidate pairs. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val words = wordBytes(text)
    val md = digests.get()
    val nShingles = if (words.length < n) 1 else words.length - n + 1
    val span = math.min(n, words.length)
    val hs = new Array[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      val until = if (words.length < n) words.length else i + span
      hs(i) = top60(digestShingle(md, words, i, until))
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < hs.length) { // in-place dedup of the sorted array
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken) in one pass:
    * normalize to lowercase [a-z0-9 ] (ASCII by construction), hash
    * every char k-gram (top 28 bits of md5), keep the min of each
    * window of w consecutive gram hashes (all gram hashes when the
    * doc has fewer than w grams), distinct, ascending. Returns an
    * EMPTY array when the normalized text has no k-gram — callers
    * filter those docs like the relational form's `__n >= 1` guard.
    * Bit-identical to `TextOps.winnowingFingerprints`. */
  def winnowingFps(text: UTF8String, k: Int, w: Int): ArrayData = {
    val lowered = text.toLowerCase.toString
    val sb = new java.lang.StringBuilder(lowered.length)
    var ci = 0
    while (ci < lowered.length) {
      val c = lowered.charAt(ci)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ') sb.append(c)
      ci += 1
    }
    val n = sb.length - (k - 1)
    if (n < 1) return new GenericArrayData(Array.emptyLongArray)
    val bytes = new Array[Byte](sb.length)
    var bi = 0
    while (bi < sb.length) { bytes(bi) = sb.charAt(bi).toByte; bi += 1 }
    val md = digests.get()
    val gh = new Array[Long](n)
    var g = 0
    while (g < n) {
      md.reset()
      md.update(bytes, g, k)
      gh(g) = top28(md.digest())
      g += 1
    }
    val fps =
      if (n < w) gh
      else {
        val out = new Array[Long](n - w + 1)
        var i = 0
        while (i <= n - w) {
          var m = gh(i)
          var j = i + 1
          while (j < i + w) { if (gh(j) < m) m = gh(j); j += 1 }
          out(i) = m
          i += 1
        }
        out
      }
    java.util.Arrays.sort(fps)
    var wp = 0
    var rp = 0
    while (rp < fps.length) {
      if (wp == 0 || fps(rp) != fps(wp - 1)) { fps(wp) = fps(rp); wp += 1 }
      rp += 1
    }
    new GenericArrayData(if (wp == fps.length) fps else java.util.Arrays.copyOf(fps, wp))
  }

  /** Per-position salted 60-bit word-k-gram hashes — the span-dedup
    * gram kernel (TextOps.exactSpanDedup salt "ss_",
    * Dedup.decontaminateSpans salt "sd_"): words = the non-empty
    * tokens of `split(trim(text), "\\s+")`, each lowercased
    * (UTF8String.toLowerCase — exactly Spark's `lower`, including the
    * context-sensitive Unicode cases); element i = top 60 bits of
    * md5(salt + words[i..i+k) joined by single spaces), one element
    * per gram start (empty array when the document has fewer than k
    * words — the relational form's `size(ws) >= k` gate). Bit- and
    * position-identical to the relational
    * `posexplode(transform(sequence(1, n-k+1),
    *   i -> conv(substring(md5(concat(salt, array_join(slice(ws, i,
    *   k), ' '))), 1, 15), 16, 10)))`
    * chain it replaces (SpanHashKernelSpec pins it): that chain paid a
    * per-gram array slice + string join + hex digest + hex-string
    * parse, where this is one pass over pre-encoded word bytes. */
  def saltedSpanHashes(text: UTF8String, k: Int, salt: UTF8String): ArrayData = {
    val raw = Ws.split(trimSpaces(text.toString), -1)
    var nw = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nw += 1; i += 1 }
    val n = nw - k + 1
    if (n < 1) return new GenericArrayData(Array.emptyLongArray)
    val words = new Array[Array[Byte]](nw)
    i = 0
    var w = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) {
        words(w) = UTF8String.fromString(raw(i)).toLowerCase.getBytes
        w += 1
      }
      i += 1
    }
    val saltBytes = salt.getBytes
    val md = digests.get()
    val hs = new Array[Long](n)
    i = 0
    while (i < n) {
      md.reset()
      md.update(saltBytes)
      var j = i
      while (j < i + k) {
        if (j > i) md.update(' '.toByte)
        md.update(words(j))
        j += 1
      }
      hs(i) = top60(md.digest())
      i += 1
    }
    new GenericArrayData(hs)
  }

  /** |A ∩ B| for two ascending-sorted long arrays (two-pointer merge). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    var i = 0
    var j = 0
    var c = 0L
    val na = a.numElements()
    val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

private[expressions] trait TextKernelExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${child.dataType.simpleString}")
}

/** minhash_signature(text, n, numPerm) → array<long>[numPerm]. */
case class MinHashSignature(child: Expression, n: Int, numPerm: Int)
    extends TextKernelExpr {
  require(n >= 1 && numPerm >= 1 && numPerm <= 64)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.signature(input.asInstanceOf[UTF8String], n, numPerm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashOps$$.MODULE$$.signature($c, $n, $numPerm)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** shingle_hashes(text, n) → sorted distinct array<long> (60-bit). */
case class ShingleHashes(child: Expression, n: Int) extends TextKernelExpr {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashOps$$.MODULE$$.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** winnowing_fps(text, k, w) → sorted distinct array<long> (28-bit). */
case class WinnowingFps(child: Expression, k: Int, w: Int) extends TextKernelExpr {
  require(k >= 1 && w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.winnowingFps(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashOps$$.MODULE$$.winnowingFps($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowingFps =
    copy(child = newChild)
}

/** span_gram_hashes(text, k, salt) → array<long>[n-k+1] (60-bit,
  * positional — element i is gram start i). */
case class SpanGramHashes(child: Expression, k: Int, salt: String)
    extends TextKernelExpr {
  require(k >= 1)
  private val saltU = UTF8String.fromString(salt)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.saltedSpanHashes(input.asInstanceOf[UTF8String], k, saltU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("spanSalt", saltU,
      classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashOps$$.MODULE$$.saltedSpanHashes($c, $k, $saltRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): SpanGramHashes =
    copy(child = newChild)
}

/** sorted_intersect_count(a, b) over ascending long arrays → long. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    MinHashOps.sortedIntersectCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.MinHashOps$$.MODULE$$.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
