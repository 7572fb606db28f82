package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution signals in ONE map-only pass — the
  * compressibility/garbledness tells of corpus curation: LOW entropy
  * marks template/repeated-character boilerplate ("aaaa…", ASCII-art
  * separators), HIGH entropy marks binary-ish or encrypted junk that
  * slipped past format filters, and a high top-character fraction is
  * the directest repeated-filler signal (the CCNet-family cheap
  * prefilter next to [[WordCounts]]' repetition ratios, which need
  * word structure this kernel does not assume — it works on CJK and
  * no-whitespace scripts too).
  *
  * Semantics (engine-mirrorable, certified by the x102 oracle):
  * counts are per CODEPOINT; entropy = round6(−Σ (c/n)·ln(c/n)) with
  * the sum accumulated in ascending-codepoint order (deterministic;
  * DuckDB's own sum order differs and round-6 absorbs it — the
  * established policy); top_char_frac = round6(max c / n). Empty text
  * → (0.0, 0.0, 0, 0). Null → null struct.
  */
object CharEntropyOps {
  def signals(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0) return InternalRow(0.0, 0.0, 0, 0L)
    var h = 0.0
    var mx = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      val p = c.toDouble / n
      h -= p * math.log(p)
      if (c > mx) mx = c
    }
    InternalRow(
      graft.operators.EmbeddingOps.round6(h),
      graft.operators.EmbeddingOps.round6(mx.toDouble / n),
      counts.size(), n)
  }
}

/** char_entropy(text) →
  * struct<entropy, top_char_frac, n_distinct_chars, n_chars>. */
case class CharEntropy(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("entropy", DoubleType, nullable = false),
    StructField("top_char_frac", DoubleType, nullable = false),
    StructField("n_distinct_chars", IntegerType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    CharEntropyOps.signals(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CharEntropyOps$$.MODULE$$.signals($c)")
  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
