package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen expression.
  *
  * Crawled text mixes precomposed and decomposed forms of the same
  * grapheme (`é` vs `e`+U+0301): exact dedup, shingling, BPE merges
  * and blocklist matching all treat the two as DIFFERENT strings, so
  * curation pipelines normalize (NFC for storage/dedup, NFKC for
  * tokenizer-facing folding — the GPT-2/LLaMA-family tokenizers both
  * NFKC first). Spark ships no normalizer function; this wraps
  * `java.text.Normalizer` (JDK-only, same zero-dependency stance as
  * the imageio/sampled decoders) as a unary codegen expression so
  * normalization runs INSIDE whole-stage codegen instead of as an
  * interpreted UDF boundary.
  *
  * The quick-check fast path ([[Normalizer.isNormalized]]) makes the
  * already-normalized case (the overwhelming majority of real text) a
  * scan without allocation.
  */
object UnicodeNormalizeOps {
  def normalize(text: UTF8String, form: Normalizer.Form): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, form)) text
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }

  def formOf(name: String): Normalizer.Form = name.toUpperCase match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' (want NFC|NFD|NFKC|NFKD)")
  }
}

/** unicode_normalize(text, form) → normalized text; the form is a
  * plan-time constant (picks the generated code path). */
case class UnicodeNormalize(child: Expression, formName: String)
    extends TextKernelExpr {
  private val form = UnicodeNormalizeOps.formOf(formName)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalizeOps.normalize(input.asInstanceOf[UTF8String], form)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", form, classOf[Normalizer.Form].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.UnicodeNormalizeOps$$.MODULE$$.normalize($c, $formRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Per-CODEPOINT, locale-free lowercase — `lower_cp(text)`.
  *
  * Spark's `lower` routes non-ASCII through `String.toLowerCase`,
  * which is CONTEXT-SENSITIVE and DEFAULT-LOCALE: Greek 'ΟΣ' lowers
  * to 'ος' (final sigma) where DuckDB's per-character utf8proc gives
  * 'οσ'; 'İ' expands to "i"+combining-dot; and a Turkish default
  * locale maps 'I'→'ı'. `Character.toLowerCase(int)` is the
  * context-free per-codepoint simple mapping, which matches the
  * engine-portable behavior ('ΟΣ'→'οσ', 'İ'→'i', 'I'→'i' on any
  * locale) — the lowercase [[graft.operators.TextOps.dedupNormalize]]
  * needs for its cross-engine signature-collision contract. */
object LowerCodepointOps {
  def lower(text: UTF8String): UTF8String = {
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** lower_cp(text) → per-codepoint locale-free lowercase. */
case class LowerCodepoint(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    LowerCodepointOps.lower(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LowerCodepointOps$$.MODULE$$.lower($c)")
  override protected def withNewChildInternal(newChild: Expression): LowerCodepoint =
    copy(child = newChild)
}
