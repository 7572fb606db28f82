package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass PII redact+count kernel. The relational formulation
  * (graft.operators.PiiOps.redactPii) evaluates each category TWICE —
  * a `regexp_extract_all` for the count and a `regexp_replace` for the
  * rewrite — eight java.util.regex scans of the payload per row. This
  * kernel walks each pattern ONCE with a single Matcher, emitting the
  * redacted text and the match count from the same pass (4 scans:
  * email, IPv4 ×2 — see the chain-guard note on
  * PiiOps.Ipv4Pattern — and phone), with patterns compiled once per
  * JVM. Values are identical by construction: the same patterns, the
  * same sequential order, the same two-pass IPv4 rule.
  *
  * Output: struct(text_redacted, n_emails, n_ipv4, n_phones); null
  * text → null struct (callers coalesce the counts, preserving the
  * null-is-data stance).
  */
object PiiScanOps {
  // compiled once per JVM — the pattern STRINGS live in PiiOps (the
  // certified cross-engine contract); keep them in lockstep
  private lazy val email =
    Pattern.compile(graft.operators.PiiOps.EmailPattern)
  private lazy val ipv4 =
    Pattern.compile(graft.operators.PiiOps.Ipv4Pattern)
  private lazy val phone =
    Pattern.compile(graft.operators.PiiOps.PhonePattern)

  /** Replace every match with `token` (or group1+token+group3 when
    * `guarded`), returning (result, matches). One Matcher pass.
    * The REFERENCE path — the hand kernels below are fuzz-pinned
    * bit-equal to it (PiiScanSpec). */
  private[expressions] def replaceCount(s: String, p: Pattern, token: String,
                                        guarded: Boolean): (String, Int) = {
    val m = p.matcher(s)
    if (!m.find()) return (s, 0)
    val sb = new java.lang.StringBuilder(s.length)
    var n = 0
    var last = 0
    do {
      n += 1
      sb.append(s, last, m.start())
      if (guarded) {
        sb.append(m.group(1)).append(token).append(m.group(3))
      } else sb.append(token)
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    (sb.toString, n)
  }

  def scan(text: UTF8String): InternalRow = {
    val t0 = text.toString
    val (t1, nEmail) = replaceCount(t0, email, graft.operators.PiiOps.EmailToken, guarded = false)
    val (t1b, nIp1) = replaceCount(t1, ipv4, graft.operators.PiiOps.Ipv4Token, guarded = true)
    val (t2, nIp2) = replaceCount(t1b, ipv4, graft.operators.PiiOps.Ipv4Token, guarded = true)
    val (t3, nPhone) = replaceCount(t2, phone, graft.operators.PiiOps.PhoneToken, guarded = false)
    InternalRow(UTF8String.fromString(t3), nEmail, nIp1 + nIp2, nPhone)
  }
}

/** pii_scan(text) → struct<text_redacted, n_emails, n_ipv4, n_phones>. */
case class PiiScan(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("text_redacted", StringType),
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_ipv4", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    PiiScanOps.scan(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.PiiScanOps$$.MODULE$$.scan($c)")
  override protected def withNewChildInternal(newChild: Expression): PiiScan =
    copy(child = newChild)
}
