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
  private[graft] def replaceCount(s: String, p: Pattern, token: String,
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
    val (t1, nEmail) = emailReplaceCount(t0, graft.operators.PiiOps.EmailToken)
    val (t1b, nIp1) = ipv4ReplaceCount(t1, graft.operators.PiiOps.Ipv4Token)
    val (t2, nIp2) = ipv4ReplaceCount(t1b, graft.operators.PiiOps.Ipv4Token)
    val (t3, nPhone) = replaceCount(t2, phone, graft.operators.PiiOps.PhoneToken, guarded = false)
    InternalRow(UTF8String.fromString(t3), nEmail, nIp1 + nIp2, nPhone)
  }

  // ---- anchored linear kernels ---------------------------------------
  //
  // PiiProfile decomposed the kernel wall: the email and IPv4 passes
  // cost ~60 µs/row EACH (and IPv4 runs twice) because java.util.regex
  // attempts the bounded-quantifier pattern at EVERY position; the
  // phone pass is 5 µs and md5 is negligible. Both hot patterns have
  // mandatory anchor characters — every email match contains '@',
  // every IPv4 match is a digit-run quad — so the kernels below visit
  // only anchor candidates and replicate the regex's backtracking
  // EXACTLY (derivation in comments; PiiScanSpec fuzz-pins bit-equality
  // against the Pattern-based replaceCount on millions of adversarial
  // strings, and the x66 DuckDB hash certifies the composition).

  private def isLocal(c: Char): Boolean = // [A-Za-z0-9._%+-]
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
  private def isDomain(c: Char): Boolean = // [A-Za-z0-9.-]
    isAlnum(c) || c == '.' || c == '-'
  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isWordish(c: Char): Boolean = // [0-9A-Za-z._]
    isAlnum(c) || c == '.' || c == '_'

  /** `L{1,64}@D0 D{0,251}\.A{2,24}` with L=[A-Za-z0-9._%+-],
    * D0=[A-Za-z0-9], D=[A-Za-z0-9.-], A=[A-Za-z].
    *
    * Equivalence to the regex: '@' ∉ L, so the greedy local part can
    * only stop at the '@' terminating its L-run — a start p matches
    * iff the L-run from p ends at '@' within ≤64 chars; the leftmost
    * start for the '@' at q is max(lastEnd, q − min(64, run)). The
    * domain side backtracks k = |D-run| … 0 looking for a '.' followed
    * by ≥2 alphas (greedy TLD takes min(24, alpha-run)); it is
    * independent of p, so '@'s can be visited left-to-right (an
    * L-run cannot cross an earlier '@', so match starts are ordered
    * like their '@'s — the find() order). */
  private[graft] def emailReplaceCount(s: String, token: String): (String, Int) = {
    val len = s.length
    var q = s.indexOf('@')
    if (q < 0) return (s, 0)
    var sb: java.lang.StringBuilder = null
    var n = 0
    var last = 0 // chars before `last` are emitted/consumed
    while (q >= 0) {
      var matched = false
      // local part: L-run ending at q, floor at `last`
      var p = q
      while (p > last && q - p < 64 && isLocal(s.charAt(p - 1))) p -= 1
      if (p < q && q + 1 < len && isAlnum(s.charAt(q + 1))) {
        // domain run (after the mandatory first alnum)
        var e = q + 2
        val eCap = math.min(len.toLong, q + 2L + 251L).toInt
        while (e < eCap && isDomain(s.charAt(e))) e += 1
        // backtrack: greatest k with '.' at q+2+k then ≥2 alphas
        var pos = e
        while (!matched && pos >= q + 2) {
          if (pos < len && s.charAt(pos) == '.') {
            var a = pos + 1
            val aCap = math.min(len.toLong, pos + 1L + 24L).toInt
            while (a < aCap && isAlpha(s.charAt(a))) a += 1
            if (a - pos - 1 >= 2) {
              if (sb == null) sb = new java.lang.StringBuilder(len)
              sb.append(s, last, p).append(token)
              last = a
              n += 1
              matched = true
            }
          }
          pos -= 1
        }
      }
      q = s.indexOf('@', if (matched) last else q + 1)
    }
    if (sb == null) (s, 0)
    else { sb.append(s, last, len); (sb.toString, n) }
  }

  /** `(^|[^0-9A-Za-z._]) ((\d{1,3}\.){3}\d{1,3}) (\.[^0-9]|\.$|[^0-9A-Za-z._]|$)`.
    *
    * Equivalence: '.' is not a digit, so each `\d{1,3}\.` segment
    * matches iff its digit-run is 1–3 long and ends at '.'; the final
    * `\d{1,3}` must consume its WHOLE run (a leftover digit defeats
    * every group-3 alternative, and backtracking re-exposes a digit),
    * so run-4 must be 1–3 long too. Candidate starts are digit-run
    * heads (a start inside a run has a digit guard char and fails
    * group 1), visited left-to-right = find() order; group 1 is '^'
    * only at position 0 of the ORIGINAL string, and a guard char must
    * sit at or after the previous match's end — which is why
    * space-adjacent IPs need the second pass, preserved exactly. */
  private[graft] def ipv4ReplaceCount(s: String, token: String): (String, Int) = {
    val len = s.length
    var sb: java.lang.StringBuilder = null
    var n = 0
    var last = 0
    var u = 0 // candidate quad start
    while (u < len) {
      if (!isDigit(s.charAt(u))) u += 1
      else {
        // u heads a digit run; guard: start of string (only when
        // nothing is consumed yet) or a non-wordish char at u-1 ≥ last
        val guardOk =
          (u == 0 && last == 0) || (u - 1 >= last && !isWordish(s.charAt(u - 1)))
        var end = -1
        if (guardOk) {
          // parse 4 runs of 1–3 digits separated by '.'
          var seg = 0
          var i = u
          var ok = true
          while (ok && seg < 4) {
            var r = 0
            while (i < len && isDigit(s.charAt(i)) && r <= 3) { i += 1; r += 1 }
            if (r < 1 || r > 3) ok = false
            else if (seg < 3) {
              if (i < len && s.charAt(i) == '.') i += 1 else ok = false
            }
            seg += 1
          }
          if (ok) {
            // group 3 alternatives, in the pattern's order
            if (i < len && s.charAt(i) == '.' && i + 1 < len &&
              !isDigit(s.charAt(i + 1))) end = i + 2
            else if (i + 1 == len && s.charAt(i) == '.') end = i + 1
            else if (i < len && !isWordish(s.charAt(i))) end = i + 1
            else if (i == len) end = i
          }
        }
        if (end >= 0) {
          if (sb == null) sb = new java.lang.StringBuilder(len)
          // guarded replace: group1 + token + group3 (quad vanishes)
          sb.append(s, last, u).append(token)
          // group 3 re-derivation: everything from the end of the quad
          val quadEnd = {
            var i = u; var seg = 0
            while (seg < 4) {
              while (i < len && isDigit(s.charAt(i))) i += 1
              if (seg < 3) i += 1 // the '.'
              seg += 1
            }
            i
          }
          sb.append(s, quadEnd, end)
          last = end
          n += 1
          u = math.max(end, u + 1)
        } else {
          // skip the whole digit run — interior starts have digit guards
          while (u < len && isDigit(s.charAt(u))) u += 1
        }
      }
    }
    if (sb == null) (s, 0)
    else { sb.append(s, last, len); (sb.toString, n) }
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
