package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Linear-time matcher for RFC 9309 robots path patterns.
  *
  * A robots rule is matched anchored at the start of the URL path;
  * `*` matches any character sequence and a TRAILING `$` anchors the
  * end (RFC 9309 §2.2.3); every other character — including regex
  * metacharacters and interior `$` — is literal. Translating such a
  * pattern to a Java regex (the previous implementation) hands an
  * UNTRUSTED robots.txt to a backtracking engine: a hostile rule of
  * many `*a` repetitions against a long path backtracks super-polynomially and
  * can stall an executor core — the same detonator class
  * [[PiiScanOps]] guards against. This kernel is the classic greedy
  * two-pointer wildcard match instead: O(path·pattern) worst case
  * (both are HTTP-line-bounded), no compilation, no cache, no
  * pathological inputs.
  *
  * Without the `$` anchor the pattern must match a PREFIX of the path
  * (the regex was `^…` with `find()`); with it, the whole path.
  * Null in → null out.
  */
object GlobMatchOps {

  /** Path chars examined per match. O(path·pattern) needs BOTH sides
    * bounded: rules are capped at [[graft.operators.Robots.MaxPatternChars]]
    * per rule AND [[graft.operators.Robots.MaxPatternCharsPerHost]] in
    * total, and a hostile multi-megabyte URL path is truncated here —
    * so the worst case a URL pays against a fully hostile host is
    * 8 KiB path × 64 KiB summed patterns ≈ 5·10⁸ char ops
    * (milliseconds), not the 1.7·10¹¹ the per-rule caps alone allow.
    *
    * DOCUMENTED POLICY for paths beyond the cap (real-world URL
    * limits sit near 2 KiB; longer is hostile or broken): matching is
    * BEST-EFFORT on the 8 KiB prefix. A wildcard match needing
    * content past the cap is missed (that rule does not fire), and
    * `$`-anchored patterns never match a truncated path (the true end
    * is not visible — matching the cut point would fabricate
    * matches). Prefix rules are unaffected (their patterns are
    * shorter than the cap), so the composite decision in
    * [[graft.operators.Robots.robotsFilter]] can over- OR under-block
    * such a path relative to full-path RFC evaluation — e.g. an
    * anchored Allow that would out-rank a prefix Disallow cannot fire
    * past the cap. The alternative (unbounded matching) hands an
    * executor-stall primitive to anyone who crafts long URLs; the
    * 8 KiB ambiguity is confined to paths no compliant client
    * emits. */
  val MaxPathChars: Int = 8192

  def robotsMatch(pathS: UTF8String, patternS: UTF8String): Boolean = {
    val full = pathS.toString
    val truncated = full.length > MaxPathChars
    val s = if (truncated) full.substring(0, MaxPathChars) else full
    val rawP = patternS.toString
    val anchorEnd = rawP.nonEmpty && rawP.charAt(rawP.length - 1) == '$'
    if (anchorEnd && truncated) return false
    val p = if (anchorEnd) rawP.substring(0, rawP.length - 1) else rawP
    val n = s.length
    val m = p.length
    var i = 0; var j = 0
    var star = -1; var mark = 0 // last '*' in p / the path pos it matched to
    while (i < n) {
      if (j < m && p.charAt(j) == '*') { star = j; mark = i; j += 1 }
      else if (j < m && p.charAt(j) == s.charAt(i)) { i += 1; j += 1 }
      else if (j == m && !anchorEnd) return true // pattern consumed a prefix
      else if (star >= 0) { mark += 1; i = mark; j = star + 1 } // regrow last '*'
      else return false
    }
    // path consumed: any trailing stars match empty
    while (j < m && p.charAt(j) == '*') j += 1
    j == m
  }
}

/** robots_glob_match(path, pattern) → boolean. */
case class RobotsGlobMatch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_glob_match expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override protected def nullSafeEval(s: Any, p: Any): Any =
    GlobMatchOps.robotsMatch(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p) =>
      s"graft.expressions.GlobMatchOps$$.MODULE$$.robotsMatch($s, $p)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsGlobMatch =
    copy(left = newLeft, right = newRight)
}
