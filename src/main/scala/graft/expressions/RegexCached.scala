package graft.expressions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `regexp_like` for NON-LITERAL patterns with a compile cache.
  *
  * Spark's `RLike`/`RegExpExtract` family caches the compiled
  * `Pattern` only when the pattern is foldable; a pattern that arrives
  * from a JOINED COLUMN (the robots rules table: millions of rows,
  * thousands of DISTINCT patterns) recompiles per evaluated row —
  * measured as the dominant cost of the robots decision stage (3s for
  * a 20k-URL × 3-rule join where the match itself is microseconds).
  * This kernel keys a per-JVM cache by the pattern string, so each
  * distinct pattern compiles once per executor. The cache is bounded:
  * on overflow it clears wholesale (correctness is unaffected — a
  * cleared entry just recompiles), sized for rule tables whose
  * distinct-pattern count is far below the row count, which is what
  * policy tables look like.
  *
  * Semantics: identical to `regexp_like(s, p)` (Java regex, find()
  * anywhere-match — anchor with ^/$ in the pattern, as the robots
  * rule compiler does). Null in → null out.
  */
object RegexCachedOps {
  private final val MaxEntries = 16384
  private val cache = new ConcurrentHashMap[String, Pattern]()

  def find(s: UTF8String, p: UTF8String): Boolean = {
    val key = p.toString
    var pat = cache.get(key)
    if (pat == null) {
      if (cache.size >= MaxEntries) cache.clear()
      pat = Pattern.compile(key)
      cache.put(key, pat)
    }
    pat.matcher(s.toString).find()
  }
}

/** regexp_like_cached(str, pattern) → boolean. */
case class RegexpLikeCached(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"regexp_like_cached expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override protected def nullSafeEval(s: Any, p: Any): Any =
    RegexCachedOps.find(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p) =>
      s"graft.expressions.RegexCachedOps$$.MODULE$$.find($s, $p)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RegexpLikeCached =
    copy(left = newLeft, right = newRight)
}
