package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Integer cosine over int8 code arrays as ONE native codegen pass —
  * the scoring kernel of the batch ANN join (`Similarity
  * .annJoinInt8FromIndex`) and every other int8 similarity surface.
  *
  * Semantics are exactly the HOF reference formulation (`Similarity
  * .int8CosineHof`): all three dot products (a·b, a·a, b·b) are exact
  * long arithmetic (|code| ≤ 127, so dims up to ~5×10^14 stay below
  * 2^63 — far past any embedding width), the final value is
  * `(a·b) / (sqrt(a·a) * sqrt(b·b))` in IEEE double, bit-identical to
  * three separate `aggregate(zip_with(...))` passes and to any other
  * engine's integer evaluation (the x73/x111 mirror contract). The
  * win is mechanical: the HOF form is `CodegenFallback` — every
  * element round-trips through the interpreter THREE times per
  * candidate pair, which dominates a k-NN join's candidate scans; this
  * kernel is one generated primitive loop.
  *
  * Null contract matches the HOF form: a null element in either array
  * nulls the similarity (quantized code arrays never carry element
  * nulls in practice). Unequal lengths score the common prefix (the
  * [[DotProduct]] contract; quantized pairs are equal-length by
  * construction). A ZERO-NORM input (an all-zero embedding quantizes
  * to all-zero codes) yields NaN — IEEE division, the value DuckDB's
  * float arithmetic mirrors — where the HOF's native Divide THROWS
  * under ANSI mode; the kernel is the more oracle-consistent of the
  * two, and no certified corpus carries zero vectors.
  */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // codes are tinyint at rest, but query-side LITERALS arrive as
  // array<bigint>/array<int> — any integral element type is an exact
  // whole number, so all are accepted (the HOF form cast to long too)
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_cosine expects integral array inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def getter(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case ByteType => s"(long) $arr.getByte($i)"
      case ShortType => s"(long) $arr.getShort($i)"
      case IntegerType => s"(long) $arr.getInt($i)"
      case _ => s"$arr.getLong($i)"
    }

  private def get(e: Expression, arr: ArrayData, i: Int): Long =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case ByteType => arr.getByte(i).toLong
      case ShortType => arr.getShort(i).toLong
      case IntegerType => arr.getInt(i).toLong
      case _ => arr.getLong(i)
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dab = 0L
    var daa = 0L
    var dbb = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(left, a, i)
      val y = get(right, b, i)
      dab += x * y
      daa += x * x
      dbb += y * y
      i += 1
    }
    dab.toDouble / (math.sqrt(daa.toDouble) * math.sqrt(dbb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dab = ctx.freshName("dab")
      val daa = ctx.freshName("daa")
      val dbb = ctx.freshName("dbb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dab = 0L; long $daa = 0L; long $dbb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final long $x = ${getter(left, a, i)};
         |  final long $y = ${getter(right, b, i)};
         |  $dab += $x * $y; $daa += $x * $x; $dbb += $y * $y;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = ((double) $dab) /
         |    (java.lang.Math.sqrt((double) $daa) * java.lang.Math.sqrt((double) $dbb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Cosine =
    copy(left = newLeft, right = newRight)
}
