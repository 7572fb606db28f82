package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** nearest_value(v, values-literal, keys-literal) → bigint: the key of
  * the right-side row nearest to `v` by absolute difference, ties to
  * the smaller key — J9 "nearest lookup" as a MAP-ONLY binary search
  * over a broadcast sorted value table, instead of the cross join that
  * is quadratic in both sides.
  *
  * `values` is the right side's sorted distinct values, `keys` the
  * minimum key at each value (the lexicographic (|diff|, key) winner
  * within a value group is its minimum key). Both ride into generated
  * code as reference objects. The right side must be dimension-sized
  * (its distinct values broadcastable) — which is what "nearest
  * lookup against a reference table" means in practice; an
  * unbounded-domain right side calls for the bucketized range join
  * instead.
  */
case class NearestValue(child: Expression, values: Array[Double],
                        keys: Array[Long])
    extends UnaryExpression {

  require(values.nonEmpty && values.length == keys.length,
    "nearest_value needs equal-length, non-empty value/key tables")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_value expects a double, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NearestValue.lookup(input.asInstanceOf[Double], values, keys)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("nearestValues", values, "double[]")
    val kRef = ctx.addReferenceObj("nearestKeys", keys, "long[]")
    val cls = NearestValue.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.lookup($c, $vRef, $kRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestValue =
    copy(child = newChild)
}

object NearestValue {

  /** Binary search for the insertion point, then compare the floor and
    * ceiling candidates by (|diff|, key). Shared by interpreted eval
    * and generated code. */
  def lookup(v: Double, values: Array[Double], keys: Array[Long]): Long = {
    var lo = 0
    var hi = values.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (values(mid) < v) lo = mid + 1 else hi = mid
    }
    // lo = first index with value >= v; candidates are lo-1 and lo
    if (lo == 0) keys(0)
    else if (lo == values.length) keys(values.length - 1)
    else {
      val dFloor = v - values(lo - 1)
      val dCeil = values(lo) - v
      if (dFloor < dCeil) keys(lo - 1)
      else if (dCeil < dFloor) keys(lo)
      else math.min(keys(lo - 1), keys(lo))
    }
  }
}
