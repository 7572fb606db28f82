package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** pq_adc(vec array<double>, cb, qt, m, ksub, dsub) → double: fused
  * product-quantization encode + asymmetric-distance score in ONE
  * codegen pass over the vector — the production kernel the
  * relational [[graft.operators.PqIndex]] pipeline promises. Per
  * subspace s it finds the nearest codebook cell (6-decimal-rounded
  * squared distance, ties to the lower cell — the exact contract of
  * the relational `min(struct(dist, cell))` argmin) and accumulates
  * that cell's query-table distance; the final sum is rounded to 6
  * decimals like the relational `round(sum(qdist), 6)`.
  *
  * `cb` is the flattened codebook (slot (s·ksub + c)·dsub + w), `qt`
  * the flattened query table (slot s·ksub + c, NaN marks a cell the
  * codebook never produced — such cells are skipped, mirroring their
  * absence from the relational join). Both ride into generated code
  * as reference objects; scoring is map-only, no join, no shuffle.
  *
  * Rounding replicates Spark's `Round` on doubles bit-for-bit
  * (BigDecimal.valueOf → setScale HALF_UP), so the fused kernel is
  * hash-identical to the relational path and certifiable against the
  * same independent SQL mirror (probe x27).
  */
case class PqAdcScore(child: Expression, cb: Array[Double],
                      qt: Array[Double], m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects array<double> vectors, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqAdcScore.score(input.asInstanceOf[ArrayData].toDoubleArray(),
      cb, qt, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[]")
    val qtRef = ctx.addReferenceObj("pqQueryTable", qt, "double[]")
    val cls = PqAdcScore.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c =>
      s"$cls.score($c.toDoubleArray(), $cbRef, $qtRef, $m, $ksub, $dsub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}

object PqAdcScore {

  /** Spark's Round(double, 6) semantics, exactly. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Shared by interpreted eval and generated code. */
  def score(v: Array[Double], cb: Array[Double], qt: Array[Double],
            m: Int, ksub: Int, dsub: Int): Double = {
    var acc = 0.0
    var s = 0
    while (s < m) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val q = qt(s * ksub + c)
        if (!java.lang.Double.isNaN(q)) {      // cell exists in the codebook
          var d = 0.0
          var w = 0
          while (w < dsub) {
            val diff = v(s * dsub + w) - cb((s * ksub + c) * dsub + w)
            d += diff * diff
            w += 1
          }
          d = round6(d)
          if (d < bestD) { bestD = d; best = c }  // strict < keeps the lower cell on ties
        }
        c += 1
      }
      if (best < 0)
        throw new IllegalStateException(
          s"pq_adc: subspace $s has no usable codebook cell (all $ksub " +
            "query-table slots are NaN) — the query table does not cover " +
            "this codebook; rebuild the query table for this codebook")
      acc += qt(s * ksub + best)
      s += 1
    }
    round6(acc)
  }
}
