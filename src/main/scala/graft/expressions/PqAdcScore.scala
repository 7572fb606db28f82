package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** pq_qt(vec array<double>, cb, m, ksub, dsub) → array<double> of
  * m·ksub slots: the per-QUERY ADC lookup table, as one codegen pass
  * over the query vector — the batch-join sibling of [[PqAdcScore]]
  * (which scores a CANDIDATE against a driver-built table, this
  * builds the table for a query ROW). Slot s·ksub+c holds the
  * 6-decimal-rounded squared distance from the query's subspace-s
  * slice to codebook cell c, summed in `within` order — the same
  * value the relational dims→codebook-join→sum formulation and the
  * driver-side `topKFromIndex` table builder produce. Cells the
  * codebook never emitted (empty Lloyd cells, marked NaN in `cb`)
  * stay NaN: no persisted code can reference them, mirroring their
  * absence from the relational join. A query whose dimension does
  * not match m·dsub fails loudly (the appendToIndex dim contract).
  *
  * `cb` is the flattened codebook (slot (s·ksub + c)·dsub + w, NaN
  * for absent cells), riding into generated code as a reference
  * object — so the table build is map-only: no dims explode, no
  * codebook join, no per-query groupBy pair. */
case class PqQueryTable(child: Expression, cb: Array[Double],
                        m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_qt expects array<double> vectors, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqAdcScore.queryTable(input.asInstanceOf[ArrayData].toDoubleArray(),
      cb, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[]")
    val cls = PqAdcScore.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c =>
      s"$cls.queryTable($c.toDoubleArray(), $cbRef, $m, $ksub, $dsub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqQueryTable =
    copy(child = newChild)
}

/** pq_codes_adc(codes array<int>, qt array<double>, ksub) → double:
  * ADC-score an already-encoded candidate against a per-row query
  * table ([[PqQueryTable]]'s output carried through the candidate
  * join) — Σ qt[i·ksub + codes[i]] left-to-right in subspace order,
  * rounded to 6 decimals, exactly the relational
  * `round(aggregate(transform(codes, …), 0.0, +), 6)` fold. O(1)
  * array indexing per subspace (the map formulation this replaces
  * paid a linear scan of all m·ksub entries per element_at). */
case class PqCodesAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_codes_adc expects (array<int>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(codes: Any, qt: Any): Any =
    PqAdcScore.codesAdc(codes.asInstanceOf[ArrayData],
      qt.asInstanceOf[ArrayData].toDoubleArray(), ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqAdcScore.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (c, q) =>
      s"$cls.codesAdc($c, $q.toDoubleArray(), $ksub)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodesAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {

  /** Spark's Round(double, 6) semantics, exactly. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Shared by [[PqQueryTable]]'s interpreted eval and generated code. */
  def queryTable(q: Array[Double], cb: Array[Double],
                 m: Int, ksub: Int, dsub: Int): ArrayData = {
    if (q.length != m * dsub)
      throw new IllegalStateException(
        s"pq_qt: query has dim ${q.length}, the codebook expects " +
          s"${m * dsub} (m=$m x dsub=$dsub)")
    val qt = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        if (java.lang.Double.isNaN(cb(base))) {
          qt(s * ksub + c) = Double.NaN // cell absent from the codebook
        } else {
          var d = 0.0
          var w = 0
          while (w < dsub) {
            val diff = q(s * dsub + w) - cb(base + w)
            d += diff * diff
            w += 1
          }
          qt(s * ksub + c) = round6(d)
        }
        c += 1
      }
      s += 1
    }
    new GenericArrayData(qt)
  }

  /** Shared by [[PqCodesAdc]]'s interpreted eval and generated code. */
  def codesAdc(codes: ArrayData, qt: Array[Double], ksub: Int): Double = {
    val n = codes.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += qt(i * ksub + codes.getInt(i))
      i += 1
    }
    round6(acc)
  }

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
