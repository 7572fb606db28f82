package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.impact.XgbBooster

/** xgb_score(features array<double>, '<model.RDS>') → double.
  *
  * Scores the loaded booster inside whole-stage codegen: the model is
  * attached to the generated class as a reference object (the same
  * mechanism literals use), so scoring is a virtual call per row with
  * zero serialization on the hot path. The tree walk itself is ~50–300
  * pointer-chases over primitive arrays — map-only, no shuffle, scales
  * linearly with rows.
  *
  * `modelPath` doubles as the expression's identity for plan
  * canonicalization; in-memory boosters (e.g. freshly trained by
  * [[graft.impact.GbtTrainer]]) pass a synthetic tag plus the booster
  * itself via [[XgbScore.inMemory]].
  */
case class XgbScore(child: Expression, modelPath: String,
                    preloaded: Option[XgbBooster] = None)
    extends UnaryExpression {

  @transient private lazy val model: XgbBooster =
    preloaded.getOrElse(XgbBooster.load(modelPath))

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xgb_score expects array<double> features, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    model.predict(input.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("xgbBooster", model, classOf[XgbBooster].getName)
    defineCodeGen(ctx, ev, c => s"$m.predict($c.toDoubleArray())")
  }

  override protected def withNewChildInternal(newChild: Expression): XgbScore =
    copy(child = newChild)
}

object XgbScore {
  /** Driver-side registry of in-memory boosters (e.g. freshly trained
    * by [[graft.impact.GbtTrainer]]). The tag is the expression's
    * identity for plan canonicalization, so two different models never
    * collapse to one cached plan; the booster itself rides to executors
    * inside the serialized expression, exactly like the path-loaded
    * case. Entries are tiny (packed primitive arrays, ~100 KB for the
    * reference's 100×depth-8 model) and bounded by the number of models
    * trained in a session, so no eviction is needed. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, XgbBooster]()
  private val nextId = new java.util.concurrent.atomic.AtomicLong()

  /** Register `model`, returning the tag to pass as xgb_score's second
    * argument (in place of an artifact path). */
  def register(model: XgbBooster): String = {
    val tag = s"<mem:${nextId.incrementAndGet()}>"
    registry.put(tag, model)
    tag
  }

  /** FunctionRegistry entry point: a "<mem:…>" tag resolves through the
    * registry (analysis happens on the driver, where it was issued);
    * anything else is an artifact path loaded lazily executor-side. */
  def resolve(child: Expression, pathOrTag: String): XgbScore =
    if (pathOrTag.startsWith("<mem:")) {
      val m = registry.get(pathOrTag)
      require(m != null, s"no in-memory booster registered under $pathOrTag")
      XgbScore(child, pathOrTag, Some(m))
    } else XgbScore(child, pathOrTag)
}
