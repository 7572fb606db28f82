package graft.expressions

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.UnigramLm

/** `unigram_tokens(text, model-key-literal)` → array<string>: split on
  * whitespace, Viterbi-segment each word under the registered
  * unigram-LM model (integer-lattice scores — see
  * [[graft.operators.UnigramLm]]), pieces flattened in order. Map-only
  * codegen; the model ships as a generated-class reference object. */
object UnigramOps {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def tokens(text: UTF8String, model: UnigramLm.Model): GenericArrayData = {
    val out = Seq.newBuilder[UTF8String]
    ws.split(text.toString.trim).foreach { w =>
      if (w.nonEmpty)
        UnigramLm.viterbi(w, model).foreach(p => out += UTF8String.fromString(p))
    }
    new GenericArrayData(out.result().toArray[Any])
  }

  private val registry = new ConcurrentHashMap[String, UnigramLm.Model]()
  private val nextId = new AtomicInteger(0)
  def register(m: UnigramLm.Model): String = {
    val key = s"mem:ulm:${nextId.incrementAndGet()}"
    registry.put(key, m)
    key
  }
  def resolve(key: String): UnigramLm.Model = {
    val m = registry.get(key)
    require(m != null, s"no unigram model registered under '$key'")
    m
  }
}

case class UnigramTokens(child: Expression, model: UnigramLm.Model)
    extends TextKernelExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    UnigramOps.tokens(input.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ulmModel", model,
      "graft.operators.UnigramLm.Model")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.UnigramOps$$.MODULE$$.tokens($c, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramTokens =
    copy(child = newChild)
}
