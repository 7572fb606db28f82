package graft.impact

import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sources.Rds

/** The reference's operational damage model, loaded from its own
  * artifact: `models/operational/xgboost_regression_v{2,4}.RDS`
  * (consumed by run_model_V2.R:53,160-165). The RDS wraps an
  * xgboost-serialized model in JSON form; scoring is plain GBT leaf
  * summation, so the engine re-implements it exactly rather than
  * substituting a retrained approximation:
  *
  *  - traversal: at node n, go left iff float32(x[split_index]) <
  *    float32(split_condition) (xgboost compares in float32 — the R
  *    pipeline's double matrix is cast by xgb.DMatrix); missing (NaN)
  *    follows default_left. Leaves store their value in
  *    split_conditions with left_children == -1.
  *  - prediction = base_score + Σ leaf over trees, accumulated in
  *    double (the float32 leaves are exact in double; native xgboost
  *    accumulates in float32, so predictions agree to ~1e-6 relative
  *    — ours is the deterministic, more precise sum).
  */
final case class XgbTree(feat: Array[Int], cond: Array[Float],
                         left: Array[Int], right: Array[Int],
                         defaultLeft: Array[Boolean])

final class XgbBooster(val baseScore: Float, val numFeature: Int,
                       val trees: Array[XgbTree],
                       val featureNames: Seq[String],
                       val objective: String = "reg:squarederror")
    extends Serializable {

  def predict(f: Array[Double]): Double = {
    require(f.length >= numFeature,
      s"feature vector has ${f.length} entries; model needs $numFeature " +
        s"(${featureNames.mkString(", ")})")
    var acc: Double = baseScore.toDouble
    var t = 0
    while (t < trees.length) {
      val tr = trees(t)
      var n = 0
      while (tr.left(n) != -1) {
        val v = f(tr.feat(n))
        n = if (java.lang.Double.isNaN(v)) {
          if (tr.defaultLeft(n)) tr.left(n) else tr.right(n)
        } else if (v.toFloat < tr.cond(n)) tr.left(n) else tr.right(n)
      }
      acc += tr.cond(n).toDouble
      t += 1
    }
    acc
  }

  def numNodes: Int = trees.map(_.feat.length).sum

  /** Median split threshold per feature (1.0 where a feature is never
    * split on) — a characteristic scale for synthesizing probe inputs
    * that exercise both branches of typical nodes. */
  def medianSplitByFeature: Array[Double] = {
    val by = Array.fill(numFeature)(List.empty[Double])
    trees.foreach { tr =>
      var n = 0
      while (n < tr.feat.length) {
        if (tr.left(n) != -1)
          by(tr.feat(n)) = tr.cond(n).toDouble :: by(tr.feat(n))
        n += 1
      }
    }
    by.map { cs =>
      if (cs.isEmpty) 1.0
      else {
        val s = cs.sorted
        val n = s.length
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
      }
    }
  }
}

object XgbBooster {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, XgbBooster]()

  /** Load and cache a booster: an RDS artifact (the reference's
    * operational format) or a plain xgboost-JSON model file (the
    * engine's own save format — first byte '{'). */
  def load(path: String): XgbBooster =
    cache.computeIfAbsent(path, p => {
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
      if (bytes.nonEmpty && bytes(0) == '{')
        parseJson(new String(bytes, StandardCharsets.UTF_8))
      else parse(Rds.readFile(p))
    })

  /** Save `model` in xgboost's public JSON model layout (the same
    * schema `xgb.Booster.save_model("*.json")` writes and [[parseJson]]
    * reads back) — train once with [[GbtTrainer]], persist, score from
    * any later job via `xgb_score(features, path)`. Float32 leaf/split
    * values print as their exact double expansion, so save→load is
    * bit-exact.
    *
    * The objective is recorded (`learner.objective.name`) and, matching
    * xgboost's on-disk convention, `base_score` is persisted on
    * PROBABILITY scale for `binary:logistic` (xgboost applies
    * ProbToMargin at load); [[parseJson]] inverts it, so the in-memory
    * margin-scale `baseScore` round-trips. */
  def save(model: XgbBooster, path: String): Unit = {
    def ja[T](xs: Seq[T])(f: T => JValue): JArray = JArray(xs.map(f).toList)
    val treesJ = ja(model.trees.toSeq) { t =>
      JObject(
        "split_indices" -> ja(t.feat.toSeq)(i => JInt(i)),
        "split_conditions" -> ja(t.cond.toSeq)(c => JDouble(c.toDouble)),
        "left_children" -> ja(t.left.toSeq)(i => JInt(i)),
        "right_children" -> ja(t.right.toSeq)(i => JInt(i)),
        "default_left" -> ja(t.defaultLeft.toSeq)(b => JBool(b)))
    }
    val storedBase =
      if (model.objective == "binary:logistic")
        1.0 / (1.0 + math.exp(-model.baseScore.toDouble))  // margin → probability
      else model.baseScore.toDouble
    val j = JObject("learner" -> JObject(
      "learner_model_param" -> JObject(
        "base_score" -> JString(storedBase.toString),
        "num_feature" -> JString(model.numFeature.toString)),
      "objective" -> JObject("name" -> JString(model.objective)),
      "feature_names" -> ja(model.featureNames)(n => JString(n)),
      "gradient_booster" -> JObject("model" -> JObject("trees" -> treesJ))))
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      JsonMethods.compact(JsonMethods.render(j)).getBytes(StandardCharsets.UTF_8))
  }

  /** Parse the xgboost JSON model out of gunzipped RDS bytes. */
  def parse(rdsBytes: Array[Byte]): XgbBooster = {
    val raw = Rds.firstRaw(rdsBytes)
    parseJson(new String(raw, StandardCharsets.UTF_8),
      nf => Rds.scanStringVector(rdsBytes, nf).getOrElse(Seq.empty))
  }

  /** Parse an xgboost JSON model — either the RDS-wrapped layout
    * (top-level "Model", feature names in a sibling R vector fetched
    * via `rdsNames`) or a plain save_model file (top-level "learner",
    * names inline under feature_names). */
  def parseJson(json: String,
                rdsNames: Int => Seq[String] = _ => Seq.empty): XgbBooster = {
    val j = JsonMethods.parse(json)
    val learner = (j \ "Model" \ "learner") match {
      case JNothing => j \ "learner"
      case wrapped => wrapped
    }
    val objective = (learner \ "objective" \ "name") match {
      case JString(s) => s
      case _ => "reg:squarederror"
    }
    val storedBase = str(learner \ "learner_model_param" \ "base_score").toDouble
    // xgboost persists base_score on probability scale for logistic
    // objectives and converts at load (ProbToMargin); mirror that.
    val base =
      if (objective == "binary:logistic")
        (math.log(storedBase) - math.log1p(-storedBase)).toFloat
      else storedBase.toFloat
    val numFeature = str(learner \ "learner_model_param" \ "num_feature").toInt
    val JArray(treesJ) = (learner \ "gradient_booster" \ "model" \ "trees"): @unchecked
    val trees = treesJ.map { t =>
      XgbTree(
        ints(t \ "split_indices"),
        doubles(t \ "split_conditions").map(_.toFloat),
        ints(t \ "left_children"),
        ints(t \ "right_children"),
        bools(t \ "default_left"))
    }.toArray
    val names = (learner \ "feature_names") match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => rdsNames(numFeature)
    }
    new XgbBooster(base, numFeature, trees, names, objective)
  }

  private def str(v: JValue): String = v match {
    case JString(s) => s
    case JInt(i) => i.toString
    case JDouble(d) => d.toString
    case other => sys.error(s"expected scalar, got $other")
  }

  private def ints(v: JValue): Array[Int] = v match {
    case JArray(xs) => xs.map {
      case JInt(i) => i.toInt
      case JLong(l) => l.toInt
      case JDouble(d) => d.toInt
      case other => sys.error(s"expected int, got $other")
    }.toArray
    case other => sys.error(s"expected array, got $other")
  }

  private def doubles(v: JValue): Array[Double] = v match {
    case JArray(xs) => xs.map {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDecimal(d) => d.toDouble
      case other => sys.error(s"expected double, got $other")
    }.toArray
    case other => sys.error(s"expected array, got $other")
  }

  private def bools(v: JValue): Array[Boolean] = v match {
    case JArray(xs) => xs.map {
      case JBool(b) => b
      case JInt(i) => i != 0
      case other => sys.error(s"expected bool, got $other")
    }.toArray
    case other => sys.error(s"expected array, got $other")
  }
}
