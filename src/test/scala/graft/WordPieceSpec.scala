package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextOps, WordPiece}
import graft.sources.Tables

/** WordPiece (operators/WordPiece.scala): likelihood-scored training,
  * greedy longest-match segmentation, [UNK] totality, the ##
  * continuation contract, and the codegen kernel ≡ driver twin. */
class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  private def model(vocab: String*): WordPiece.Model = {
    val v = vocab.toSet + WordPiece.Unk
    val maxLen = v.filter(_ != WordPiece.Unk)
      .map(u => { val c = if (u.startsWith("##")) u.substring(2) else u
        c.codePointCount(0, c.length) }).foldLeft(1)(math.max)
    WordPiece.Model(v, maxLen)
  }

  test("the canonical BERT example: unaffable -> un ##aff ##able") {
    val m = model("un", "##aff", "##able")
    assert(WordPiece.segmentWord("unaffable", m) ===
      Seq("un", "##aff", "##able"))
  }

  test("greedy longest-match-first, no backtracking") {
    // longest wins at each position
    assert(WordPiece.segmentWord("abcd", model("a", "ab", "abc", "##d")) ===
      Seq("abc", "##d"))
    // greedy is NOT optimal: taking 'abc' strands '##d' when only
    // ##e exists — whole word collapses to [UNK] even though
    // a + ##b + ##c + ##d would have succeeded
    assert(WordPiece.segmentWord("abcd",
      model("abc", "a", "##b", "##c", "##d", "##e").copy(maxContentCp = 3)) ===
      Seq("abc", "##d"))
    assert(WordPiece.segmentWord("abcd", model("abc", "##e")) ===
      Seq(WordPiece.Unk))
  }

  test("continuation pieces require ##; initial pieces must be bare") {
    val m = model("able", "##able", "un")
    // 'able' at word start uses the bare entry
    assert(WordPiece.segmentWord("able", m) === Seq("able"))
    // mid-word 'able' uses the ## entry
    assert(WordPiece.segmentWord("unable", m) === Seq("un", "##able"))
    // a vocab with ONLY the bare form cannot match mid-word
    val bareOnly = model("un", "able")
    assert(WordPiece.segmentWord("unable", bareOnly) === Seq(WordPiece.Unk))
  }

  test("[UNK] totality: unknown codepoint, over-long word, empty word") {
    val m = model("a", "##a")
    assert(WordPiece.segmentWord("aaq", m) === Seq(WordPiece.Unk))
    assert(WordPiece.segmentWord("a" * (WordPiece.MaxWordCp + 1), m) ===
      Seq(WordPiece.Unk))
    assert(WordPiece.segmentWord("", m) === Seq.empty)
    assert(WordPiece.segmentWord("a" * WordPiece.MaxWordCp, m).length ===
      WordPiece.MaxWordCp)
  }

  test("surrogate pairs segment as whole codepoints") {
    val g = new String(Character.toChars(0x1F600)) // astral emoji
    val m = model(g, "##" + g, "a", "##a")
    assert(WordPiece.segmentWord(g + g, m) === Seq(g, "##" + g))
  }

  test("training ranks by likelihood, not raw pair frequency") {
    // pair (a,##b) count 100 but parts are common (score 100/(1000*100));
    // pair (x,##y) count 30 with rare parts (score 30/(30*30)) — the
    // WordPiece criterion picks xy, a frequency-ranked BPE picks ab
    val dict = Array(("ab", 100L), ("a", 900L), ("b", 900L), ("xy", 30L))
    val m = WordPiece.trainOnDict(dict, numMerges = 1)
    assert(m.vocab.contains("xy"), s"likelihood merge missed: ${m.vocab}")
    assert(!m.vocab.contains("ab"), s"frequency merge chosen: ${m.vocab}")
    // the alphabet (bare + ## forms) and [UNK] are always in vocab
    assert(Set("a", "b", "x", "##b", "##y", WordPiece.Unk).subsetOf(m.vocab))
  }

  test("a merged unit keeps the left marker; chained merges compose") {
    // 'abc' x10: round 1 merges the best-scoring pair; with uniform
    // counts the tie falls to byte order ((##b,##c) < (a,##b)) — the
    // merged continuation unit keeps ## and can merge again
    val m = WordPiece.trainOnDict(Array(("abc", 10L)), numMerges = 2)
    assert(m.vocab.contains("##bc"), s"expected ##bc in ${m.vocab}")
    assert(m.vocab.contains("abc"), s"expected the round-2 merge in ${m.vocab}")
    assert(WordPiece.segmentWord("abc", m) === Seq("abc"))
  }

  test("trainOnDict is deterministic and train() reproduces it") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.normalizeText(col("text")).as("text"))
    val m1 = WordPiece.train(docs, numMerges = 12)
    val m2 = WordPiece.train(docs.repartition(7), numMerges = 12)
    assert(m1 === m2, "training must be partition-invariant")
    assert(m1.vocab.size > 30)
  }

  test("kernel == driver twin on the real corpus; ids follow the sorted contract") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.normalizeText(col("text")).as("text"))
    val m = WordPiece.train(docs, numMerges = 12)
    val viaKernel = docs
      .select(col("doc_id"), WordPiece.tokens(col("text"), m).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // driver twin: pre-tokenize with the same prelude, segment per word
    val pat = graft.expressions.BpeOps.PreTokenPattern.r
    val viaDriver = docs.select("doc_id", "text").collect().map { r =>
      val toks = pat.findAllIn(r.getString(1)).toSeq
        .flatMap(w => WordPiece.segmentWord(w, m))
      r.getLong(0) -> toks
    }.toMap
    assert(viaKernel === viaDriver)
    assert(viaKernel.values.exists(_.nonEmpty))
    // ids: sorted-vocab positions; [UNK] maps to a real id
    val sortedVocab = m.vocab.toSeq.sortWith((a, b) =>
      java.util.Arrays.compareUnsigned(a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0)
    val idOf = sortedVocab.zipWithIndex.toMap
    val ids = docs
      .select(col("doc_id"), WordPiece.tokenIds(col("text"), m).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    viaKernel.foreach { case (id, toks) =>
      assert(ids(id) === toks.map(idOf), s"id stream mismatch for doc $id")
    }
  }

  test("tokenization plan is a map-only scan (no shuffle)") {
    GraftExtensions.register(spark)
    val m = model("a", "##a")
    val plan = Tables.documents(spark, sfDir)
      .select(WordPiece.tokens(col("text"), m))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  test("Model refuses a vocabulary without [UNK]") {
    intercept[IllegalArgumentException] {
      WordPiece.Model(Set("a"), 1)
    }
  }
}
