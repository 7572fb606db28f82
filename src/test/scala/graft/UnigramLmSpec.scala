package graft

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm
import graft.operators.UnigramLm.Model

/** Unigram-LM tokenizer: Viterbi semantics at their boundaries (the
  * integer-lattice tie-breaks the x96 oracle depends on), hard-EM
  * training behavior, and kernel ≡ driver equivalence.
  */
class UnigramLmSpec extends SparkTestBase {

  private def model(counts: (String, Long)*): Model = {
    val total = counts.map(_._2).sum
    def s(c: Long): Long = Math.round(graft.operators.EmbeddingOps.round6(
      math.log(c.toDouble) - math.log(total.toDouble)) * 1000000L)
    Model(counts.toMap.map { case (p, c) => p -> s(c) },
      maxPieceLen = 3, unkScore = s(1L))
  }

  test("viterbi picks the higher-scoring piece over char paths") {
    val m = model("a" -> 2, "b" -> 2, "c" -> 2, "ab" -> 10)
    assert(UnigramLm.viterbi("abc", m) === Seq("ab", "c"))
    // and the reverse when the bigram is rare
    val m2 = model("a" -> 10, "b" -> 10, "c" -> 2, "ab" -> 2)
    assert(UnigramLm.viterbi("abc", m2) === Seq("a", "b", "c"))
  }

  test("exact ties resolve lexicographically; fewer pieces win by mass") {
    // 'a aa' and 'aa a' have identical probability (2·4 = 4·2 over
    // the same total, same piece count): an EXACT integer-lattice tie
    // resolved by path order; the 3-piece 'a a a' path loses on
    // probability mass (one more ln(total) subtracted), the actual
    // unigram-LM preference for fewer pieces
    val m = model("a" -> 2, "aa" -> 4)
    assert(UnigramLm.viterbi("aaa", m) === Seq("a", "aa"))
  }

  test("unseen single characters fall back with ln(1/total)") {
    val m = model("a" -> 5)
    assert(UnigramLm.viterbi("axa", m) === Seq("a", "x", "a"))
  }

  test("hard-EM promotes a frequent collocation and prunes dead pieces") {
    // 'ing' appears in every type: after seeding + one EM round the
    // trained model must segment new text with the 'ing' piece
    val types = Seq(("sing", 50L), ("ring", 40L), ("king", 30L), ("s", 5L))
    val m = UnigramLm.trainOnTypes(types, vocabSize = 8,
      maxPieceLen = 3, emRounds = 2, minCount = 2)
    assert(UnigramLm.viterbi("wing", m).contains("ing"))
    // alphabet always survives pruning
    Seq("s", "i", "n", "g", "r", "k").foreach(ch =>
      assert(m.scores.contains(ch), s"alphabet char $ch pruned"))
  }

  test("vocabSize bounds multi-char pieces; alphabet is exempt") {
    val types = Seq(("abcabc", 10L), ("bcabca", 10L))
    val m = UnigramLm.trainOnTypes(types, vocabSize = 2,
      maxPieceLen = 3, emRounds = 1, minCount = 1)
    assert(m.scores.keys.count(_.length > 1) <= 2)
    assert(Seq("a", "b", "c").forall(m.scores.contains))
  }

  test("kernel segmentation equals the driver viterbi on the corpus") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(50)
    val m = UnigramLm.train(docs, vocabSize = 20, maxPieceLen = 3,
      emRounds = 1, minCount = 2)
    val kernel = UnigramLm.segmentDocs(docs, m)
      .select("doc_id", "seg").as[(Long, String)].collect().toMap
    val driver = docs.select("doc_id", "text").as[(Long, String)]
      .collect().map { case (id, t) =>
        id -> t.trim.split("\\s+").filter(_.nonEmpty)
          .flatMap(w => UnigramLm.viterbi(w, m)).mkString(" ")
      }.toMap
    assert(kernel === driver)
  }

  test("segmentation round-trips: concatenated pieces rebuild each word") {
    val types = Seq(("hashvalue", 20L), ("hash", 10L), ("value", 10L))
    val m = UnigramLm.trainOnTypes(types, vocabSize = 10,
      maxPieceLen = 5, emRounds = 2, minCount = 1)
    Seq("hashvalue", "valuehash", "hash").foreach { w =>
      assert(UnigramLm.viterbi(w, m).mkString("") === w)
    }
  }

  test("tokenIds: sorted-vocab contract, UNK -1, pieces round-trip") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val m = model("ab" -> 8, "a" -> 2, "b" -> 2)
    // sorted vocab: a=0, ab=1, b=2
    val out = UnigramLm.segmentDocs(
        Seq((1L, "abb")).toDF("doc_id", "text"), m)
      .select("seg").head.getString(0)
    val ids = Seq((1L, "abb"), (2L, "axb")).toDF("doc_id", "text")
      .select(col("doc_id"), UnigramLm.tokenIds(col("text"), m).as("ids"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(out === "ab b")
    assert(ids(1L) === List(1, 2))
    assert(ids(2L) === List(0, -1, 2)) // 'x' is the UNK fallback
  }

  test("astral-plane text segments by codepoint, never splitting surrogate pairs") {
    // 😀 = U+1F600 (2 UTF-16 units). A UTF-16-unit viterbi would emit
    // lone-surrogate pieces that UTF8String mangles to '?'; codepoint
    // segmentation must keep each emoji whole and round-trip exactly.
    val emoji = new String(Character.toChars(0x1F600))
    val word = s"a${emoji}b$emoji"
    val m = model("a" -> 2, "b" -> 2, emoji -> 5)
    val pieces = UnigramLm.viterbi(word, m)
    assert(pieces === Seq("a", emoji, "b", emoji))
    assert(pieces.mkString === word)
    // multi-codepoint piece crossing an astral char stays aligned
    val m2 = model("a" -> 1, "b" -> 1, emoji -> 1, s"a$emoji" -> 50)
    assert(UnigramLm.viterbi(word, m2) === Seq(s"a$emoji", "b", emoji))
    // training on astral text: alphabet keeps whole codepoints and
    // the trained model round-trips through the SQL kernel
    import spark.implicits._
    val docs = Seq((1L, s"$word $word ${emoji}x"), (2L, s"x$emoji $word"))
      .toDF("doc_id", "text")
    val trained = UnigramLm.train(docs, vocabSize = 8, maxPieceLen = 3,
      emRounds = 1, minCount = 1)
    trained.scores.keys.foreach { p =>
      assert(!(p.length == 1 && Character.isSurrogate(p.charAt(0))),
        s"lone surrogate piece: ${p.map(_.toInt).mkString(",")}")
      // every piece round-trips codepoints → String (no unpaired halves)
      val cps = p.codePoints().toArray
      assert(new String(cps, 0, cps.length) == p)
    }
    val seg = UnigramLm.segmentDocs(docs, trained).orderBy("doc_id")
      .select("seg").as[String].collect()
    assert(seg(0).replace(" ", "") == s"$word$word${emoji}x".replace(" ", ""))
    // no '?' anywhere in the inputs ⇒ any '?' is a mangled surrogate
    assert(!seg.exists(_.contains('?')))
  }

  test("empty and blank text segment to nothing") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val m = model("a" -> 2)
    val out = UnigramLm.segmentDocs(
      Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"), m)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Int]("n_pieces") === 0))
  }

  test("segmentDocs plan is map-only (zero exchanges)") {
    import spark.implicits._
    val m = model("a" -> 2)
    val p = UnigramLm.segmentDocs(Seq((1L, "a")).toDF("doc_id", "text"), m)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("HashAggregate"),
      s"segmentation must be one projection:\n$p")
  }
}
