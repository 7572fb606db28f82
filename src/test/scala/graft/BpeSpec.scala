package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.expressions.BpeOps
import graft.operators.{Bpe, BpeProbes, TextOps}

/** BPE tokenizer: the production kernel/trainer vs independent naive
  * twins, the contract's edge cases, and the plan shape.
  *
  * The naive encode twin applies every merge rank as a full pass in
  * rank order (O(M·L), no candidate tracking, no cache) — a different
  * algorithm computing the same contract, so agreement is evidence,
  * not tautology. The naive trainer twin recounts pairs from word
  * INSTANCES each round where the production trainer folds word TYPES.
  */
class BpeSpec extends SparkTestBase {

  // --- independent naive twins -----------------------------------------

  private def naiveEncodeWord(word: String, merges: Seq[(String, String)]): List[String] = {
    var toks = BpeOps.initialTokens(word).toList
    for ((l, r) <- merges) { // every rank, one full left-to-right pass
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var rest = toks
      while (rest.nonEmpty) rest match {
        case a :: b :: tail if a == l && b == r => out += (l + r); rest = tail
        case a :: tail => out += a; rest = tail
        case Nil => ()
      }
      toks = out.toList
    }
    toks
  }

  private def naiveEncode(text: String, merges: Seq[(String, String)]): List[String] = {
    val m = java.util.regex.Pattern.compile(BpeOps.PreTokenPattern).matcher(text)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (m.find()) {
      val mark = m.start() > 0 && text.charAt(m.start() - 1) == ' '
      val toks = naiveEncodeWord(m.group(), merges)
      out ++= toks.zipWithIndex.map { case (t, i) =>
        if (mark && i == 0) " " + t else t
      }
    }
    out.toList
  }

  private def byteLt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8)) < 0

  /** Instance-level trainer (no word-type folding). */
  private def naiveTrain(docs: Seq[String], numMerges: Int): Seq[(String, String)] = {
    val m = java.util.regex.Pattern.compile(BpeOps.PreTokenPattern)
    var words: Seq[Array[String]] = docs.flatMap { t =>
      val it = m.matcher(t)
      val ws = scala.collection.mutable.ListBuffer.empty[Array[String]]
      while (it.find()) ws += BpeOps.initialTokens(it.group())
      ws
    }
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    for (_ <- 0 until numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for (w <- words; i <- 0 until w.length - 1)
        counts.update((w(i), w(i + 1)), counts.getOrElse((w(i), w(i + 1)), 0L) + 1)
      if (counts.nonEmpty) {
        val best = counts.toSeq.sortWith { case ((p1, c1), (p2, c2)) =>
          c1 > c2 || (c1 == c2 && (byteLt(p1._1, p2._1) ||
            (p1._1 == p2._1 && byteLt(p1._2, p2._2))))
        }.head._1
        merges += best
        words = words.map { w =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && w(i) == best._1 && w(i + 1) == best._2) {
              out += best._1 + best._2; i += 2
            } else { out += w(i); i += 1 }
          }
          out.toArray
        }
      }
    }
    merges.toSeq
  }

  private def kernelEncode(text: String, merges: Seq[(String, String)],
                           mark: Boolean = true): List[String] = {
    import org.apache.spark.unsafe.types.UTF8String
    BpeOps.encode(UTF8String.fromString(text), BpeOps.compile(merges), mark)
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toList
  }

  // --- encode kernel vs naive twin --------------------------------------

  test("kernel equals the rank-order naive twin on crafted inputs") {
    val merges = BpeProbes.FixedMerges
    val cases = Seq(
      "the theater is there", "don't stop-me now", "a1b2c3", "x,y.z!",
      "aaa aaaa aaaaa", "thththth", "", " ", "single", "t h e",
      "that that that", "ingesting interesting things")
    for (c <- cases)
      assert(kernelEncode(c, merges) === naiveEncode(c, merges), s"input: '$c'")
  }

  test("kernel equals the naive twin on seeded random soup") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab cd!1é世"
    for (_ <- 0 until 200) {
      val s = (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(kernelEncode(s, BpeProbes.FixedMerges) ===
        naiveEncode(s, BpeProbes.FixedMerges), s"input: '$s'")
    }
  }

  test("random well-formed merge tables agree with the naive twin") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      // grow a random well-formed table over a small alphabet
      val produced = scala.collection.mutable.ArrayBuffer("a", "b", "c")
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      for (_ <- 0 until 12) {
        val l = produced(rnd.nextInt(produced.length))
        val r = produced(rnd.nextInt(produced.length))
        merges += ((l, r)); produced += l + r
      }
      val text = (0 until 30).map(_ => "abc ab"(rnd.nextInt(6))).mkString
      assert(kernelEncode(text, merges.toSeq) === naiveEncode(text, merges.toSeq),
        s"table: $merges input: '$text'")
    }
  }

  test("long degenerate runs stay linear-ish and correct") {
    val merges = Seq("a" -> "a", "aa" -> "aa", "aaaa" -> "aaaa")
    val run = "a" * 10000
    val got = kernelEncode(run, merges)
    assert(got === naiveEncode(run, merges))
    assert(got.count(_ == "aaaaaaaa") === 1250)
  }

  // --- contract edges ----------------------------------------------------

  test("codepoint-level initial tokens: non-BMP survives") {
    assert(BpeOps.initialTokens("a😀世").toSeq === Seq("a", "😀", "世"))
    // each non-alphanumeric codepoint is its own pre-token → no merges
    assert(kernelEncode("a😀b", BpeProbes.FixedMerges) === List("a", "😀", "b"))
  }

  test("Unicode prelude: non-Latin words pre-tokenize as words, not codepoints") {
    val m = java.util.regex.Pattern.compile(BpeOps.PreTokenPattern)
    def pre(s: String): List[String] = {
      val it = m.matcher(s)
      val out = scala.collection.mutable.ListBuffer.empty[String]
      while (it.find()) out += it.group()
      out.toList
    }
    assert(pre("café au lait") === List("café", "au", "lait"))
    assert(pre("привет мир") === List("привет", "мир"))
    assert(pre("漢字だよ") === List("漢字だよ")) // CJK letters form one run
    assert(pre("東京 2020 大会") === List("東京", "2", "0", "2", "0", "大会"))
    assert(pre("don't stop") === List("don", "'", "t", "stop"))
    assert(pre("½①") === List("½", "①")) // Nl/No numerals are \p{N}: one each
    assert(pre("𝔘nicode") === List("𝔘nicode")) // astral letter joins the run
    // merges operate on whole non-Latin words now — "пр" can merge
    val toks = kernelEncode("привет привет", Seq("п" -> "р"), mark = false)
    assert(toks.take(1) === List("пр") && toks.length === 10)
  }

  test("space marking reassembles normalized text exactly") {
    val texts = Seq("the quick, brown fox!", "don't 3.14 x-y", "a  b\tc")
    for (t <- texts) {
      val n = TextOps.normalizeText(lit(t))
      val norm = spark.range(1).select(n.as("t")).head().getString(0)
      assert(kernelEncode(norm, BpeProbes.FixedMerges).mkString === norm)
    }
  }

  test("compile rejects non-well-formed tables loudly") {
    val e = intercept[IllegalArgumentException] {
      BpeOps.compile(Seq("th" -> "e")) // "th" produced by no earlier merge
    }
    assert(e.getMessage.contains("not well-formed"))
    intercept[IllegalArgumentException] { BpeOps.compile(Seq("" -> "a")) }
    // duplicate pair at a later rank is legal (it can simply never fire)
    BpeOps.compile(Seq("a" -> "b", "a" -> "b"))
  }

  test("compiled tables survive serialization (executor shipping)") {
    val t = BpeOps.compile(BpeProbes.FixedMerges)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(t)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[BpeOps.BpeTable]
    import org.apache.spark.unsafe.types.UTF8String
    assert(BpeOps.encode(UTF8String.fromString("the theater"), back, true)
      .numElements() === 4)
  }

  // --- trainer vs naive twin ---------------------------------------------

  test("distributed trainer equals the instance-level naive trainer") {
    import spark.implicits._
    val docs = Seq(
      "the theater there then", "in the inn and the end",
      "banana bandana and sandals", "ing ing ing going singing",
      "low lower lowest newest widest")
    val got = Bpe.train(docs.toDF("text"), numMerges = 15)
    val want = naiveTrain(docs, 15)
    assert(got === want)
  }

  test("trainer tie-break is UTF-8 byte order, trainer output is well-formed") {
    import spark.implicits._
    // "xy" and "yx" pairs tie at 2 each; byte order picks (x,y)
    val docs = Seq("xy", "xy", "yx", "yx")
    val got = Bpe.train(docs.toDF("text"), numMerges = 1)
    assert(got === Seq("x" -> "y"))
    BpeOps.compile(Bpe.train(docs.toDF("text"), numMerges = 4)) // must not throw
  }

  test("maxWordTypes cap: deterministic truncation, loud warning, well-formed output") {
    import spark.implicits._
    // counts: aa=3, bb=2, cc/dd/ee/ff/gg=1 → the cap keeps the
    // deterministic top-3 by (count desc, word asc): aa, bb, cc
    val docs = Seq("aa bb aa cc dd", "ee ff gg bb aa").toDF("text")
    val got = Bpe.train(docs, numMerges = 5, maxWordTypes = 3)
    assert(Option(Bpe.lastCapWarning.get()).exists(_.contains("maxWordTypes=3")))
    assert(got === Bpe.trainOnDict(
      Array("aa" -> 3L, "bb" -> 2L, "cc" -> 1L), numMerges = 5))
    BpeOps.compile(got) // capped training still yields a well-formed table
    // uncapped run clears the warning
    Bpe.train(docs, numMerges = 1, maxWordTypes = 100)
    assert(Bpe.lastCapWarning.get() === null)
    // per-call, not process-global: a concurrent capped train on
    // ANOTHER thread must not clobber this thread's cleared state
    val other = new Thread(() =>
      Bpe.train(docs, numMerges = 1, maxWordTypes = 3))
    other.start(); other.join()
    assert(Bpe.lastCapWarning.get() === null,
      "another thread's cap warning leaked across threads")
  }

  test("bpe_unmap: out-of-alphabet input yields null (decoder stance), not a throw") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    GraftExtensions.register(spark)
    // kernel level: damage → null, valid text still round-trips
    assert(BpeOps.unmap(UTF8String.fromString("世")) === null)
    assert(BpeOps.unmap(UTF8String.fromString("ab cd")) === null)
    assert(BpeOps.unmap(UTF8String.fromString("ab")).toString === "ab")
    // SQL/codegen level: one damaged row nulls; others decode
    val rows = Seq((1L, BpeOps.byteInit("ok fine").mkString),
      (2L, "raw 世界 never byte-mapped"), (3L, null: String))
      .toDF("id", "s")
      .selectExpr("id", "bpe_unmap(s) AS t")
      .orderBy("id").collect()
    assert(rows(0).getString(1) === "ok fine")
    assert(rows(1).isNullAt(1), "damaged row must null, not abort the job")
    assert(rows(2).isNullAt(1))
  }

  test("minPairCount stops training; merges persist through a DataFrame round-trip") {
    import spark.implicits._
    val docs = Seq("ab ab ab", "cd")
    val got = Bpe.train(docs.toDF("text"), numMerges = 10, minPairCount = 2L)
    assert(got === Seq("a" -> "b")) // (c,d) occurs once, below the floor
    val df = Bpe.mergesDF(spark, BpeProbes.FixedMerges)
    assert(Bpe.readMerges(df) === BpeProbes.FixedMerges)
  }

  // --- column API + chunking edges ---------------------------------------

  test("tokenCount: null text stays null, empty text counts zero") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq((1L, "the cat"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        Bpe.tokenCount(col("text"), BpeProbes.FixedMerges).as("n"))
    val got = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(got === Map(1L -> 3, 2L -> 0, 3L -> -1)) // "the cat" → the|c|at
  }

  test("chunkByTokens: short/empty docs yield one chunk, offsets and overlap exact") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Seq(
      (1L, "the " * 20),            // 20 tokens of " the"
      (2L, "tiny"),
      (3L, ""),
      (4L, null: String)).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.normalizeText(coalesce(col("text"), lit(""))).as("text"))
    val out = Bpe.chunkByTokens(docs, BpeProbes.FixedMerges, size = 8, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val byDoc = out.groupBy(_._1)
    // doc 1: 20 tokens, stride 6 → ceil(12/6)+1 = 3 chunks
    assert(byDoc(1L).length === 3)
    assert(byDoc(1L).map(c => (c._2, c._3)).sorted.toSeq === Seq((0, 0), (1, 6), (2, 12)))
    assert(byDoc(1L).forall(c => c._4 === 8 && c._5 === ("the " * 8).trim))
    // chunk 1 starts mid-doc: its text must NOT begin with a space
    assert(byDoc(1L).forall(!_._5.startsWith(" ")))
    // docs 2-4: exactly one chunk each
    assert(byDoc(2L).toSeq === Seq((2L, 0, 0, 3, "tiny"))) // t|in|y
    assert(byDoc(3L).toSeq === Seq((3L, 0, 0, 0, "")))
    assert(byDoc(4L).toSeq === Seq((4L, 0, 0, 0, "")))
  }

  test("chunkByTokens: exact-fit doc yields exactly one chunk") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text") // 4 tokens
    val out = Bpe.chunkByTokens(docs, BpeProbes.FixedMerges, size = 4, overlap = 1)
    assert(out.count() === 1)
    assert(out.head().getString(4) === "a b c d")
  }

  test("chunkByTokens refuses a byte-level-trained merge table") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Seq((1L, "café society")).toDF("doc_id", "text")
    // the space mark Ġ (U+0120) is in every realistic byte-level table
    val e = intercept[IllegalArgumentException] {
      Bpe.chunkByTokens(docs, Seq(("Ġ", "s")), size = 4)
    }
    assert(e.getMessage.contains("byte-level"))
    // char-level tables with non-ASCII (but unmapped) chars still pass
    val charMerges = Bpe.train(docs, numMerges = 5)
    assert(Bpe.chunkByTokens(docs, charMerges, size = 4).count() > 0)
  }

  // --- token ids -----------------------------------------------------------

  test("tokenIds: ids round-trip through the vocabulary, UNK is -1") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Seq((1L, "the cat"), (2L, "zzz 世")).toDF("doc_id", "text")
    val base = Bpe.baseChars(docs)
    assert(base === base.sorted) // byte order for ASCII == natural order here...
    val voc = Bpe.vocab(base, BpeProbes.FixedMerges)
    val got = docs
      .select(col("doc_id"), Bpe.tokenIds(col("text"), BpeProbes.FixedMerges, voc).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // decode back through the vocab and compare to the string encode
    val dec1 = got(1L).map(voc(_))
    assert(dec1 === kernelEncode("the cat", BpeProbes.FixedMerges, mark = false))
    assert(got(2L).forall(_ >= 0)) // 世 is in the base alphabet (same corpus)
    // a vocabulary missing the corpus alphabet yields -1, not a crash
    val tiny = Bpe.vocab(Seq("t", "h", "e"), Seq("t" -> "h", "th" -> "e"))
    val unk = docs.where($"doc_id" === 1L)
      .select(Bpe.tokenIds(col("text"), Seq("t" -> "h", "th" -> "e"), tiny).as("ids"))
      .head().getSeq[Int](0)
    assert(unk.head >= 0 && unk.count(_ == -1) === 2) // "the","t" known; c,a unknown
  }

  test("detokenize inverts space-marked tokens; null stays null") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Seq((1L, "the cat, isn't here 42 times"), (2L, null: String))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        Bpe.detokenize(Bpe.tokens(col("text"), BpeProbes.FixedMerges,
          spaceMark = true)).as("rt"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some("the cat, isn't here 42 times"))
    assert(out(2L) === None)
  }

  test("vocabulary: duplicate tokens are refused") {
    val e = intercept[IllegalArgumentException] {
      new graft.expressions.BpeVocab(Array("a", "b", "a")).ids
    }
    assert(e.getMessage.contains("duplicate token"))
  }

  // --- byte level ---------------------------------------------------------

  test("byte-level mapping: published GPT-2 anchors pin the table") {
    assert(BpeOps.ByteToChar(0x20) === "Ġ") // space → Ġ
    assert(BpeOps.ByteToChar(0x0A) === "Ċ") // newline → Ċ
    assert(BpeOps.ByteToChar('a'.toInt) === "a") // printable ASCII fixed
    assert(BpeOps.ByteToChar(0xC3) === "Ã") // Latin-1 printable fixed
    assert(BpeOps.CharToByte.count(_ >= 0) === 256) // bijection
    // multi-byte chars split into one mapped unit per UTF-8 byte
    assert(BpeOps.byteInit("é").length === 2)
    assert(BpeOps.byteInit("世").length === 3)
    assert(BpeOps.byteInit("🙂").length === 4)
    // unmap inverts, including astral text and spaces
    import org.apache.spark.unsafe.types.UTF8String
    val t = "café 世界 🙂 done"
    assert(BpeOps.unmap(
      UTF8String.fromString(BpeOps.byteInit(t).mkString)).toString === t)
  }

  test("byte-level merges fuse bytes across character boundaries; round trip is exact") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Seq((1L, "café café"), (2L, "世界 the 世界"), (3L, "plain ascii"),
      (4L, null: String)).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
        Bpe.tokens(col("text"), BpeProbes.FixedByteMerges,
          spaceMark = false, byteLevel = true).as("toks"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    // é's two mapped bytes fused into ONE token by the (Ã,©)-rank merge
    val eTok = graft.operators.BpeProbes.bm("é")
    assert(toks(1L) === Seq("c", "a", "f", eTok, "c", "a", "f", eTok))
    // 世's three bytes fused; 界's three stay single units (no merge)
    assert(toks(2L).take(4) === Seq(graft.operators.BpeProbes.bm("世")) ++
      BpeOps.byteInit("界"))
    assert(toks(4L) === null)
    // byte-level lossless round trip incl. the Ġ space mark
    val rt = docs.where(col("text").isNotNull).select(col("doc_id"),
        Bpe.detokenizeBytes(Bpe.tokens(col("text"), BpeProbes.FixedByteMerges,
          spaceMark = true, byteLevel = true)).as("rt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt === Map(1L -> "café café", 2L -> "世界 the 世界",
      3L -> "plain ascii"))
  }

  test("byte-level trainer learns byte-crossing merges; ids use the fixed 256 base") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Seq("ééé ééé", "ééé").toDF("text")
    val merges = Bpe.train(docs, numMerges = 2, byteLevel = true)
    val e = BpeOps.byteInit("é")
    // most frequent pair is é's byte pair; next fuses éé
    assert(merges.head === (e(0) -> e(1)))
    assert(merges(1) === (e.mkString -> e.mkString))
    // ids over the corpus-independent 256-char base: no UNK possible
    val voc = Bpe.vocab(Bpe.byteBase, merges)
    val ids = docs.select(Bpe.tokenIds(col("text"), merges, voc,
        byteLevel = true).as("ids"))
      .collect().flatMap(_.getSeq[Int](0))
    assert(ids.forall(_ >= 0))
  }

  // --- plan shape ---------------------------------------------------------

  test("bpe_tokens projection is map-only: no exchange, codegen'd") {
    GraftExtensions.register(spark)
    val df = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), Bpe.tokens(col("text"), BpeProbes.FixedMerges).as("toks"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1) Project"), plan) // inside whole-stage codegen
  }
}
