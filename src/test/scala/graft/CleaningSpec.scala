package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Edge-case certification for the corpus-cleaning rule operators the
  * oracle probes (x82/x83) sample statistically: C4 line/page rules one
  * by one at their boundaries, and frequency-threshold boilerplate
  * removal against a hand-checked corpus.
  */
class CleaningSpec extends SparkTestBase {

  private def sigRow(text: String, bad: Seq[String] = Nil,
                     minWords: Int = 3, minSent: Int = 5): Row = {
    import spark.implicits._
    TextOps.c4Signals(Seq((1L, text)).toDF("doc_id", "text"),
      badWords = bad, minWordsPerLine = minWords, minSentences = minSent)
      .head()
  }
  private def clean(text: String): String =
    sigRow(text).getAs[String]("clean_text")

  // --- C4 line rules ------------------------------------------------------

  test("c4: lines kept only with terminal punctuation") {
    val t = "good solid line.\nalso fine here!\nquestion line maybe?\n" +
      "quoted line ends\"\nno terminal punct\ntrailing comma line,"
    assert(clean(t) ===
      "good solid line.\nalso fine here!\nquestion line maybe?\nquoted line ends\"")
  }

  test("c4: minimum words per line") {
    val t = "one two three.\ntwo words.\nshort."
    assert(clean(t) === "one two three.")
    val r = sigRow("a b.\nc d.", minWords = 2)
    assert(r.getAs[String]("clean_text") === "a b.\nc d.")
  }

  test("c4: javascript word rule respects boundaries") {
    assert(clean("Please enable JavaScript to continue.") === "")
    assert(clean("use javascript: alert right now.") === "")
    // no boundary → not the word → kept
    assert(clean("the javascripty library rocks today.") ===
      "the javascripty library rocks today.")
  }

  test("c4: lines are trimmed before evaluation and reassembly") {
    assert(clean("   padded line here.   \nplain line stays.") ===
      "padded line here.\nplain line stays.")
  }

  // --- C4 page rules ------------------------------------------------------

  test("c4: lorem ipsum page drop is case-insensitive") {
    val r = sigRow("LOREM IPSUM dolor sit amet.", minSent = 1)
    assert(r.getAs[Boolean]("has_lorem") && !r.getAs[Boolean]("keep"))
  }

  test("c4: either curly bracket drops the page") {
    assert(sigRow("clean page without braces here.").getAs[Boolean]("has_brace") === false)
    assert(sigRow("open { only").getAs[Boolean]("has_brace"))
    assert(sigRow("close } only").getAs[Boolean]("has_brace"))
  }

  test("c4: bad-word matching is token-exact on the raw page") {
    val bad = Seq("badword7")
    // punctuation-adjacent still a token hit
    assert(sigRow("we said badword7.", bad = bad).getAs[Boolean]("has_bad_word"))
    // substring of a longer token is NOT a hit
    assert(!sigRow("we said xbadword7 aloud.", bad = bad).getAs[Boolean]("has_bad_word"))
    // raw-page rule: the word counts even on a line the line rules drop
    assert(sigRow("badword7", bad = bad).getAs[Boolean]("has_bad_word"))
    // empty list never hits
    assert(!sigRow("anything at all.").getAs[Boolean]("has_bad_word"))
  }

  test("c4: sentence floor counts terminal marks in the CLEANED text") {
    // the dropped no-punct line contributes nothing; 2 marks < 3
    val r = sigRow("first sentence here. second one follows!\nno punct filler",
      minSent = 3)
    assert(r.getAs[Long]("n_sentences") === 2L && !r.getAs[Boolean]("keep"))
    val r2 = sigRow("first sentence here. second one follows! third arrives?",
      minSent = 3)
    assert(r2.getAs[Long]("n_sentences") === 3L && r2.getAs[Boolean]("keep"))
  }

  test("c4Filter: keeps surviving pages' other columns, rewrites text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a keeper page right here. with two sentences kept!", "web"),
      (2L, "has a brace { so the page drops. even with sentences!", "web"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.c4Filter(docs, minSentences = 2).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("doc_id") === 1L)
    assert(out.head.getAs[String]("source") === "web")
    assert(out.head.getAs[String]("text") ===
      "a keeper page right here. with two sentences kept!")
  }

  test("c4Signals plan is map-only (zero exchanges)") {
    import spark.implicits._
    val docs = Seq((1L, "x.")).toDF("doc_id", "text")
    val p = TextOps.c4Signals(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("HashAggregate"),
      s"c4Signals must be a pure projection:\n$p")
  }

  // --- lineFrequencyFilter ------------------------------------------------

  private def freqCorpus = {
    import spark.implicits._
    Seq(
      (0L, "unique zero\nshared footer\npair a\n\nsolo"),
      (1L, "unique one\nshared footer\npair a\n\nsolo two"),
      (2L, "unique two\nshared footer\nother\n\nsolo three"),
      (3L, "unique three\nshared footer\nother two\n\nsolo four"))
      .toDF("doc_id", "text")
  }

  test("lineFrequencyFilter: threshold boundary — df >= minDocs drops everywhere") {
    val out = TextOps.lineFrequencyFilter(freqCorpus, minDocs = 3)
      .orderBy("doc_id").collect()
    // 'shared footer' df=4 >= 3 → gone from ALL docs (no first-keeper)
    assert(out.forall(!_.getAs[String]("clean_text").contains("shared footer")))
    // 'pair a' df=2 < 3 → kept in both
    assert(out(0).getAs[String]("clean_text").contains("pair a"))
    assert(out(1).getAs[String]("clean_text").contains("pair a"))
    // blank separator line (trivial) survives everywhere
    assert(out.forall(_.getAs[String]("clean_text").contains("\n\n")))
    assert(out(0).getAs[String]("clean_text") === "unique zero\npair a\n\nsolo")
    assert(out(0).getAs[Long]("n_kept") === 4L)
    assert(out(0).getAs[Long]("n_dropped") === 1L)
  }

  test("lineFrequencyFilter: at minDocs=2 the pair line also drops") {
    val out = TextOps.lineFrequencyFilter(freqCorpus, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") === "unique zero\n\nsolo")
    assert(out(1).getAs[String]("clean_text") === "unique one\n\nsolo two")
  }

  test("lineFrequencyFilter: all-dropped doc yields empty text, counts intact") {
    import spark.implicits._
    val docs = Seq(
      (0L, "common line"), (1L, "common line"), (2L, "common line"))
      .toDF("doc_id", "text")
    val out = TextOps.lineFrequencyFilter(docs, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[String]("clean_text") === ""))
    assert(out.forall(_.getAs[Long]("n_kept") === 0L))
    assert(out.forall(_.getAs[Long]("n_dropped") === 1L))
  }

  test("lineFrequencyFilter: within-doc repeats count once toward df") {
    import spark.implicits._
    // 'rep' appears 3× in ONE doc: distinct-doc frequency is 1 → kept
    val docs = Seq((0L, "rep\nrep\nrep"), (1L, "other line"))
      .toDF("doc_id", "text")
    val out = TextOps.lineFrequencyFilter(docs, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") === "rep\nrep\nrep")
  }

  // --- duplicationWeights (soft dedup) ------------------------------------

  test("duplicationWeights: every copy kept, weights sum to one per text") {
    import spark.implicits._
    val docs = Seq((1L, "dup"), (2L, "dup"), (3L, "dup"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.duplicationWeights(docs)
      .orderBy("doc_id").collect()
    assert(out.length === 4) // nothing dropped
    assert(out.take(3).forall(r => r.getAs[Long]("n_copies") === 3L &&
      r.getAs[Double]("weight") === 1.0 / 3))
    assert(out(3).getAs[Double]("weight") === 1.0)
    // expected mass of the duplicated content = one copy
    val mass = out.filter(_.getAs[String]("text") == "dup")
      .map(_.getAs[Double]("weight")).sum
    assert(math.abs(mass - 1.0) < 1e-12)
  }

  // --- chunkBySentences ---------------------------------------------------

  test("chunkBySentences never splits a sentence and packs by offset") {
    import spark.implicits._
    // sentences of 10 chars each ("aaaaaaaaa."), budget 25:
    // cum_before 0,10,20 → chunk 0; 30,40 → chunk 1
    val text = (1 to 5).map(_ => "aaaaaaaaa.").mkString(" ")
    val out = graft.operators.TextOps.chunkBySentences(
        Seq((1L, text)).toDF("doc_id", "text"), size = 25)
      .orderBy("chunk_idx").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("chunk") ===
      "aaaaaaaaa. aaaaaaaaa. aaaaaaaaa.")
    assert(out(0).getAs[Long]("n_sentences") === 3L)
    assert(out(1).getAs[Long]("n_sentences") === 2L)
    // a chunk may overflow the budget by at most one sentence
    assert(out.forall(_.getAs[Int]("chunk_chars") < 25 + 11))
  }

  test("chunkBySentences: oversized single sentence stays whole") {
    import spark.implicits._
    val out = graft.operators.TextOps.chunkBySentences(
      Seq((1L, ("long " * 30).trim + ".")).toDF("doc_id", "text"), size = 20)
      .collect()
    assert(out.length === 1 && out.head.getAs[Int]("chunk_chars") === 150)
  }

  test("chunkBySentences: no sentence content emits no chunks") {
    import spark.implicits._
    val docs = Seq((1L, "..."), (2L, ""), (3L, "real sentence here."))
      .toDF("doc_id", "text")
    val out = graft.operators.TextOps.chunkBySentences(docs, size = 50)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(3L))
  }

  // --- CorpusArtifact -----------------------------------------------------

  test("clean artifact: keep=true arrives as a PartitionFilter, not a row filter") {
    import spark.implicits._
    import graft.operators.CorpusArtifact
    val docs = (1L to 40L).map(i => (i, s"doc $i text here.", i % 3 == 0))
      .toDF("doc_id", "text", "keep")
    val dir = java.nio.file.Files.createTempDirectory("graft_artifact").toString
    CorpusArtifact.write(docs, dir, "graft_test_artifact", nShards = 4)
    val kept = CorpusArtifact.readKept(spark, "graft_test_artifact")
    val p = kept.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*keep".r.findFirstIn(p).isDefined,
      s"keep decision rescanned as a row filter:\n$p")
    // round trip: exactly the keep=true rows, all columns intact
    val got = kept.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    val want = docs.where(col("keep")).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === want)
    // shards deterministic + bounded
    val shards = kept.select(col("shard").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(shards.forall(s => s >= 0 && s < 4))
    spark.sql("DROP TABLE IF EXISTS graft_test_artifact")
  }

  test("clean artifact: overwrite replaces, shard function is stable") {
    import spark.implicits._
    import graft.operators.CorpusArtifact
    val a = Seq((1L, "one.", true), (2L, "two.", false))
      .toDF("doc_id", "text", "keep")
    val dir = java.nio.file.Files.createTempDirectory("graft_artifact2").toString
    CorpusArtifact.write(a, dir, "graft_test_artifact2", nShards = 4)
    val s1 = CorpusArtifact.readKept(spark, "graft_test_artifact2")
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    // grow the corpus: existing ids keep their shard (no migration)
    val b = a.union(Seq((3L, "three.", true)).toDF("doc_id", "text", "keep"))
    CorpusArtifact.write(b, dir, "graft_test_artifact2", nShards = 4)
    val s2 = CorpusArtifact.readKept(spark, "graft_test_artifact2")
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(s2(1L) === s1(1L))
    assert(s2.keySet === Set(1L, 3L))
    spark.sql("DROP TABLE IF EXISTS graft_test_artifact2")
  }

  test("clean artifact: append == rebuild-with-union; markers gate replays") {
    import spark.implicits._
    import graft.operators.CorpusArtifact
    val a = (1L to 20L).map(i => (i, s"doc $i.", i % 3 == 0))
      .toDF("doc_id", "text", "keep")
    val b = (21L to 30L).map(i => (i, s"doc $i.", i % 3 == 0))
      .toDF("doc_id", "text", "keep")
    // appended artifact
    val dirA = java.nio.file.Files.createTempDirectory("graft_art_app").toString
    CorpusArtifact.write(a, dirA, "graft_art_app", nShards = 4)
    CorpusArtifact.append(b, dirA, "graft_art_app")
    // rebuilt-with-union artifact
    val dirB = java.nio.file.Files.createTempDirectory("graft_art_all").toString
    CorpusArtifact.write(a.union(b), dirB, "graft_art_all", nShards = 4)
    def snap(t: String) = spark.table(t)
      .select(col("doc_id"), col("text"), col("keep"),
        col("shard").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(snap("graft_art_app") === snap("graft_art_all"))
    // appended keep=true rows still arrive via PartitionFilters
    val p = CorpusArtifact.readKept(spark, "graft_art_app")
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*keep".r.findFirstIn(p).isDefined, p)
    // marker-gated replay: same batch + same marker is a no-op
    CorpusArtifact.append(b, dirA, "graft_art_app",
      doneMarker = Some("mb1"))
    val n1 = spark.table("graft_art_app").count()
    CorpusArtifact.append(b, dirA, "graft_art_app",
      doneMarker = Some("mb1"))
    assert(spark.table("graft_art_app").count() === n1,
      "marked replay must not re-append")
    spark.sql("DROP TABLE IF EXISTS graft_art_app")
    spark.sql("DROP TABLE IF EXISTS graft_art_all")
  }

  test("clean artifact append: quoted partition values can't break the ALTER") {
    import spark.implicits._
    import graft.operators.CorpusArtifact
    // a non-boolean decision column whose values are arbitrary text —
    // quotes and backslashes must survive the ADD PARTITION round-trip
    val a = Seq((1L, "one.", "plain"), (2L, "two.", "plain"))
      .toDF("doc_id", "text", "bucket")
    val b = Seq((3L, "three.", "it's"), (4L, "four.", "back\\slash"))
      .toDF("doc_id", "text", "bucket")
    val dir = java.nio.file.Files.createTempDirectory("graft_art_q").toString
    CorpusArtifact.write(a, dir, "graft_art_q", nShards = 2,
      keepCol = "bucket")
    CorpusArtifact.append(b, dir, "graft_art_q", keepCol = "bucket")
    val got = spark.table("graft_art_q")
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "plain", 2L -> "plain",
      3L -> "it's", 4L -> "back\\slash"))
    // a keepCol that is not a plain identifier is rejected up front
    assertThrows[IllegalArgumentException](
      CorpusArtifact.append(b, dir, "graft_art_q",
        keepCol = "bucket', shard='0') LOCATION '/tmp/evil' --"))
    // null decision or null id (→ null shard) fails fast BEFORE the
    // data write — a post-commit failure would leave the batch
    // half-registered and replayable
    val nBefore = spark.table("graft_art_q").count()
    assertThrows[IllegalArgumentException](CorpusArtifact.append(
      Seq((5L, "five.", null: String)).toDF("doc_id", "text", "bucket"),
      dir, "graft_art_q", keepCol = "bucket"))
    assertThrows[IllegalArgumentException](CorpusArtifact.append(
      Seq((null.asInstanceOf[java.lang.Long], "six.", "plain"))
        .toDF("doc_id", "text", "bucket"),
      dir, "graft_art_q", keepCol = "bucket"))
    assert(spark.table("graft_art_q").count() === nBefore,
      "a rejected batch must not have committed any rows")
    spark.sql("DROP TABLE IF EXISTS graft_art_q")
  }

  test("lineFrequencyFilter plan: no product joins, distinct agg partials map-side") {
    val p = TextOps.lineFrequencyFilter(freqCorpus, minDocs = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"product join in lineFrequencyFilter:\n$p")
    // the count_distinct plans as two keyed stages with map-side partials
    assert(p.contains("partial_count(distinct") || p.contains("HashAggregate"),
      s"expected two-stage distinct aggregation:\n$p")
  }
}
