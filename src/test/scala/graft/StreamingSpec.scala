package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.ForecastStream
import graft.streaming.ForecastStream.{StormObs, StormState}

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("transition function: escalation flags a change, repeat does not") {
    val s0 = ForecastStream.transition(None,
      Seq(StormObs("S", ts("2024-01-01 00:00:00"), 1)))
    assert(s0.get.landfall_code == 1 && s0.get.changed)
    val s1 = ForecastStream.transition(s0,
      Seq(StormObs("S", ts("2024-01-01 06:00:00"), 1)))
    assert(!s1.get.changed)
    val s2 = ForecastStream.transition(s1,
      Seq(StormObs("S", ts("2024-01-01 12:00:00"), 2)))
    assert(s2.get.landfall_code == 2 && s2.get.changed)
    // empty batch leaves state untouched
    assert(ForecastStream.transition(s2, Nil) == s2)
  }

  test("new-cycle file stream picks up landed files exactly once") {
    val landing = Files.createTempDirectory("graft_landing").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val schema = StructType(Seq(
      StructField("storm_id", StringType), StructField("cycle", StringType),
      StructField("lat", DoubleType)))

    Seq(("S1", "2024010100", 14.0), ("S1", "2024010100", 14.5))
      .toDF("storm_id", "cycle", "lat").write.mode("append").parquet(landing)

    val stream = ForecastStream.trackFileStream(spark, landing, schema)
      .groupBy("cycle").agg(count(lit(1)).as("n"))
    val got1 = ForecastStream.runAvailableNow(stream, "cycles1", ckpt, "complete")
    assert(got1.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("2024010100", 2L)))

    // next cron tick: a new cycle lands; same checkpoint → only new rows flow
    Seq(("S1", "2024010106", 15.0)).toDF("storm_id", "cycle", "lat")
      .write.mode("append").parquet(landing)
    val stream2 = ForecastStream.trackFileStream(spark, landing, schema)
      .groupBy("cycle").agg(count(lit(1)).as("n"))
    val got2 = ForecastStream.runAvailableNow(stream2, "cycles2", ckpt, "complete")
    val m = got2.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m == Map("2024010100" -> 2L, "2024010106" -> 1L))
  }

  test("landfall state stream over a storm lifecycle") {
    val ckpt = Files.createTempDirectory("graft_ckpt2").toString
    val obs = Seq(
      StormObs("A", ts("2024-01-01 00:00:00"), 1),
      StormObs("A", ts("2024-01-01 06:00:00"), 2),
      StormObs("B", ts("2024-01-01 00:00:00"), 60)).toDS()
    // batch-drive the same transition the stream uses
    val states = ForecastStream.landfallStateStream(obs)
    // mapGroupsWithState on a batch Dataset executes directly
    val got = states.collect().map(s => s.storm_id -> s.landfall_code).toMap
    assert(got == Map("A" -> 2, "B" -> 60))
  }

  test("foreachBatch cycle pipeline: batch code drives each landed cycle exactly once") {
    val landing = Files.createTempDirectory("graft_cycles").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_fb").toString
    val schema = StructType(Seq(
      StructField("storm_id", StringType), StructField("pcode", StringType),
      StructField("dmg", DoubleType)))
    Seq(("S1", "PH001", 5.0), ("S1", "PH002", 7.0))
      .toDF("storm_id", "pcode", "dmg").write.mode("append").parquet(landing)

    var payloads = Vector.empty[String]
    val stream = ForecastStream.trackFileStream(spark, landing, schema)
    ForecastStream.runCyclePipeline(stream, ckpt) { (batch, _) =>
      // the same BATCH payload-assembly code runs per cycle
      val values = batch.select(col("pcode").as("placeCode"), col("dmg").as("amount"))
      payloads ++= graft.publish.Payloads
        .exposureLayer(values, "houses_affected", "24-hour", "S1")
        .collect().map(_.getString(0))
    }
    assert(payloads.length == 1 && payloads.head.contains("PH002"))

    // second run, same checkpoint, no new files → no new batch work
    val before = payloads.length
    ForecastStream.runCyclePipeline(
      ForecastStream.trackFileStream(spark, landing, schema), ckpt) { (batch, _) =>
      if (!batch.isEmpty) payloads :+= "unexpected"
    }
    assert(payloads.length == before)
  }

  test("streaming dedup drops in-watermark duplicate documents, keeps state bounded") {
    val landing = Files.createTempDirectory("graft_docs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt4").toString
    Seq(
      (ts("2024-01-01 00:00:00"), 1L, "alpha document text"),
      (ts("2024-01-01 00:01:00"), 2L, "beta document text"),
      (ts("2024-01-01 00:02:00"), 3L, "alpha document text"), // dup of 1
      (ts("2024-01-01 00:03:00"), 4L, "gamma document text"),
      (ts("2024-01-01 00:04:00"), 5L, "beta document text"))  // dup of 2
      .toDF("ts", "doc_id", "text").write.mode("append").parquet(landing)
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("doc_id", LongType),
      StructField("text", StringType)))
    val deduped = ForecastStream.dedupDocumentStream(
      ForecastStream.trackFileStream(spark, landing, schema))
    // exactly one survivor per distinct text; WHICH of the duplicate
    // rows survives within a microbatch is row-order-dependent
    val got = ForecastStream.runAvailableNow(deduped, "doc_dedup", ckpt, "append")
      .select("text").collect().map(_.getString(0))
    assert(got.length == 3)
    assert(got.toSet ==
      Set("alpha document text", "beta document text", "gamma document text"))
  }

  test("grouped top-k heap runs as a streaming aggregation and equals batch") {
    GraftExtensions.register(spark)
    val landing = Files.createTempDirectory("graft_topk").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_topk").toString
    val rows = Seq(
      ("a", 3.0, 1L), ("a", 5.0, 2L), ("a", 5.0, 3L), ("a", 1.0, 4L),
      ("b", 2.0, 5L), ("b", 9.0, 6L))
    // two files -> two microbatches exercise the heap's state
    // merge across batches, not just within one
    rows.take(3).toDF("g", "score", "id").write.mode("append").parquet(landing)
    rows.drop(3).toDF("g", "score", "id").write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("score", DoubleType), StructField("id", LongType)))
    def topk(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"g")
      .agg(call_function("top_k_struct",
        struct($"score", $"id"), lit(2), lit(true)).as("tk"))
    val streamed = ForecastStream.runAvailableNow(
      topk(spark.readStream.schema(schema).parquet(landing)),
      "topk_stream", ckpt, "complete")
      .select($"g", $"tk".cast("array<struct<score:double,id:bigint>>"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    val batch = topk(spark.read.schema(schema).parquet(landing))
      .select($"g", $"tk".cast("array<struct<score:double,id:bigint>>"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(streamed == batch)
    assert(streamed("a") == Seq((5.0, 2L), (5.0, 3L))) // desc, id tie-break
    assert(streamed("b") == Seq((9.0, 6L), (2.0, 5L)))
  }

  test("map-only curation ops run unchanged on a stream and equal the batch result") {
    GraftExtensions.register(spark)
    val landing = Files.createTempDirectory("graft_curdocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_cur").toString
    val rows = Seq(
      (1L, "the quick brown fox the quick brown fox"),
      (2L, "completely unique words appear exactly once here"),
      (3L, "aaa aaa aaa aaa aaa"))
    rows.toDF("doc_id", "text").write.mode("append").parquet(landing)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    // stateless projections compose on streams with no extra plumbing:
    // curation profile + repetition ratio + split assignment in one pass
    val curated = graft.operators.Sampling.hashSplit(
      graft.operators.TextOps.repetitionRatio(stream).join(
        graft.operators.TextOps.curationProfile(stream)
          .select("doc_id", "ws_tokens"), "doc_id"),
      Seq("train" -> 0.5, "test" -> 0.5))
    val got = ForecastStream.runAvailableNow(curated, "curation", ckpt, "append")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("rep_ratio"), r.getAs[Int]("ws_tokens"), r.getAs[String]("split"))).toMap
    val batch = graft.operators.Sampling.hashSplit(
      graft.operators.TextOps.repetitionRatio(rows.toDF("doc_id", "text")).join(
        graft.operators.TextOps.curationProfile(rows.toDF("doc_id", "text"))
          .select("doc_id", "ws_tokens"), "doc_id"),
      Seq("train" -> 0.5, "test" -> 0.5))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("rep_ratio"), r.getAs[Int]("ws_tokens"), r.getAs[String]("split"))).toMap
    assert(got === batch)
    assert(got(3L)._1 > 0.7)  // degenerate repetition caught on the stream

    // the r5 map-only ops compose on the same stream identically:
    // Gopher repetition signals + source-mixture filtering
    val ckpt2 = Files.createTempDirectory("graft_ckpt_cur2").toString
    val mixed = graft.operators.Sampling.deterministicMixture(
      graft.operators.TextOps.gopherRepetitionSignals(stream)
        .withColumn("source", lit("web")),
      Map("web" -> 1.0))
    val gotG = ForecastStream.runAvailableNow(mixed, "gopher", ckpt2, "append")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("top_bigram_frac")).toMap
    val batchG = graft.operators.TextOps.gopherRepetitionSignals(
        rows.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("top_bigram_frac")).toMap
    assert(gotG === batchG)
    assert(gotG(3L) === 1.0)  // "aaa aaa ..." → one bigram dominates
  }

  test("blocklist filter, BPE token chunking compose on a stream and equal batch") {
    GraftExtensions.register(spark)
    val landing = Files.createTempDirectory("graft_bpedocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_bpe").toString
    val rows = Seq(
      (1L, "the theater is there tonight", "https://good.com/a"),
      (2L, "don't stop me now", "https://ads.spam.com/b"), // blocked
      (3L, "in the end it matters " * 8, "https://fine.org/c"),
      (4L, "x", null: String))                             // null url keeps
    rows.toDF("doc_id", "text", "url").write.mode("append").parquet(landing)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("url", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    // x47 (map-only predicate form) → normalize → x52 token chunking:
    // the whole curation segment is stateless, so it runs on a stream
    // with no extra plumbing and must equal the batch run row-for-row
    def pipe(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Bpe.chunkByTokens(
        df.where(!graft.operators.TextOps.isBlockedDomain(
            col("url"), Seq("spam.com")))
          .select(col("doc_id"),
            graft.operators.TextOps.normalizeText(col("text")).as("text")),
        graft.operators.BpeProbes.FixedMerges, size = 8, overlap = 2)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))
    val got = ForecastStream.runAvailableNow(pipe(stream), "bpe_chunks", ckpt, "append")
      .collect().map(key).toSet
    val batch = pipe(rows.toDF("doc_id", "text", "url")).collect().map(key).toSet
    assert(got === batch)
    assert(!got.exists(_._1 == 2L)) // the blocked doc never reached chunking
    assert(got.exists(_._1 == 4L))  // null url keeps on the stream too

    // x56's id-encode is the same stateless codegen class, so it too
    // must be batch≡stream with no extra plumbing
    val ckptIds = Files.createTempDirectory("graft_ckpt_bpeids").toString
    val voc = graft.operators.Bpe.vocab(
      graft.operators.Bpe.baseChars(rows.toDF("doc_id", "text", "url")),
      graft.operators.BpeProbes.FixedMerges)
    def idPipe(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        graft.operators.Bpe.tokenIds(
          graft.operators.TextOps.normalizeText(col("text")),
          graft.operators.BpeProbes.FixedMerges, voc).as("ids"))
    val gotIds = ForecastStream.runAvailableNow(idPipe(stream), "bpe_ids", ckptIds, "append")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val batchIds = idPipe(rows.toDF("doc_id", "text", "url"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(gotIds === batchIds)
    assert(gotIds.values.forall(_.forall(_ >= 0))) // vocab from same corpus → no UNK
  }

  test("url canonicalization + script profile run unchanged on a stream") {
    val landing = Files.createTempDirectory("graft_urldocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_url").toString
    val rows = Seq(
      (1L, "hello world", "HTTPS://WWW.A.com:443/x/?b=2&utm_source=s&a=1#f"),
      (2L, "привет мир", "http://b.com/p"),
      (3L, "12345", "nope"))
    rows.toDF("doc_id", "text", "url").write.mode("append").parquet(landing)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("url", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    // both ops are pure projections — the curation DAG stays
    // streaming-composable end-to-end
    val gotProfile = ForecastStream.runAvailableNow(
        graft.operators.TextOps.scriptProfile(stream), "scripts", ckpt, "append")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("script")).toMap
    val batchProfile = graft.operators.TextOps.scriptProfile(
        rows.toDF("doc_id", "text", "url"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("script")).toMap
    assert(gotProfile === batchProfile)
    assert(gotProfile(2L) === "cyrillic" && gotProfile(3L) === "none")
    val ckpt2 = Files.createTempDirectory("graft_ckpt_url2").toString
    val gotCanon = ForecastStream.runAvailableNow(
        stream.select(col("doc_id"),
          graft.operators.UrlOps.canonicalizeUrl(col("url")).as("canon")),
        "canon", ckpt2, "append")
      .collect().map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("canon"))).toMap
    assert(gotCanon === Map(
      1L -> Some("https://a.com/x?a=1&b=2"),
      2L -> Some("http://b.com/p"),
      3L -> None))
  }

  test("int8 quantization runs unchanged on a stream and equals batch") {
    val landing = Files.createTempDirectory("graft_int8docs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_int8").toString
    val rows = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),     // zero vector edge
      (3L, Array(3.0f, 4.0f, -5.0f, 1.5f)))
    rows.toDF("vec_id", "embedding").write.mode("append").parquet(landing)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema).parquet(landing)
    // quantizeInt8 is a pure projection — map-only on a stream
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("q_scale"), r.getSeq[Byte](2).toList)).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.Similarity.quantizeInt8(stream), "int8", ckpt, "append"))
    val batch = render(graft.operators.Similarity.quantizeInt8(
      rows.toDF("vec_id", "embedding")))
    assert(got === batch)
    assert(got(2L)._2.forall(_ == 0))
  }

  test("unigram segmentation streams against a trained model") {
    graft.GraftExtensions.register(spark)
    val landing = Files.createTempDirectory("graft_ulmdocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_ulm").toString
    val model = graft.operators.UnigramLm.trainOnTypes(
      Seq(("sing", 50L), ("ring", 40L), ("wing", 30L)),
      vocabSize = 8, maxPieceLen = 3, emRounds = 2, minCount = 2)
    val rows = Seq((1L, "sing wing"), (2L, "ring sing ring"))
    rows.toDF("doc_id", "text").write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_pieces"), r.getAs[String]("seg"))).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.UnigramLm.segmentDocs(stream, model),
      "ulm", ckpt, "append"))
    val batch = render(graft.operators.UnigramLm.segmentDocs(
      rows.toDF("doc_id", "text"), model))
    assert(got === batch && got.size === 2)
    assert(got(1L)._2.contains("ing"))
  }

  test("crawl ingestion streams: WARC files land, cleaned pages append") {
    // the incremental deployment of the x92 DAG: WARC streams arrive
    // in a landing directory; parse → HTTP body → stripHtml → C4 are
    // all per-row (flatMap + projections), so the SAME operator code
    // runs as an append-mode stream with exactly-once file semantics
    val landing = Files.createTempDirectory("graft_warcland").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_warc").toString
    def warcOf(id: Long, html: String): Array[Byte] = {
      val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        html).getBytes("UTF-8")
      graft.sources.Warc.buildRecord("response", s"<urn:uuid:$id>",
        s"http://h.test/$id", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response", http)
    }
    val rows = Seq(
      (1L, warcOf(1L, "<p>A first clean sentence here.</p>" +
        "<p>And then a second one follows!</p>")),
      (2L, warcOf(2L, "<p>Page with lorem ipsum inside it.</p>" +
        "<p>Which must therefore be dropped!</p>")),
      (3L, warcOf(3L, "<p>no terminal punctuation page</p>")))
    rows.toDF("file_id", "content").write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("file_id", LongType),
      StructField("content", BinaryType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    def pipeline(df: org.apache.spark.sql.DataFrame) = {
      val pstr = decode(col("payload"), "UTF-8")
      graft.operators.TextOps.c4Signals(
        graft.sources.Warc.records(df)
          .where(col("warc_type") === "response" && col("parse_ok"))
          .select(col("file_id").as("doc_id"),
            graft.operators.TextOps.stripHtml(
              substring(pstr, instr(pstr, "\r\n\r\n") + 4, lit(1 << 20)))
              .as("text")),
        minSentences = 2)
    }
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Boolean]("keep"))).toMap
    val got = render(ForecastStream.runAvailableNow(
      pipeline(stream), "crawl", ckpt, "append"))
    val batch = render(pipeline(rows.toDF("file_id", "content")))
    assert(got === batch && got.size === 3)
    assert(got(1L)._2 && !got(2L)._2 && !got(3L)._2)
    assert(got(1L)._1 ===
      "A first clean sentence here.\nAnd then a second one follows!")
  }

  test("keyword tagging streams against a compiled automaton") {
    // the dictionary tagger is a pure projection against a
    // driver-compiled automaton — the same operator code tags an
    // unbounded stream (badword filtering as pages land)
    graft.GraftExtensions.register(spark)
    val landing = Files.createTempDirectory("graft_kwdocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_kw").toString
    val rows = Seq((1L, "the fast table scan is fast"),
      (2L, "nothing to see"), (3L, "fast table fast table"))
    rows.toDF("doc_id", "text").write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    val kws = Seq("fast table", "scan")
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getSeq[Int](1).toList, r.getAs[Int]("n_hits"))).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.TextOps.keywordTag(stream, kws), "kw", ckpt, "append"))
    val batch = render(graft.operators.TextOps.keywordTag(
      rows.toDF("doc_id", "text"), kws))
    assert(got === batch)
    assert(got(1L) === (List(1, 1), 2) && got(3L) === (List(2, 0), 2))
  }

  test("perceptual hashing streams over landing media") {
    // phashes is a typed map — zero state, so image fingerprinting
    // runs on the ingest stream and feeds incremental near-dedup
    val landing = Files.createTempDirectory("graft_phdocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_ph").toString
    def raster(id: Long): Array[Byte] =
      Array.tabulate(16 * 12) { i =>
        val y = i / 16; val x = i % 16
        ((id * 31 + x * x * 7 + y * y * 13) % 256).toByte
      }
    val rows = Seq(1L, 2L, 3L).map(id =>
      (id, raster(id), "raster8", 16, 12))
    rows.toDF("media_id", "media", "format", "width", "height")
      .write.mode("append").parquet(landing)
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("media", BinaryType),
      StructField("format", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
      .as[graft.multimodal.MultimodalOps.MediaRow]
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("dhash"), r.getAs[Long]("ahash"))).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.multimodal.PerceptualHash.phashes(stream), "ph", ckpt, "append"))
    val batch = render(graft.multimodal.PerceptualHash.phashes(
      rows.toDF("media_id", "media", "format", "width", "height")
        .as[graft.multimodal.MultimodalOps.MediaRow]))
    assert(got === batch && got.size === 3)
  }

  test("pca projection streams against a fitted component") {
    // the deployment shape: fit once on the reference corpus (one
    // aggregation), then projectPc1 — a pure projection against the
    // model's literal arrays — scores arrivals on the stream unchanged
    val landing = Files.createTempDirectory("graft_pcadocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_pca").toString
    val ref = (1 to 50).map { i =>
      (i.toLong, Array((i % 7 - 3).toFloat, (i % 5 - 2).toFloat, i.toFloat / 50))
    }
    val arrivals = Seq((101L, Array(1f, -1f, 0.5f)), (102L, Array(-2f, 0f, 0.1f)))
    val model = graft.operators.EmbeddingOps.fitPcaTopComponent(
      ref.toDF("vec_id", "embedding"), dim = 3)
    arrivals.toDF("vec_id", "embedding").write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema).parquet(landing)
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("pc1")).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.EmbeddingOps.projectPc1(stream, model),
      "pca", ckpt, "append"))
    val batch = render(graft.operators.EmbeddingOps.projectPc1(
      arrivals.toDF("vec_id", "embedding"), model))
    assert(got === batch && got.size === 2)
  }

  test("c4 cleaning rules run unchanged on a stream and equal batch") {
    // c4Signals is a pure projection (zero-shuffle by plan gate), so
    // the same operator code filters an unbounded crawl as it lands
    val landing = Files.createTempDirectory("graft_c4docs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_c4").toString
    val rows = Seq(
      (1L, "a clean keeper page here. second sentence closes it!"),
      (2L, "page with a brace { inside. still two sentences here!"),
      (3L, "no terminal punctuation at all"),
      (4L, "Lorem ipsum dolor sit amet. consectetur adipiscing elit!"))
    rows.toDF("doc_id", "text").write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Boolean]("keep"))).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.TextOps.c4Signals(stream, minSentences = 2),
      "c4", ckpt, "append"))
    val batch = render(graft.operators.TextOps.c4Signals(
      rows.toDF("doc_id", "text"), minSentences = 2))
    assert(got === batch)
    assert(got(1L)._2 && !got(2L)._2 && !got(3L)._2 && !got(4L)._2)
  }

  test("score-tier labeling streams against reference-corpus thresholds") {
    // the deployment shape of scoreBuckets on unbounded data: the
    // threshold table is trained once on the reference corpus (a
    // grouped aggregation), and the LABELING stage is a pure
    // broadcast-join projection that tiers each new arrival — so the
    // same operator code runs on the stream, equal to batch labels
    val landing = Files.createTempDirectory("graft_tierdocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_tier").toString
    val reference = (1L to 10L).map(i => (i, "en", i.toDouble)) ++
      Seq((11L, "fr", 100.0), (12L, "fr", 200.0))
    val arrivals = Seq((21L, "en", 9.5), (22L, "en", 5.7), (23L, "en", 1.0),
      (24L, "fr", 150.0), (25L, "de", 7.0))  // de: unseen group → tail
    val th = graft.operators.Sampling.scoreBucketThresholds(
      reference.toDF("doc_id", "lang", "score"), "score", "lang")
    arrivals.toDF("doc_id", "lang", "score").write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("score", DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.Sampling.labelByThresholds(stream, th, "score", "lang"),
      "tiers", ckpt, "append"))
    val batch = render(graft.operators.Sampling.labelByThresholds(
      arrivals.toDF("doc_id", "lang", "score"), th, "score", "lang"))
    assert(got === batch)
    // en thresholds from the reference corpus: q_head=9.1, q_mid=5.5
    assert(got === Map(21L -> "head", 22L -> "middle", 23L -> "tail",
      24L -> "middle", 25L -> "tail"))
  }

  test("url dedup keeper folds incrementally across micro-batch arrivals") {
    // x61's keeper is min(struct)/count — fold-anywhere mergeable, so
    // the SAME operator code runs as a streaming aggregation and two
    // arrivals must land on the batch answer over the union
    val landing = Files.createTempDirectory("graft_urldedup").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_ud").toString
    val batch1 = Seq(
      (1L, "aaaa", "http://dup.com"),
      (2L, "bb", "http://dup.com/"),        // same canonical, shorter
      (3L, "c", "http://solo.org/p"))
    val batch2 = Seq(
      (4L, "cccccc", "http://www.dup.com"), // same canonical, longest — new keeper
      (5L, "dd", "http://solo.org/p/"))     // same canonical as 3, longer
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("url", StringType)))
    batch1.toDF("doc_id", "text", "url").write.mode("append").parquet(landing)
    val q1 = ForecastStream.runAvailableNow(
      graft.operators.UrlOps.urlKeepers(
        spark.readStream.schema(schema).parquet(landing)),
      "urlk1", ckpt, "complete")
    assert(q1.collect().map(r => r.getString(1) -> r.getLong(0)).toMap ===
      Map("http://dup.com" -> 1L, "http://solo.org/p" -> 3L))
    batch2.toDF("doc_id", "text", "url").write.mode("append").parquet(landing)
    val q2 = ForecastStream.runAvailableNow(
      graft.operators.UrlOps.urlKeepers(
        spark.readStream.schema(schema).parquet(landing)),
      "urlk2", ckpt, "complete")
    val got = q2.collect()
      .map(r => r.getString(1) -> ((r.getLong(0), r.getLong(2)))).toMap
    val batch = graft.operators.UrlOps.urlKeepers(
        (batch1 ++ batch2).toDF("doc_id", "text", "url"))
      .collect().map(r => r.getString(1) -> ((r.getLong(0), r.getLong(2)))).toMap
    assert(got === batch)
    assert(got("http://dup.com") === ((4L, 3L))) // longest capture won across batches
  }

  test("streaming heavy hitters keeps the MG guarantee incrementally") {
    // the Misra-Gries buffer is streaming-aggregation state: each
    // micro-batch reduces into it and the mergeable-summaries bound
    // holds for ANY merge tree, including incremental ones — so every
    // token over the N/(capacity+1) threshold must be in the final
    // summary even though batch boundaries differ from any batch run.
    val landing = Files.createTempDirectory("graft_hhdocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_hh").toString
    val mkText = (salt: Int) => (0 until 30).map { i =>
      if (i % 3 == 0) "hot" else s"cold${salt}_$i"
    }.mkString(" ")
    // two arrivals: the stream must fold batch 2 into batch 1's state
    Seq((1L, mkText(1)), (2L, mkText(2))).toDF("doc_id", "text")
      .repartition(1).write.mode("append").parquet(landing)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    val agg = stream.agg(
      graft.operators.HeavyHitters.heavyHitters(16)(col("text")).as("mg"))
    val q1 = ForecastStream.runAvailableNow(agg, "hh_stream", ckpt, "complete")
    Seq((3L, mkText(3))).toDF("doc_id", "text")
      .repartition(1).write.mode("append").parquet(landing)
    val q2 = ForecastStream.runAvailableNow(agg, "hh_stream", ckpt, "complete")
    val mg = q2.collect()(0).getMap[String, Long](0).toMap
    // 90 tokens total, "hot" has 30 > 90/17 — must survive; capacity
    // bound must hold; its count may undercount by at most N/(cap+1)
    assert(mg.size <= 16)
    assert(mg.contains("hot"), s"hot token missing from $mg")
    assert(mg("hot") <= 30L && 30L - mg("hot") <= 90 / 17 + 1)
  }

  test("streaming contamination equals the batch scan on the same docs") {
    GraftExtensions.register(spark)
    val landing = Files.createTempDirectory("graft_evaldocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_cont").toString
    val train = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (4L, "sphinx of black quartz judge my vow today"))
      .toDF("doc_id", "text")
    val evalDocs = Seq(
      (1L, "the quick brown fox jumps over a fence"),   // shares 3+ shingles w/ 0
      (3L, "entirely unrelated eval text goes here now"))
      .toDF("doc_id", "text")
    evalDocs.write.mode("append").parquet(landing)

    val trainShingles = graft.operators.Dedup.shingleHashSets(train, 3)
      .select(col("doc_id").as("train_id"), explode(col("sh_hashes")).as("h"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = ForecastStream.contaminationStream(
      ForecastStream.trackFileStream(spark, landing, schema), trainShingles)
    val got = ForecastStream.runAvailableNow(stream, "contam", ckpt, "complete")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batch = graft.operators.Dedup.contamination(train, evalDocs, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === batch)
    assert(got.map(t => (t._1, t._2)) === Set((1L, 0L)))
  }

  test("watermarked tumbling rainfall over a stream of grid cells") {
    val landing = Files.createTempDirectory("graft_rain").toString
    val ckpt = Files.createTempDirectory("graft_ckpt3").toString
    (0 until 12).map(h => (ts(f"2024-01-01 $h%02d:00:00"), 14.0, 122.0, 1.0))
      .toDF("time", "lat", "lon", "precip").write.mode("append").parquet(landing)
    val schema = StructType(Seq(
      StructField("time", TimestampType), StructField("lat", DoubleType),
      StructField("lon", DoubleType), StructField("precip", DoubleType)))
    val stream = ForecastStream.windowedRainfall(
      ForecastStream.trackFileStream(spark, landing, schema), hours = 6)
    val got = ForecastStream.runAvailableNow(stream, "rain_acc", ckpt, "update")
      .orderBy("time").collect()
    assert(got.length == 2 && got.forall(_.getAs[Double]("precip") == 6.0))
  }

  test("bm25 map-only scorer streams against a trained model") {
    // deployment shape: idf/avgdl trained once on the reference
    // corpus, arrivals scored by a pure projection
    val landing = Files.createTempDirectory("graft_bm25docs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_bm25").toString
    graft.GraftExtensions.register(spark)
    val reference = Seq((1L, "spark runs fast"), (2L, "ducks run faster"),
      (3L, "spark again here now")).toDF("doc_id", "text")
    val arrivals = Seq((10L, "spark spark ducks"), (11L, "nothing relevant"))
      .toDF("doc_id", "text")
    val (idfs, avgdl) = graft.operators.Bm25.collectModel(reference,
      Seq("spark", "ducks"))
    arrivals.write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("bm25"), r.getAs[Long]("n_hit"))).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.Bm25.scoreWithModel(stream, idfs, avgdl),
      "bm25", ckpt, "append"))
    val batch = render(graft.operators.Bm25.scoreWithModel(arrivals, idfs, avgdl))
    assert(got === batch)
    assert(got(10L)._2 === 2L && got(10L)._1 > 0.0)
    assert(got(11L) === ((0.0, 0L)))
  }

  test("bloom novelty scorer streams against a reference filter") {
    // deployment shape: the reference shingle bloom built once, every
    // arriving doc scored by a pure projection — no join, no state
    val landing = Files.createTempDirectory("graft_novdocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_nov").toString
    graft.GraftExtensions.register(spark)
    val ref = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val arrivals = Seq((10L, "alpha beta gamma delta"),
      (11L, "completely fresh content here")).toDF("doc_id", "text")
    val bloom = graft.operators.Dedup.buildShingleBloom(ref, n = 2, fpp = 1e-6)
    arrivals.write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matched"), r.getAs[Double]("novelty"))).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.Dedup.noveltyScoreBloom(stream, bloom, n = 2),
      "novelty", ckpt, "append"))
    assert(got === render(
      graft.operators.Dedup.noveltyScoreBloom(arrivals, bloom, n = 2)))
    assert(got(10L)._2 === 0.0, "fully-covered doc must score 0 novelty")
    assert(got(11L)._2 === 1.0, "fully-fresh doc must score 1 novelty")
  }

  test("logistic quality scorer streams against trained weights") {
    // deployment shape: the LR head trained once (4 doubles), every
    // arriving doc scored by a pure projection
    val landing = Files.createTempDirectory("graft_lrdocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_lr").toString
    val train = Seq((0L, "a clean readable sentence here", 40L, 1),
      (1L, "@@## $$%% ^^&&", 14L, 0)).toDF("doc_id", "text", "n_chars", "label")
    val w = graft.operators.LogisticQuality.train(train,
      col("label") === 1, lr = 0.5, iters = 20)
    val arrivals = Seq((10L, "plain words in a row", 20L),
      (11L, "!!!! ???? ****", 14L)).toDF("doc_id", "text", "n_chars")
    arrivals.write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("p_quality")).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.LogisticQuality.score(stream, w),
      "lrquality", ckpt, "append"))
    assert(got === render(graft.operators.LogisticQuality.score(arrivals, w)))
    assert(got(10L) > got(11L), "prose must outscore punctuation garbage")
  }

  test("dsir map-only scorer streams against a trained ratio table") {
    // the deployment shape of DSIR on unbounded ingest: the bucket
    // ratio table is trained once (two bounded aggregations), collected
    // to the literal lookup array, and SCORING is a pure projection —
    // the same operator code runs on the stream, equal to batch
    val landing = Files.createTempDirectory("graft_dsirdocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_dsir").toString
    val target = Seq((1L, "quality prose words"), (2L, "quality writing here"))
      .toDF("doc_id", "text")
    val raw = Seq((10L, "quality prose words"), (11L, "spam click now"),
      (12L, "")).toDF("doc_id", "text")
    val nb = 1 << 8
    val lut = graft.operators.Dsir.collectRatios(
      graft.operators.Dsir.logRatios(
        graft.operators.Dsir.bucketCounts(target, nb, fastHash = false),
        graft.operators.Dsir.bucketCounts(raw, nb, fastHash = false), nb), nb)
    raw.write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("logw"), r.getAs[Long]("n_terms"))).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.Dsir.importanceWeightsMapOnly(stream, lut, nb),
      "dsir", ckpt, "append"))
    val batch = render(graft.operators.Dsir.importanceWeightsMapOnly(raw, lut, nb))
    assert(got === batch)
    assert(got(10L)._1 > got(11L)._1, "target-like doc must outweigh spam")
    assert(got(12L) === ((0.0, 0L)), "empty doc weighs 0")
  }

  test("streaming ingest into the at-rest int8 index equals batch build") {
    // the deployment loop at 100 TB: embeddings arrive as a stream,
    // each micro-batch appends into the persisted index against the
    // FROZEN quantizer (appendToInt8Index is per-row, so micro-batch
    // boundaries cannot change values) — a query then matches the
    // index built from the same rows all at once
    val landing = Files.createTempDirectory("graft_annstream").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_ann").toString
    val embs = graft.sources.Tables.embeddings(spark, sfDir)
    val base = embs.where(col("vec_id") % 2 === 0)
    val incr = embs.where(col("vec_id") % 2 =!= 0)
    val dirS = Files.createTempDirectory("graft_annstream_idx").toString
    val dirB = Files.createTempDirectory("graft_annbatch_idx").toString
    graft.operators.Similarity.writeInt8Index(base, dirS, nlist = 8)
    graft.operators.Similarity.writeInt8Index(base, dirB, nlist = 8)
    graft.operators.Similarity.appendToInt8Index(incr, dirB)
    // stream the odd half in as 3 files; maxFilesPerTrigger=1 forces
    // 3 SEPARATE micro-batches so the multi-append schedule is
    // actually exercised (without it AvailableNow drains all files in
    // one batch and this would collapse to the single-append shape)
    incr.repartition(3).write.mode("append").parquet(landing)
    val schema = embs.schema
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        nBatches.incrementAndGet()
        // the marker makes an at-least-once replay of this batch a
        // no-op — the exactly-once contract of the ingest loop
        graft.operators.Similarity.appendToInt8Index(batch, dirS,
          doneMarker = Some(id.toString))
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(nBatches.get() >= 2, s"expected multiple micro-batches, got ${nBatches.get()}")
    val qv = embs.where(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    def top(dir: String) = graft.operators.Similarity
      .topKInt8FromIndex(spark, dir, qv, k = 10, nprobe = 6,
        excludeId = Some(3L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val s = top(dirS)
    val b = top(dirB)
    assert(s.map(_._1) === b.map(_._1))
    s.zip(b).foreach { case ((_, x), (_, y)) =>
      assert(java.lang.Double.doubleToLongBits(x) ===
        java.lang.Double.doubleToLongBits(y))
    }
    assert(s.map(_._1).exists(_ % 2 == 1)) // streamed vectors retrievable
  }

  test("char-entropy signals stream unchanged (pure projection)") {
    val landing = Files.createTempDirectory("graft_entdocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_ent").toString
    val arrivals = Seq((1L, "aaaaaaaa"), (2L, "abcdefgh"),
      (3L, ""), (4L, "the quick brown fox")).toDF("doc_id", "text")
    arrivals.write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("entropy"), r.getAs[Double]("top_char_frac"),
          r.getAs[Long]("n_chars")))).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.TextOps.charEntropySignals(stream),
      "entsig", ckpt, "append"))
    assert(got === render(graft.operators.TextOps.charEntropySignals(arrivals)))
    assert(got(1L)._1 === 0.0 && got(1L)._2 === 1.0)
    assert(got(3L) === ((0.0, 0.0, 0L)))
  }

  test("langid map-only scorer streams against a trained model") {
    // the deployment shape of language ID on unbounded ingest: the
    // bounded NB model trains once, collects to the dense broadcast
    // model, and SCORING is one codegen projection — the same operator
    // code runs on the stream, equal to batch
    val landing = Files.createTempDirectory("graft_liddocs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_lid").toString
    val train = Seq(
      ("en", "the quick brown fox jumps over the lazy dog today"),
      ("en", "she was walking through the streets with her friends"),
      ("de", "der schnelle braune fuchs springt über den faulen hund"),
      ("de", "sie ging mit ihren freunden durch die alten straßen"))
      .toDF("lang", "text")
    val nb = 1 << 12
    val (counts, totals) = graft.operators.LangId.train(train, numBuckets = nb)
    val model = graft.operators.LangId.collectModel(counts, totals, nb)
    val arrivals = Seq((10L, "the dog was walking through the streets"),
      (11L, "der hund ging durch die alten straßen"),
      (12L, "ab")).toDF("doc_id", "text")
    arrivals.write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang_pred"), r.getAs[Long]("n_grams")))).toMap
    val got = render(ForecastStream.runAvailableNow(
      graft.operators.LangId.predictMapOnly(stream, model, nb),
      "lidscore", ckpt, "append"))
    val batch = render(graft.operators.LangId.predictMapOnly(arrivals, model, nb))
    assert(got === batch)
    assert(got(10L)._1 === "en")
    assert(got(11L)._1 === "de")
    assert(got(12L) === ((null, 0L)), "featureless doc predicts null")
  }

  test("rrf fusion runs as one streaming aggregation over the tagged union") {
    // deployment shape: both retrievers write ranking rows to ONE
    // landing stream (tagged by source); fusion is one stateful agg,
    // the per-query top-k chained after it as its own streaming
    // aggregation (pinned by the grouped-top-k twin above)
    val landing = Files.createTempDirectory("graft_rrfrows").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_rrf").toString
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("q_id", "vec_id", "rank").withColumn("src", lit("a"))
    val b = Seq((1L, 11L, 1), (1L, 12L, 2), (2L, 21L, 1))
      .toDF("q_id", "vec_id", "rank").withColumn("src", lit("b"))
    // the two retrievers land as separate files -> separate
    // micro-batches: the agg must fuse ACROSS batch boundaries
    a.write.mode("append").parquet(landing)
    b.write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("q_id", LongType),
      StructField("vec_id", LongType), StructField("rank", IntegerType),
      StructField("src", StringType)))
    def render(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().toSeq.sorted
    val streamed = render(ForecastStream.runAvailableNow(
      graft.operators.Ranking.rrfScoresTagged(
        spark.readStream.schema(schema).parquet(landing)),
      "rrf_stream", ckpt, "complete"))
    val batch = render(graft.operators.Ranking.rrfScoresTagged(
      spark.read.schema(schema).parquet(landing)))
    assert(streamed == batch)
    // and the streamed scores ARE rrfFuse's fused scores
    val fused = graft.operators.Ranking.rrfFuse(
        a.drop("src"), b.drop("src"), k = 3)
      .select($"q_id", $"vec_id", $"rrf")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(streamed == fused)
  }

  test("retrieval eval streams: stream-static qrels join + one aggregation") {
    // deployment shape: ranking rows stream in (per-retrieval-batch
    // files), qrels are the static reference; the streamable core
    // scores every query the stream delivered, equal to the batch
    // operator minus the zero-hit completion a stream cannot express
    val landing = Files.createTempDirectory("graft_evalrows").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_eval").toString
    val ranking = Seq((1L, 10L, 1), (1L, 11L, 2), (3L, 30L, 1))
      .toDF("q_id", "vec_id", "rank")
    val qrels = Seq((1L, 10L), (3L, 77L), (9L, 90L)).toDF("q_id", "vec_id")
    // split one query's rows across two files -> the per-query agg
    // must fold across micro-batches
    ranking.where($"vec_id" =!= 11L).write.mode("append").parquet(landing)
    ranking.where($"vec_id" === 11L).write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("q_id", LongType),
      StructField("vec_id", LongType), StructField("rank", IntegerType)))
    def render(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Int, Option[Double], Option[Double])]
        .collect().toSeq.sorted
    val streamed = render(ForecastStream.runAvailableNow(
      graft.operators.Ranking.evalBinaryRetrievalStream(
        spark.readStream.schema(schema).parquet(landing), qrels, k = 2),
      "eval_stream", ckpt, "complete"))
    assert(streamed == render(graft.operators.Ranking
      .evalBinaryRetrievalStream(ranking, qrels, k = 2)))
    // batch = streamed core + the zero-hit completion (query 9)
    val batch = render(graft.operators.Ranking
      .evalBinaryRetrieval(ranking, qrels, k = 2))
    assert(batch.filterNot(_._1 == 9L) == streamed)
    assert(batch.exists(r => r._1 == 9L && r._4 == Some(0.0)))
  }

  test("the cluster registry ingests a stream of document batches " +
      "exactly-once: durable cluster identity via foreachBatch") {
    // the registry's streaming deployment: landed doc batches drive
    // foreachBatch(ingestBatch(batch, edges, path, Some(s"cr$id"))) —
    // at-least-once redelivery of a batch (same batchId) must neither
    // duplicate label rows nor re-alias through stale canonicals
    val landing = Files.createTempDirectory("graft_creg_landing").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_creg").toString
    val dir = Files.createTempDirectory("graft_creg_art").toString
    graft.operators.ClusterRegistry.write(
      Seq((10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L))
        .toDF("doc_id", "group_id"), dir, nBuckets = 8)
    def labels: Map[Long, Long] =
      graft.operators.ClusterRegistry.readLabels(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the landed batch: doc 5 bridges clusters 10 and 20 (merge + a
    // label takeover: 5 < 10 < 20), doc 30 is a singleton
    Seq((5L, 11L), (5L, 21L)).toDF("new_id", "corpus_id")
      .write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("new_id", LongType),
      StructField("corpus_id", LongType)))
    ForecastStream.runCyclePipeline(
      ForecastStream.trackFileStream(spark, landing, schema), ckpt) {
      (batch, id) =>
        val ids = batch.select(col("new_id")).distinct()
          .union(Seq(30L).toDF("new_id")).distinct()
        graft.operators.ClusterRegistry.ingestBatch(ids,
          batch.select(col("new_id").as("id_a"),
            col("corpus_id").as("id_b")), dir, Some(s"cr$id"))
    }
    val after = labels
    assert(after === Map(10L -> 5L, 11L -> 5L, 20L -> 5L, 21L -> 5L,
      5L -> 5L, 30L -> 30L))
    // redelivery of the same micro-batch under the same batchId: no-op
    graft.operators.ClusterRegistry.ingestBatch(
      Seq(5L, 30L).toDF("id"),
      Seq((5L, 11L), (5L, 21L)).toDF("id_a", "id_b"), dir, Some("cr0"))
    assert(labels === after)
    assert(spark.read.parquet(s"$dir/labels").count() === 6L)
  }

  test("at-rest artifact appends are exactly-once under streaming replay: " +
      "batchId is the doneMarker") {
    // THE deployment shape for the whole at-rest family on a stream:
    // foreachBatch(CountMin.appendToSketch(_, dir, Some(s"fb$batchId"))).
    // Structured Streaming's foreachBatch is at-least-once — a crash
    // after the append but before the checkpoint commit REDELIVERS the
    // batch under the SAME batchId on restart — and Count-Min is
    // SUM-merged, so without the marker a redelivery double-counts.
    // The marker (keyed by batchId) + the crash-atomic staged commit
    // (Compaction.appendWithMarker) upgrade it to exactly-once.
    val landing = Files.createTempDirectory("graft_cm_landing").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_cm").toString
    val dir = Files.createTempDirectory("graft_cm_art").toString
    graft.operators.CountMin.writeSketch(
      Seq("alpha beta", "beta gamma").toDF("text"), "text", dir,
      width = 64, depth = 2)
    def estimates: Map[String, Long] =
      graft.operators.CountMin.estimateFromSketch(spark, dir,
        Seq("alpha", "beta", "zeta").toDF("w"), "w")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estimates === Map("alpha" -> 1L, "beta" -> 2L, "zeta" -> 0L))

    Seq("beta zeta", "zeta zeta").toDF("text")
      .write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("text", StringType)))
    var seenBatches = Vector.empty[Long]
    ForecastStream.runCyclePipeline(
      ForecastStream.trackFileStream(spark, landing, schema), ckpt) {
      (batch, id) =>
        seenBatches :+= id
        graft.operators.CountMin.appendToSketch(batch, dir, Some(s"fb$id"))
    }
    assert(seenBatches.length === 1)
    val after = estimates
    assert(after === Map("alpha" -> 1L, "beta" -> 3L, "zeta" -> 3L))

    // simulate the at-least-once redelivery: the same batch, the same
    // batchId (what a restart-before-checkpoint-commit replays) — the
    // marker makes it a no-op and every estimate holds
    graft.operators.CountMin.appendToSketch(
      Seq("beta zeta", "zeta zeta").toDF("text"), dir,
      Some(s"fb${seenBatches.head}"))
    assert(estimates === after,
      "a replayed micro-batch must not shift SUM-merged estimates")

    // a restart with the committed checkpoint reprocesses nothing
    ForecastStream.runCyclePipeline(
      ForecastStream.trackFileStream(spark, landing, schema), ckpt) {
      (batch, id) =>
        if (!batch.isEmpty)
          graft.operators.CountMin.appendToSketch(batch, dir, Some(s"fb$id"))
    }
    assert(estimates === after)

    // and a genuinely NEW batch (new files, next batchId) still lands
    Seq("zeta").toDF("text").write.mode("append").parquet(landing)
    ForecastStream.runCyclePipeline(
      ForecastStream.trackFileStream(spark, landing, schema), ckpt) {
      (batch, id) =>
        if (!batch.isEmpty)
          graft.operators.CountMin.appendToSketch(batch, dir, Some(s"fb$id"))
    }
    assert(estimates === Map("alpha" -> 1L, "beta" -> 3L, "zeta" -> 4L))
  }

  test("the exact keyed rollup is exactly-once under streaming replay: " +
      "batchId is the doneMarker") {
    // the x136 rollup on a stream — n/sum are SUM-merged, so the
    // marker guards VALUES exactly as for Count-Min; min/max would
    // absorb a replay, which is precisely why the spec asserts the
    // SUM columns (they are the canary)
    val landing = Files.createTempDirectory("graft_ro_landing").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_ro").toString
    val dir = Files.createTempDirectory("graft_ro_art").toString
    graft.operators.Rollup.writeRollup(
      Seq(("en", 10L), ("de", 4L)).toDF("lang", "len"), dir,
      Seq("lang"), "len", nBuckets = 4)
    def rolled: Map[String, (Long, Long)] =
      graft.operators.Rollup.readRollup(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
    assert(rolled === Map("en" -> (1L, 10L), "de" -> (1L, 4L)))

    Seq(("en", 7L), ("zh", 3L)).toDF("lang", "len")
      .write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("lang", StringType),
      StructField("len", LongType)))
    var seen = Vector.empty[Long]
    ForecastStream.runCyclePipeline(
      ForecastStream.trackFileStream(spark, landing, schema), ckpt) {
      (batch, id) =>
        seen :+= id
        graft.operators.Rollup.appendToRollup(batch, dir, Some(s"ro$id"))
    }
    assert(seen.length === 1)
    val after = rolled
    assert(after === Map("en" -> (2L, 17L), "de" -> (1L, 4L),
      "zh" -> (1L, 3L)))
    // redelivery of the same batch under the same batchId: no-op
    graft.operators.Rollup.appendToRollup(
      Seq(("en", 7L), ("zh", 3L)).toDF("lang", "len"), dir,
      Some(s"ro${seen.head}"))
    assert(rolled === after,
      "a replayed micro-batch must not double-count n/sum")
  }
}
