package graft

import org.apache.spark.sql.functions._

/** Pins the span_gram_hashes kernel bit- and POSITION-identical to the
  * relational formulation it replaced inside exactSpanDedup /
  * decontaminateSpans (the slice + array_join + md5-hex + conv chain),
  * including the Unicode-lowercase and whitespace edge cases. */
class SpanHashKernelSpec extends SparkTestBase {

  private def relational(k: Int, salt: String) = {
    val spanHash = (gram: org.apache.spark.sql.Column) =>
      conv(substring(md5(concat(lit(salt), gram)), 1, 15), 16, 10)
        .cast("long")
    val ws = transform(
      filter(split(trim(col("text")), "\\s+"), w => w =!= ""),
      w => lower(w))
    posexplode(
      when(size(ws) >= k,
        transform(sequence(lit(1), size(ws) - (k - 1)),
          i => spanHash(array_join(slice(ws, i, lit(k)), " "))))
        .otherwise(array().cast("array<bigint>"))).as(Seq("s", "h"))
  }

  test("kernel equals the relational gram chain on edge-case texts") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "  leading  and   trailing   spaces  padded    out to ten words  ",
      "tabs\tand\nnewlines\rsplit too one two three four five six",
      "UPPER Case MiXeD ΣΊΓΜΑ ΤΕΛΙΚΌΣ one two three four five",
      "short doc", // fewer than k words -> empty
      "", // empty text
      "exactly eight words here to make one gram",
      "ninewords a b c d e f g h",
      "unicode δοκιμή ΄έλεγχος çöğüş ıI İi one two three four five six")
    val df = texts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    Seq((8, "ss_"), (8, "sd_"), (3, "ss_")).foreach { case (k, salt) =>
      val kern = df.select(col("doc_id"), posexplode(
          call_function("span_gram_hashes", col("text"), lit(k), lit(salt)))
          .as(Seq("s", "h")))
        .orderBy("doc_id", "s").collect().toSeq
      val rel = df.select(col("doc_id"), relational(k, salt))
        .orderBy("doc_id", "s").collect().toSeq
      assert(kern === rel, s"kernel != relational at k=$k salt=$salt")
    }
  }

  test("exactSpanDedup still excises the duplicated span (end-to-end)") {
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"$span first doc unique tail words here"),
      (2L, s"prefix words then $span and a tail")).toDF("doc_id", "text")
    val out = graft.operators.TextOps.exactSpanDedup(docs, k = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 0L) // keeper doc loses nothing
    assert(out(1).getLong(2) === 8L) // duplicate span excised
    assert(!out(1).getString(1).contains("alpha beta gamma"))
  }
}
