package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** The reference bloom as an at-rest artifact: a reloaded filter is
  * byte-identical, so novelty decisions in a later session equal the
  * build session's exactly. */
class BloomArtifactSpec extends SparkTestBase {

  test("persisted bloom reloads byte-identical; decisions carry over") {
    val docs = Tables.documents(spark, sfDir)
    val ref = docs.where(col("doc_id") % 2 === 0)
    val bytes = Dedup.buildShingleBloom(ref, n = 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bloom").toString + "/ref.bloom"
    Dedup.writeShingleBloom(spark, bytes, path)
    val reloaded = Dedup.readShingleBloom(spark, path)
    assert(java.util.Arrays.equals(bytes, reloaded))
    // decisions against the reloaded artifact equal the in-memory ones
    val probeDocs = docs.where(col("doc_id") % 2 =!= 0).limit(50)
    def render(b: Array[Byte]) =
      Dedup.noveltyScoreBloom(probeDocs, b).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    assert(render(bytes) === render(reloaded))
    // overwrite semantics: writing again replaces, not appends
    Dedup.writeShingleBloom(spark, bytes, path)
    assert(Dedup.readShingleBloom(spark, path).length === bytes.length)
  }
}
