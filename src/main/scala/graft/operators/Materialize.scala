package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialize an intermediate relation as an at-rest parquet
  * artifact and hand back the scan of it — lineage truncation through
  * the STORAGE layer instead of executor block storage.
  *
  * Why not `localCheckpoint`: for a BOUNDED relation (quota tables,
  * pool rows, per-feature counts) localCheckpoint is the right tool —
  * cheap, small, and its non-recomputability is irrelevant. For a
  * CORPUS-SIZED relation it pins the whole corpus in executor
  * storage (MEMORY_AND_DISK) and, because lineage is truncated, a
  * lost executor kills the job instead of recomputing the blocks.
  * The probes that materialize a cleaned/normalized corpus (x38's
  * filtered+deduped corpus, x72's normalized corpus) are modelling
  * the cleaned-corpus-artifact write a real pipeline pays anyway
  * ([[CorpusArtifact]]) — so pay it AS an artifact write: the data
  * lands on the (reliable) filesystem, consumers scan parquet with
  * column pruning, and executor loss costs a re-read, not the job.
  *
  * NOT cross-run caching: every call writes a FRESH directory under
  * java.io.tmpdir (unique per call) and recomputes `df` from its
  * inputs; directories are deleted on JVM exit. Nothing is keyed on
  * the corpus, nothing survives the process.
  */
object Materialize {

  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.forEach { dir =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Exception => () }
      }))

  /** Write `df` to a fresh temp parquet directory and return the scan
    * of it. `label` only names the directory for debuggability. The
    * read-back carries `df`'s own schema: no inference listing, and
    * nullability survives the round-trip exactly. */
  def toParquet(df: DataFrame, label: String): DataFrame = {
    hookInstalled
    val dir = java.nio.file.Files.createTempDirectory(s"graft_mat_${label}_")
    created.add(dir)
    val path = dir.toUri.toString
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.schema(df.schema).parquet(path)
  }
}
