package graft.publish

import org.apache.spark.sql.DataFrame

/** K1/K4: sink adapters (SURVEY.md §2.2).
  *
  * The engine's outputs are tiny (per-municipality tables, payload
  * JSONs); sinks therefore collect-and-post rather than distribute.
  * The HTTP transport itself is injected so tests (and air-gapped
  * runs) drive the same code without a network.
  */
object Sinks {

  /** K1: single-file CSV for the reference's artifact outputs
    * (windfield/track/impact CSVs — small by construction). */
  def writeSingleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** K4: POST each payload row via the injected transport with the
    * reference's retry policy (3 connect retries, 300 s timeout is the
    * transport's concern; dynamicDataDb.py:274-287). Payload rows are
    * collected — they are single-row JSON documents by contract. */
  def postPayloads(payloads: DataFrame, post: String => Unit,
                   maxAttempts: Int = 3, baseDelayMs: Long = 500): Unit =
    payloads.collect().foreach { row =>
      val body = row.getString(0)
      graft.util.Retry.withLinearBackoff(maxAttempts, baseDelayMs)(_ => post(body))
    }
}
