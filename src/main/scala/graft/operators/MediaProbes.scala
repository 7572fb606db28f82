package graft.operators

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps
import graft.sources.Tables

/** Certification probe for the audio decode path: each document id
  * deterministically synthesizes a PCM16 WAV (header + little-endian
  * samples from an integer formula), Spark decodes it through the REAL
  * `javax.sound.sampled` path and computes level features, and DuckDB
  * recomputes the same features directly from the sample formula — if
  * the decoder mangled a single sample, byte order, or frame count,
  * the hashes diverge. Every arithmetic step (2^15 normalization,
  * integer sum of squares, exact divisions) is double-exact, so no
  * rounding is needed on either side. */
object MediaProbes {

  val probes: Seq[Probe] = Seq(

    Probe("x54_audio_features",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .map { id =>
            val n = 256 + (id % 64).toInt
            val samples = Array.tabulate(n) { i =>
              (((id * 7919L + i.toLong * 104729L) % 65536L) - 32768L).toInt
            }
            MultimodalOps.MediaRow(id,
              MultimodalOps.synthWavPcm16(8000, samples), "wav", 0, 0)
          }
        MultimodalOps.extractAudioFeatures(media)
          .select(col("media_id"), col("n_bytes"), col("decoded"),
            col("sample_rate"), col("channels"), col("n_frames"),
            col("duration_s"), col("rms"), col("peak"), col("clipping_frac"))
          .orderBy("media_id")
      },
      Some("""WITH g AS (SELECT doc_id, 256 + doc_id % 64 AS n FROM documents),
             |i AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM g),
             |v AS (SELECT doc_id, n,
             |        ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS s
             |      FROM i),
             |a AS (SELECT doc_id, ANY_VALUE(n) AS n,
             |        SUM(s * s) AS sumsq,
             |        MAX(ABS(s)) AS maxabs,
             |        SUM(CASE WHEN s = 32767 OR s = -32768 THEN 1 ELSE 0 END) AS clips,
             |        COUNT(*) AS cnt
             |      FROM v GROUP BY doc_id)
             |SELECT doc_id AS media_id,
             |  CAST(44 + 2 * n AS INT) AS n_bytes,
             |  TRUE AS decoded,
             |  8000 AS sample_rate,
             |  1 AS channels,
             |  CAST(n AS BIGINT) AS n_frames,
             |  CAST(n AS DOUBLE) / 8000 AS duration_s,
             |  SQRT((CAST(sumsq AS DOUBLE) / 1073741824) / cnt) AS rms,
             |  CAST(maxabs AS DOUBLE) / 32768 AS peak,
             |  CAST(clips AS DOUBLE) / cnt AS clipping_frac
             |FROM a ORDER BY media_id""".stripMargin)),
  )
}
