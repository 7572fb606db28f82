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

    // The AVI/RIFF container path: each id synthesizes an AVI whose
    // frame payloads are deterministic ASCII blobs, Spark parses the
    // container for real (header walk, chunk offsets, every-2nd
    // sampling, per-media meta) and DuckDB states every output —
    // frame bytes' md5 included — by the same id arithmetic, ground
    // truth by construction. The frames are deliberately NOT JPEGs:
    // n_decoded must stay 0 (garbage frames are data, not images;
    // the real-JPEG decode path is spec-certified in VideoSpec) ------
    Probe("x68_video_frames",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .map { id =>
            val nf = (id % 5 + 1).toInt
            val frames = (0 until nf).map { f =>
              val unit = s"v$id-$f;"
              (unit * (10 + ((id + f) % 7).toInt)).getBytes("US-ASCII")
            }
            MultimodalOps.MediaRow(id,
              MultimodalOps.synthAviMjpeg(frames, 320 + (id % 3).toInt * 16,
                240, 40000L), "avi", 0, 0)
          }
        val fr = MultimodalOps.sampleVideoFrames(media, everyN = 2)
          .select(col("media_id"), col("frame_idx"), col("n_bytes"),
            md5(col("frame")).as("frame_md5"))
        val meta = MultimodalOps.extractVideoFeatures(media, everyN = 2)
          .select(col("media_id"), col("container_ok"), col("width"),
            col("height"), col("fps"), col("n_frames"), col("n_sampled"),
            col("n_decoded"))
        fr.join(meta, Seq("media_id")).orderBy("media_id", "frame_idx")
      },
      Some("""WITH m AS (SELECT doc_id, doc_id % 5 + 1 AS nf FROM documents),
             |f AS (SELECT doc_id, nf, unnest(generate_series(0, nf - 1)) AS fi
             |      FROM m),
             |sf AS (SELECT doc_id, nf, fi,
             |         repeat('v' || doc_id || '-' || fi || ';',
             |                CAST(10 + (doc_id + fi) % 7 AS INT)) AS payload
             |       FROM f WHERE fi % 2 = 0)
             |SELECT doc_id AS media_id,
             |  CAST(fi AS INT) AS frame_idx,
             |  CAST(length(payload) AS INT) AS n_bytes,
             |  md5(payload) AS frame_md5,
             |  TRUE AS container_ok,
             |  CAST(320 + (doc_id % 3) * 16 AS INT) AS width,
             |  240 AS height,
             |  25.0 AS fps,
             |  CAST(nf AS BIGINT) AS n_frames,
             |  CAST((nf + 1) // 2 AS INT) AS n_sampled,
             |  0 AS n_decoded
             |FROM sf ORDER BY media_id, frame_idx""".stripMargin)),
  )
}
