package graft.operators

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Certification probe for the unigram-LM tokenizer (x96): the oracle
  * re-derives the ENTIRE hard-EM training and the final segmentation
  * in SQL — word-type counts, seed substring counts, the integer-
  * lattice log-probability scores, a full 8-position Viterbi DP
  * unroll (ROW_NUMBER per cell with the score/pieces/path tie-break)
  * under the seed model, the EM piece recount with the alphabet
  * floor, the vocabulary prune, a SECOND full DP unroll under the
  * final model, and the per-document piece-stream rollup — the
  * tokenizer sibling of the x51 BPE-training and x81 GD-trajectory
  * oracles. Corpus words are ≤ 8 chars (the unroll bound is
  * asserted in-query by construction: longer words would simply
  * produce no final row and drop from the rollup, failing the row
  * count).
  */
object TokenizerProbes {

  val probes: Seq[Probe] = Seq(

    Probe("x96_unigram_tokenizer",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val model = UnigramLm.train(docs, vocabSize = 20,
          maxPieceLen = 3, emRounds = 1, minCount = 2)
        UnigramLm.segmentDocs(docs, model)
          .select(col("doc_id"), col("n_pieces"), md5(col("seg")).as("seg_md5"))
          .orderBy("doc_id")
      },
      Some(unigramSql(maxLen = 8, maxPieceLen = 3, vocabSize = 20,
        minCount = 2))),

    // UnigramLm.tokenIds / the unigram_token_ids kernel: segment and
    // resolve to sorted-vocabulary ids in one pass. The oracle
    // re-derives the SAME training as x96 and additionally the id
    // contract (vocabulary pieces sorted ascending, ids 0..V−1),
    // mapping every piece of every document positionally ------------
    Probe("x97_unigram_token_ids",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val model = UnigramLm.train(docs, vocabSize = 20,
          maxPieceLen = 3, emRounds = 1, minCount = 2)
        graft.GraftExtensions.register(s)
        docs.select(col("doc_id"),
            UnigramLm.tokenIds(col("text"), model).as("ids"))
          .select(col("doc_id"),
            size(col("ids")).as("n_ids"),
            md5(array_join(transform(col("ids"), i => i.cast("string")), " "))
              .as("ids_md5"))
          .orderBy("doc_id")
      },
      Some(unigramSql(maxLen = 8, maxPieceLen = 3, vocabSize = 20,
        minCount = 2, ids = true)))
  )

  private def unigramSql(maxLen: Int, maxPieceLen: Int,
                         vocabSize: Int, minCount: Int,
                         ids: Boolean = false): String = {
    val dp1 = dpSqlSimple("d1", "ssc", "sunk", maxLen, maxPieceLen)
    val dp2 = dpSqlSimple("d2", "fsc", "funk", maxLen, maxPieceLen)
    s"""WITH tok AS (
       |  SELECT doc_id, g.i AS pos, parts[g.i] AS w
       |  FROM (SELECT doc_id, list_filter(
       |          regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')
       |          AS parts FROM documents),
       |       (SELECT unnest(generate_series(1, 100000)) AS i) g
       |  WHERE g.i <= len(parts)),
       |ty AS MATERIALIZED (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
       |al AS MATERIALIZED (
       |  SELECT substr(w, g.i, 1) AS ch, SUM(c) AS c
       |  FROM ty, (SELECT unnest(generate_series(1, $maxLen)) AS i) g
       |  WHERE g.i <= length(w) GROUP BY 1),
       |seed AS MATERIALIZED (
       |  SELECT p, SUM(c) AS cnt FROM (
       |    SELECT substr(w, g.i, l.l) AS p, c
       |    FROM ty,
       |         (SELECT unnest(generate_series(1, $maxLen)) AS i) g,
       |         (SELECT unnest(generate_series(1, $maxPieceLen)) AS l) l
       |    WHERE g.i + l.l - 1 <= length(w))
       |  GROUP BY p
       |  HAVING length(p) = 1 OR SUM(c) >= $minCount),
       |stot AS (SELECT SUM(cnt) AS t FROM seed),
       |ssc AS MATERIALIZED (SELECT p AS pc,
       |  CAST(ROUND(LN(cnt) - LN((SELECT t FROM stot)), 6) * 1000000
       |       AS BIGINT) AS s FROM seed),
       |sunk AS (SELECT
       |  CAST(ROUND(LN(1) - LN((SELECT t FROM stot)), 6) * 1000000
       |       AS BIGINT) AS u),
       |d1_b0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS score, 0 AS np, '' AS path
       |          FROM ty),
       |$dp1,
       |uses AS MATERIALIZED (
       |  SELECT piece, SUM(c) AS cnt FROM (
       |    SELECT unnest(string_split(f.path, ' ')) AS piece, t.c
       |    FROM d1_fin f JOIN ty t ON t.w = f.w)
       |  GROUP BY piece),
       |c2 AS MATERIALIZED (
       |  SELECT piece, cnt FROM uses
       |  UNION ALL
       |  SELECT ch, 1 FROM al WHERE ch NOT IN (SELECT piece FROM uses)),
       |pruned AS MATERIALIZED (
       |  SELECT piece, cnt FROM c2 WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, ROW_NUMBER() OVER
       |      (ORDER BY cnt DESC, piece ASC) AS rk
       |    FROM c2 WHERE length(piece) > 1)
       |  WHERE rk <= $vocabSize),
       |ftot AS (SELECT SUM(cnt) AS t FROM pruned),
       |fsc AS MATERIALIZED (SELECT piece AS pc,
       |  CAST(ROUND(LN(cnt) - LN((SELECT t FROM ftot)), 6) * 1000000
       |       AS BIGINT) AS s FROM pruned),
       |funk AS (SELECT
       |  CAST(ROUND(LN(1) - LN((SELECT t FROM ftot)), 6) * 1000000
       |       AS BIGINT) AS u),
       |d2_b0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS score, 0 AS np, '' AS path
       |          FROM ty),
       |$dp2,
       |${if (!ids)
      """docseg AS (
        |  SELECT tok.doc_id,
        |    string_agg(f.path, ' ' ORDER BY tok.pos) AS seg,
        |    CAST(SUM(f.np) AS INT) AS n_pieces
        |  FROM tok JOIN d2_fin f ON f.w = tok.w
        |  GROUP BY tok.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(ds.n_pieces, 0) AS n_pieces,
        |  md5(COALESCE(ds.seg, '')) AS seg_md5
        |FROM documents d LEFT JOIN docseg ds USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin
    else
      """vid AS MATERIALIZED (
        |  SELECT piece, CAST(ROW_NUMBER() OVER (ORDER BY piece) - 1 AS INT)
        |    AS id
        |  FROM pruned),
        |pieces AS (
        |  SELECT tok.doc_id, tok.pos,
        |    unnest(string_split(f.path, ' ')) AS piece,
        |    generate_subscripts(string_split(f.path, ' '), 1) AS k
        |  FROM tok JOIN d2_fin f ON f.w = tok.w),
        |docids AS (
        |  SELECT p.doc_id,
        |    string_agg(CAST(COALESCE(v.id, -1) AS VARCHAR), ' '
        |      ORDER BY p.pos, p.k) AS idstr,
        |    CAST(COUNT(*) AS INT) AS n_ids
        |  FROM pieces p LEFT JOIN vid v ON v.piece = p.piece
        |  GROUP BY p.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(di.n_ids, 0) AS n_ids,
        |  md5(COALESCE(di.idstr, '')) AS ids_md5
        |FROM documents d LEFT JOIN docids di USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin}""".stripMargin
  }

  /** The DP unroll, final row = the cell at pos = length(w). */
  private def dpSqlSimple(name: String, scores: String, unk: String,
                          maxLen: Int, maxPieceLen: Int): String = {
    val stages = (1 to maxLen).map { p =>
      val cands = (1 to math.min(maxPieceLen, p)).map { j =>
        val prev = s"${name}_b${p - j}"
        val piece = s"substr(b.w, ${p - j + 1}, $j)"
        val sExpr =
          if (j == 1) s"COALESCE(s.s, (SELECT u FROM $unk))" else "s.s"
        val join = if (j == 1) "LEFT JOIN" else "JOIN"
        s"""SELECT b.w, b.score + $sExpr AS score, b.np + 1 AS np,
           |          CASE WHEN b.path = '' THEN $piece
           |               ELSE b.path || ' ' || $piece END AS path
           |        FROM $prev b $join $scores s ON s.pc = $piece
           |        WHERE length(b.w) >= $p""".stripMargin
      }.mkString("\n        UNION ALL\n        ")
      s"""${name}_b$p AS MATERIALIZED (
         |  SELECT w, score, np, path FROM (
         |    SELECT c.*, ROW_NUMBER() OVER (PARTITION BY c.w
         |        ORDER BY c.score DESC, c.np ASC, c.path ASC) AS rn
         |    FROM (
         |        $cands
         |    ) c) WHERE rn = 1)""".stripMargin
    }
    val finArms = (1 to maxLen).map(p =>
      s"SELECT w, path, np FROM ${name}_b$p WHERE length(w) = $p")
      .mkString(" UNION ALL ")
    s"""${stages.mkString(",\n")},
       |${name}_fin AS MATERIALIZED ($finArms)""".stripMargin
  }
}
