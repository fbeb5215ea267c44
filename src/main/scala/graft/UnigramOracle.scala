package graft

import graft.operators.Unigram

/** Generated DuckDB mirrors of the unigram-LM tokenizer family —
  * turning the last non-ANN rows-only pair hash-green, the
  * [[BpeOracle]] discipline applied to SentencePiece-style encode.
  *
  * Split of responsibilities (the quality-model pattern,
  * [[graft.operators.QualityModel.lastPortableWeights]]):
  *
  *  - TRAINING (EM + lattice prune, Kudo 2018) is data-dependent
  *    floating-point iteration — no SQL engine replays libm-exact
  *    forward–backward. It stays covered by the Verify main's HARD
  *    equality gate: distributed trainer == sequential in-driver
  *    reference, piece for piece, micro for micro, including the
  *    per-EM-step log-likelihood trace.
  *  - The trained PIECE TABLE (piece, score_micros) is embedded as
  *    literals, captured from the registry query's own memoized
  *    training run in this JVM ([[graft.operators.Unigram.lastModel]]).
  *  - ENCODE is replayed move-for-move: the shipped model's Viterbi
  *    runs on the INTEGER micro scores
  *    ([[graft.operators.Unigram.viterbiMicros]]), so the DP here is
  *    pure BIGINT arithmetic — a recursive CTE advancing one symbol
  *    position per iteration, carrying the last `maxLen` positions'
  *    best scores and best paths per word (the rolling window a
  *    bounded-edge-length lattice needs; recursion depth = longest
  *    word). Both engines agree bit for bit by construction.
  *
  * Tie-breaks, replicated exactly: the Scala DP scans start positions
  * ascending with strict `>`, keeping the FIRST maximizer — i.e. among
  * equal-scoring edges into a position, the LONGEST piece wins. The SQL
  * `max_by` key `(score * {2^b} + L)` encodes exactly (score desc,
  * piece-length desc). Vocabulary ids are rank-1 under the same
  * (micros desc, piece asc) order the `unigram_train` projection ships,
  * so one literal table serves both queries.
  *
  * Reference anchor: tokenization is the reference app's chunk/token
  * boundary (chroma_utils.py:16-21); the trainer itself is the
  * 100 TB-pipeline operator the reference delegates to its embedding
  * model's tokenizer.
  */
private[graft] object UnigramOracle {

  private def sq(s: String): String = s.replace("'", "''")

  /** (rank, piece, micros, id, plen) rows in the shipped order:
    * rank 1.. by (micros desc, piece asc); id = rank - 1 (the
    * [[Unigram.vocabIds]] assignment); plen = symbol (code point)
    * count, the lattice edge length.
    */
  private def rankedPieces(model: Unigram.Model): IndexedSeq[(Int, String, Long, Int, Int)] =
    model.scoreMicros.sortBy { case (p, m) => (-m, p) }
      .zipWithIndex
      .map { case ((p, m), i) =>
        (i + 1, p, m, i, Unigram.symbols(p).length)
      }

  /** `unigram_train` mirror: the literal piece table itself, in the
    * registry projection (rank, piece, score_micros). The DuckDB row
    * hash then pins the distributed trainer's output against the
    * captured table — and the Verify gate independently pins that table
    * against the sequential reference, closing the loop.
    */
  def trainSql(model: Unigram.Model): String = {
    val rows = rankedPieces(model)
      .map { case (r, p, m, _, _) => s"($r, '${sq(p)}', $m)" }
      .mkString(", ")
    s"""SELECT rank, piece, CAST(m AS BIGINT) AS score_micros
       |FROM (VALUES $rows) AS t(rank, piece, m)
       |ORDER BY rank""".stripMargin
  }

  /** `unigram_encode_corpus` mirror: tokenize `documents` exactly like
    * [[graft.operators.TextRetrieval.tokensCol]], Viterbi-encode every
    * DISTINCT word via the recursive integer DP, then reassemble per-doc
    * id streams in word order (the [[BpeOracle.encodeCorpusSql]] tail).
    *
    * Every multiply-referenced CTE is `AS MATERIALIZED` (DuckDB inlines
    * per reference — the graph_pagerank lesson). The DP state row per
    * word carries best score s0..s{maxLen-1} and best id-path p0..p{..}
    * for the last `maxLen` positions; NULL score = unreachable (the
    * Scala NEG sentinel). On the training corpus every position is
    * reachable (single-code-point coverage is never pruned), which the
    * Verify gate's unk == 0 require pins separately.
    */
  def encodeCorpusSql(model: Unigram.Model): String = {
    val maxLen = model.maxLen
    // max_by key packs (score, L) lexicographically: scores are Longs
    // ~1e9 from zero, L in 1..maxLen — shift by the next power of two.
    val shift = Integer.highestOneBit(maxLen) * 2
    val pieceRows = rankedPieces(model)
      .map { case (_, p, m, id, plen) => s"('${sq(p)}', $m, $id, $plen)" }
      .mkString(", ")
    val ls = (1 to maxLen).mkString(",")
    def arm(sel: Int => String) =
      "CASE t.L " + (1 to maxLen).map(l => s"WHEN $l THEN ${sel(l - 1)}").mkString(" ") + " END"
    val caseS = arm(k => s"v.s$k")
    val caseP = arm(k => s"v.p$k")
    // one candidate derivation, inlined twice (score + arg-path): the
    // ≤ maxLen edges into position pos+1, joined against the piece table
    val cand =
      s"""SELECT $caseS AS ps, $caseP AS pp, pc.micros AS micros, t.L AS L, pc.id AS id
         |      FROM (SELECT unnest([$ls]) AS L) t
         |      JOIN pieces pc ON pc.plen = t.L AND pc.piece = substr(v.w, v.pos + 2 - t.L, t.L)
         |      WHERE v.pos + 1 - t.L >= 0""".stripMargin
    val initS = (1 until maxLen).map(k => s"CAST(NULL AS BIGINT) AS s$k").mkString(", ")
    val initP = (1 until maxLen).map(k => s"CAST(NULL AS VARCHAR) AS p$k").mkString(", ")
    val shiftS = (0 until maxLen - 1).map(k => s"v.s$k").mkString(", ")
    val shiftP = (0 until maxLen - 1).map(k => s"v.p$k").mkString(", ")
    s"""WITH RECURSIVE
       |pieces(piece, micros, id, plen) AS MATERIALIZED (SELECT * FROM (VALUES $pieceRows)),
       |toksp AS MATERIALIZED (
       |  SELECT doc_id, lst[i] AS w, i FROM (
       |    SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
       |      '[^\\p{L}\\p{N}]+'), x -> x <> '') AS lst
       |    FROM documents) d, unnest(range(1, len(lst) + 1)) AS t(i)),
       |wc AS MATERIALIZED (SELECT DISTINCT w FROM toksp),
       |vit AS (
       |  SELECT w, length(w) AS l, 0 AS pos,
       |    CAST(0 AS BIGINT) AS s0, $initS,
       |    '' AS p0, $initP
       |  FROM wc
       |  UNION ALL
       |  SELECT v.w, v.l, v.pos + 1,
       |    (SELECT max(q.ps + q.micros)
       |     FROM ($cand) q WHERE q.ps IS NOT NULL),
       |    $shiftS,
       |    (SELECT max_by(CASE WHEN q.pp = '' THEN CAST(q.id AS VARCHAR)
       |                        ELSE q.pp || ',' || CAST(q.id AS VARCHAR) END,
       |                   (q.ps + q.micros) * $shift + q.L)
       |     FROM ($cand) q WHERE q.ps IS NOT NULL),
       |    $shiftP
       |  FROM vit v WHERE v.pos < v.l),
       |word_ids AS MATERIALIZED (
       |  SELECT w, p0 AS ids_csv, CAST(len(string_split(p0, ',')) AS BIGINT) AS n_sub
       |  FROM vit WHERE pos = l),
       |doc_enc AS MATERIALIZED (
       |  SELECT t.doc_id, CAST(sum(wi.n_sub) AS BIGINT) AS n_tokens,
       |    string_agg(wi.ids_csv, ',' ORDER BY t.i) AS ids_csv
       |  FROM toksp t JOIN word_ids wi USING (w) GROUP BY t.doc_id)
       |SELECT d.doc_id, coalesce(e.n_tokens, 0) AS n_tokens,
       |  coalesce(e.ids_csv, '') AS ids_csv
       |FROM (SELECT doc_id FROM documents) d LEFT JOIN doc_enc e USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }
}
