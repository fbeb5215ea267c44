package graft

/** Generated DuckDB mirrors of the BPE family — training, encode, and
  * packing — turning five former rows-only registry rows hash-green.
  *
  * The trick that makes an ITERATIVE tokenizer oracle-able is the same
  * one that cracked `graph_pagerank`: unroll the data-dependent loop
  * into generated CTEs and keep every step exactly replayable by both
  * engines. Two pieces:
  *
  *  1. TRAINING UNROLL — `nMerges` generated (pairs_k, best_k,
  *     vocab_k+1) CTE triples replay [[graft.operators.Bpe.learnMerges]]
  *     argmax-for-argmax: pair counts are integer sums, the winner is
  *     `ORDER BY c DESC, a, b LIMIT 1` (the learner's (-c, a, b)
  *     lexicographic rule), and merge application is ONE `replace()`
  *     call per step made exact by the DOUBLE-SEPARATOR encoding below.
  *
  *  2. DOUBLE-SEPARATOR mergeOnce — symbol sequences are stored as
  *     `SS c1 SS c2 SS` (every boundary TWO chr(1) bytes). A pair
  *     occurrence is then `S a SS b S`, which borrows only ONE
  *     separator byte from each boundary — so consecutive occurrences
  *     ("a b a b") share no characters and SQL `replace()`, which
  *     substitutes non-overlapping matches left-to-right in one pass,
  *     performs exactly the greedy left-to-right single-pass semantics
  *     of [[graft.operators.Bpe.mergeOnce]] ("aaa" → ["aa","a"]).
  *
  * ENCODE is a recursive CTE over the distinct-word table: each step
  * finds the lowest-rank merge present (`min(rank)` correlated
  * subquery) and applies one full mergeOnce pass of it — exactly
  * [[graft.operators.Bpe.encodeWord]]'s loop. Termination is sound
  * because a merge's product can only appear in LATER-learned pairs
  * (training only ever pairs symbols that already exist), so applying
  * the minimum-rank pair never introduces a lower-rank occurrence.
  *
  * Every CTE is `AS MATERIALIZED`: DuckDB inlines per REFERENCE, and
  * vocab_k is referenced twice per step — unmaterialized, the chain
  * expands 2^nMerges scans (the graph_pagerank lesson).
  *
  * All cross-row quantities are integers (counts, token ids, offsets),
  * so the engines agree bit for bit; the only string ordering involved
  * is the alphabet sort over single a–z code points, identical under
  * UTF8String binary order and DuckDB's varchar order.
  */
private[graft] object BpeOracle {

  private val S = "chr(1)"
  private val SS = "(chr(1)||chr(1))"

  /** chars → `SS c1 SS c2 SS` (double-separator symbol sequence). */
  private def initSeq(col: String): String =
    s"$SS || regexp_replace($col, '(.)', '\\1' || $SS, 'g')"

  /** One greedy-L2R mergeOnce pass of pair (a, b) over `seq`. */
  private def mergeOnceSql(seq: String, a: String, b: String): String =
    s"replace($seq, $S||$a||$SS||$b||$S, $S||$a||$b||$S)"

  private def containsPair(seq: String, a: String, b: String): String =
    s"strpos($seq, $S||$a||$SS||$b||$S) > 0"

  /** Shared prefix: tokenize, word counts, the unrolled trainer, the
    * merge table, the encode recursion, and per-word subword counts.
    * Callers append their own tail SELECT.
    */
  private def commonCtes(nMerges: Int): String = {
    val trainer = (0 until nMerges).map { k =>
      s"""syms_$k AS MATERIALIZED (
         |  SELECT w, n, list_filter(string_split(seq, $S), x -> x <> '') AS syms
         |  FROM vocab_$k),
         |pairs_$k AS MATERIALIZED (
         |  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS c
         |  FROM syms_$k, unnest(range(1, len(syms))) AS t(i) GROUP BY 1, 2),
         |best_$k AS MATERIALIZED (
         |  SELECT a, b, c FROM pairs_$k ORDER BY c DESC, a, b LIMIT 1),
         |vocab_${k + 1} AS MATERIALIZED (
         |  SELECT v.w, v.n, ${mergeOnceSql("v.seq", "b.a", "b.b")} AS seq
         |  FROM vocab_$k v CROSS JOIN best_$k b)""".stripMargin
    }.mkString(",\n")
    val mergeUnion = (0 until nMerges)
      .map(k => s"SELECT ${k + 1} AS rank, a, b, c FROM best_$k")
      .mkString("\n  UNION ALL ")
    s"""toks AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
       |    '[^\\p{L}\\p{N}]+'), x -> x <> '')) AS w
       |  FROM documents),
       |wc AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY w),
       |vocab_0 AS MATERIALIZED (
       |  SELECT w, n, ${initSeq("w")} AS seq FROM wc),
       |$trainer,
       |merges AS MATERIALIZED (
       |  $mergeUnion),
       |enc AS (
       |  SELECT w, ${initSeq("w")} AS seq FROM wc
       |  UNION ALL
       |  SELECT x.w, ${mergeOnceSql("x.seq", "m2.a", "m2.b")}
       |  FROM (
       |    SELECT e.w, e.seq,
       |      (SELECT min(m.rank) FROM merges m
       |       WHERE ${containsPair("e.seq", "m.a", "m.b")}) AS r
       |    FROM enc e) x
       |  JOIN merges m2 ON m2.rank = x.r),
       |enc_final AS MATERIALIZED (
       |  SELECT w, seq FROM enc e
       |  WHERE NOT EXISTS (SELECT 1 FROM merges m
       |    WHERE ${containsPair("e.seq", "m.a", "m.b")})),
       |word_sub AS MATERIALIZED (
       |  SELECT w, CAST((length(seq) - length(replace(seq, $S, ''))) / 2 - 1
       |    AS BIGINT) AS n_sub
       |  FROM enc_final)""".stripMargin
  }

  /** Exclusive per-shard running token sum + bin/offset — the
    * [[graft.operators.Scale.packManifestBy]] window, over LEFT-joined
    * per-doc totals (encodeCorpus is map-only: zero-token docs pack with
    * n_tokens = 0, unlike encode_stats' inner-join semantics).
    */
  private def packedDocsCtes(budget: Long, shards: Int): String =
    s"""doc_tokens AS MATERIALIZED (
       |  SELECT d.doc_id, coalesce(s.n_tokens, 0) AS n_tokens FROM
       |    (SELECT doc_id FROM documents) d LEFT JOIN
       |    (SELECT t.doc_id, CAST(sum(ws.n_sub) AS BIGINT) AS n_tokens
       |     FROM toks t JOIN word_sub ws USING (w) GROUP BY t.doc_id) s
       |  USING (doc_id)),
       |packed AS MATERIALIZED (
       |  SELECT CAST(doc_id % $shards AS BIGINT) AS shard,
       |    CAST(cum // $budget AS BIGINT) AS bin_id, doc_id, n_tokens,
       |    CAST(cum % $budget AS BIGINT) AS "offset"
       |  FROM (
       |    SELECT doc_id, n_tokens,
       |      coalesce(sum(n_tokens) OVER (PARTITION BY doc_id % $shards
       |        ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |    FROM doc_tokens))""".stripMargin

  def learnMergesSql(nMerges: Int = 20): String =
    s"""WITH RECURSIVE
       |${commonCtes(nMerges)}
       |SELECT rank, a AS "left", b AS "right", c AS pair_count
       |FROM merges ORDER BY rank""".stripMargin

  def encodeStatsSql(nMerges: Int = 20): String =
    s"""WITH RECURSIVE
       |${commonCtes(nMerges)}
       |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(ws.n_sub) AS BIGINT) AS n_subwords
       |FROM toks t JOIN word_sub ws USING (w)
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** Token-id corpus: alphabet ids by sorted code point, merge-product
    * ids A+rank-1 first-learned-wins ([[graft.operators.Bpe.vocabIds]]),
    * per-doc id stream as its exact CSV rendering in word order.
    */
  def encodeCorpusSql(nMerges: Int = 20): String =
    s"""WITH RECURSIVE
       |${commonCtes(nMerges)},
       |alpha AS MATERIALIZED (
       |  SELECT s, CAST(row_number() OVER (ORDER BY s) - 1 AS INT) AS id
       |  FROM (SELECT DISTINCT unnest(string_split(w, '')) AS s FROM wc)),
       |na AS MATERIALIZED (SELECT CAST(count(*) AS INT) AS a FROM alpha),
       |mids AS MATERIALIZED (
       |  SELECT s, CAST(id AS INT) AS id FROM (
       |    SELECT m.a || m.b AS s, na.a + m.rank - 1 AS id, m.rank
       |    FROM merges m CROSS JOIN na)
       |  QUALIFY row_number() OVER (PARTITION BY s ORDER BY rank) = 1),
       |vocab_ids AS MATERIALIZED (
       |  SELECT s, id FROM alpha UNION ALL SELECT s, id FROM mids),
       |enc_syms AS MATERIALIZED (
       |  SELECT w, list_filter(string_split(seq, $S), x -> x <> '') AS syms
       |  FROM enc_final),
       |word_ids AS MATERIALIZED (
       |  SELECT es.w, string_agg(vi.id, ',' ORDER BY t.i) AS ids_csv,
       |    CAST(count(*) AS BIGINT) AS n_sub
       |  FROM enc_syms es, unnest(range(1, len(es.syms) + 1)) AS t(i)
       |  JOIN vocab_ids vi ON vi.s = es.syms[t.i]
       |  GROUP BY es.w),
       |toksp AS MATERIALIZED (
       |  SELECT doc_id, lst[i] AS w, i FROM (
       |    SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
       |      '[^\\p{L}\\p{N}]+'), x -> x <> '') AS lst
       |    FROM documents) d, unnest(range(1, len(lst) + 1)) AS t(i)),
       |doc_enc AS MATERIALIZED (
       |  SELECT t.doc_id, CAST(sum(wi.n_sub) AS BIGINT) AS n_tokens,
       |    string_agg(wi.ids_csv, ',' ORDER BY t.i) AS ids_csv
       |  FROM toksp t JOIN word_ids wi USING (w) GROUP BY t.doc_id)
       |SELECT d.doc_id, coalesce(e.n_tokens, 0) AS n_tokens,
       |  coalesce(e.ids_csv, '') AS ids_csv
       |FROM (SELECT doc_id FROM documents) d LEFT JOIN doc_enc e USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  def packManifestSql(nMerges: Int = 20, budget: Long = 256, shards: Int = 8): String =
    s"""WITH RECURSIVE
       |${commonCtes(nMerges)},
       |${packedDocsCtes(budget, shards)}
       |SELECT shard, bin_id, doc_id, n_tokens, "offset" FROM packed
       |ORDER BY shard, bin_id, doc_id""".stripMargin

  def packPipelineSql(nMerges: Int = 20, budget: Long = 256, shards: Int = 8): String =
    s"""WITH RECURSIVE
       |${commonCtes(nMerges)},
       |${packedDocsCtes(budget, shards)}
       |SELECT shard, bin_id, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(min(doc_id) AS BIGINT) AS first_doc,
       |  CAST(max(doc_id) AS BIGINT) AS last_doc
       |FROM packed GROUP BY shard, bin_id
       |ORDER BY shard, bin_id""".stripMargin
}
