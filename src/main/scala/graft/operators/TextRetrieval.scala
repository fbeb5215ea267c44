package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Lexical retrieval and term-statistics operators: BM25 top-k search,
  * per-document TF-IDF key terms, and corpus n-gram statistics.
  *
  * The reference retrieves purely by embedding similarity
  * (chroma_utils.py:237-263); production RAG stacks pair that with a
  * lexical (BM25) channel, and pretraining-data pipelines need corpus
  * term statistics — these are the scale-out batch forms.
  *
  * Design for 100 TB: everything is tokenize → explode → hash-partitioned
  * aggregation on (term) or (doc, term) — no cross joins. Scalar corpus
  * aggregates (N, avgdl) broadcast unconditionally. BM25 never builds the
  * corpus-vocabulary df table at all: postings are semi-joined to the
  * query vocabulary first, so its df side is query-bounded (see
  * [[bm25TopK]]). TF-IDF genuinely scores every (doc, term), so its
  * full-vocabulary df join stays caller-governed: UNHINTED by default
  * (AQE broadcasts only when the measured size is small — a billion-term
  * vocabulary stays a term-keyed shuffle join instead of OOMing the
  * driver), with an explicit opt-in for corpora the caller knows are
  * word-tokenized-small. The only wide shuffles key on term or doc id.
  * All hot-path expressions are native (codegen), no UDFs.
  */
object TextRetrieval {

  /** Lowercased word tokens as a column (same tokenization as
    * [[graft.functions.HashEmbedder.tokens]] — split on non-letter/digit).
    */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => t =!= "")

  /** (doc_id, term, tf) term frequencies.
    *
    * A query that consumes tf twice (e.g. TF-IDF's scored stream + df
    * build) tokenizes the corpus once per branch: ReuseExchange cannot
    * merge the branches because the optimizer prunes the unused count
    * from the df branch (its exchange carries a distinct, the stream's
    * carries counts — structurally different subplans). That second
    * pass is an embarrassingly-parallel CPU cost with no memory or skew
    * hazard; pipelines that iterate over term stats should materialize
    * tf once (as [[graft.operators.Scale]]'s layout helpers do) instead
    * of relying on plan-level sharing.
    */
  def termFrequencies(docs: DataFrame): DataFrame =
    Scale.parallelismFloor(docs)
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** BM25 top-k document retrieval for a table of keyword queries.
    *
    * Scoring: idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) (the
    * Robertson-Spärck-Jones form, always positive), tf saturation with
    * k1/b length normalization. Distinct query terms (bag-of-words
    * queries score each term once). N and avgdl range over documents
    * with at least one token (token-less docs can never match a term).
    *
    * Scale shape — zero full-corpus shuffles, one corpus tokenization:
    * the corpus postings are restricted to the query vocabulary FIRST,
    * via a broadcast semi-join on the (driver-small) set of distinct
    * query terms — a map-side filter below the tf aggregation, so the
    * only posting shuffle carries query-term postings. Document
    * frequency never becomes its own plan branch (a separate df subplan
    * re-tokenizes the corpus inside its broadcast build — measured 3×
    * the query cost — and a full-vocabulary df table must never exist at
    * 100 TB anyway): since the semi-join keeps every posting of a query
    * term, a window count over each (query_id, term) partition of the
    * joined stream IS that term's corpus df. Document lengths come from
    * a map-only size(tokens) scan — no explode, no shuffle — because dl
    * per doc is just its token count; deriving dl from tf would re-run
    * the tokenize+aggregate pipeline as a second branch. The dl join
    * rides AQE (matched postings vs corpus lengths — either side may
    * win); the (n_docs, avgdl) scalar broadcasts unconditionally.
    *
    * Cross-engine determinism: ranking uses the 6-decimal floor of the
    * score plus doc_id, so float fold-order noise below 1e-6 can't flip
    * the cut between engines.
    */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      // 1.25/0.75: standard BM25 range, chosen exactly representable in
      // binary so k1+1 and 1-b are literal-identical in any engine.
      k1: Double = 1.25,
      b: Double = 0.75): DataFrame = {
    // Doc length = token count: computed directly from the scan (size of
    // the token array), map-only. dl is corpus-cardinality, so it is
    // NEVER broadcast — the doc_id join shuffles (or broadcasts only when
    // AQE's measured sizes justify it). Token-less docs drop here, same
    // population as "docs with at least one tf row". The parallelism
    // floor (no-op at scale) keeps the tokenize off a single scan split;
    // termFrequencies applies its own and sees this one already in place.
    val docsP = Scale.parallelismFloor(docs)
    // dl feeds TWO structurally different consumers (the (n_docs, avgdl)
    // scalar broadcast and the per-posting length join), so the tokenize
    // runs twice per invocation — a DELIBERATE non-change (r19): a
    // map-only lazy localCheckpoint here read FLAT in fresh-JVM A/Bs but
    // +16-25%% drift-adjusted on the bm25TopK callers (bm25_topk,
    // retrieval_hybrid_rrf) in FOUR full interleaved recordings,
    // including a same-day old-code-vs-new-code worktree run
    // (OPTIMIZATION_r19.md "Re-measure") — the materialization barrier
    // plus per-invocation block churn across a 191-query session costs
    // more than the duplicated map-side tokenize saves. At 100 TB the
    // right shape is materializing the whole postings layout once
    // (tfidfTopTermsFromStats' discipline), not checkpointing inside
    // every query invocation.
    val dl = docsP
      .select(col("doc_id"), size(tokensCol(col("text"))).cast("long").as("dl"))
      .filter(col("dl") > 0)
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val qterms = queries
      .select(col("query_id"), explode(tokensCol(col("qtext"))).as("term"))
      .distinct()
    // Postings for query terms only: the semi-join sits below the tf
    // aggregation (Catalyst pushes it through the grouping keys), so the
    // corpus tokenizes once and only matching postings reach the shuffle.
    val tfq = termFrequencies(docsP)
      .join(broadcast(qterms.select("term").distinct()), Seq("term"), "leftsemi")
    // Each (query_id, term) window partition holds the term's complete
    // posting list (the semi-join dropped nothing for query terms), so
    // this count is the term's full-corpus df — no second df branch.
    val contrib = broadcast(qterms)
      .join(tfq, "term") // inverted-index equi-join on term
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy("query_id", "term")))
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
    val scored = contrib
      .groupBy("query_id", "doc_id")
      .agg(TextAnalysis.floorScale(sum("contrib"), 6).as("score"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("doc_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score")
  }

  /** Top `k` characteristic terms per document by TF-IDF
    * (idf = ln(N/df); ties broken by term). The batch form of
    * keyword/topic extraction over a corpus.
    *
    * The tf stream feeds two branches (the scored stream and the df
    * build) that ReuseExchange cannot merge (see [[termFrequencies]]),
    * so the convenience form materializes tf ONCE via [[Scale]]'s loop
    * checkpoint — exactly the "materialize the inverted index, then
    * join against it" discipline [[tfidfTopTermsFromStats]] documents
    * for 100 TB — instead of tokenizing the corpus once per branch
    * (r18, guide §2.4: the before plan ran two full tokenize+explode
    * aggregations).
    */
  def tfidfTopTerms(
      docs: DataFrame,
      k: Int,
      // None = AQE decides; Some(true) = caller asserts a
      // broadcast-small vocabulary; Some(false) = force shuffle join.
      broadcastDf: Option[Boolean] = None): DataFrame =
    tfidfTopTermsFromStats(
      LoopCheckpoint.transient(termFrequencies(docs), eager = false),
      docs.agg(count(lit(1)).as("n_docs")),
      k, broadcastDf)

  /** [[tfidfTopTerms]] over an already-materialized `(doc_id, term, tf)`
    * table and a 1-row `(n_docs)` frame — the 100 TB shape: the inverted
    * index is written once per corpus snapshot, and every TF-IDF (or
    * BM25) pass joins against it instead of re-tokenizing the corpus per
    * plan branch (see [[termFrequencies]] on why ReuseExchange cannot
    * de-duplicate the branches of the convenience form).
    */
  def tfidfTopTermsFromStats(
      tf: DataFrame,
      nDocs: DataFrame,
      k: Int,
      broadcastDf: Option[Boolean] = None): DataFrame = {
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dfSide = broadcastDf match {
      case Some(true)  => broadcast(df)
      case Some(false) => df.hint("shuffle_merge")
      case None        => df
    }
    val scored = tf
      .join(dfSide, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        TextAnalysis.floorScale(
          col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "score")
  }

  /** (doc_id, w1, w2) consecutive word-bigram occurrences (one row per
    * occurrence, not distinct) from a (doc_id, toks) frame.
    */
  private def bigramOccurrences(toks: DataFrame): DataFrame =
    toks
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(
          element_at(col("toks"), i + 1).as("w1"),
          element_at(col("toks"), i + 2).as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))

  private def trigramOccurrences(toks: DataFrame): DataFrame =
    toks
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("toks")) - 3),
        i => struct(
          element_at(col("toks"), i + 1).as("w1"),
          element_at(col("toks"), i + 2).as("w2"),
          element_at(col("toks"), i + 3).as("w3")))).as("tg"))
      .select(col("doc_id"), col("tg.w1"), col("tg.w2"), col("tg.w3"))

  /** Trigram Stupid Backoff scorer (Brants et al., EMNLP 2007, "Large
    * Language Models in Machine Translation") — the n-gram LM designed
    * FOR distributed count tables: no discounting or normalization pass,
    * just relative frequencies with a fixed backoff penalty, which is
    * why it trains as three hash aggregations and scores as equi-joins:
    *
    *   S(w3|w1 w2) = C(w1w2w3)/C(w1w2)          if the trigram was seen
    *               = α · C(w2w3)/C(w2)          else, if the bigram was
    *               = α² · C(w3)/N               else (α = 0.4, the
    *                 paper's constant; unseen w3 floors at count 1 so
    *                 the log stays finite).
    *
    * Per-document score = exp(−mean ln S) over its trigrams, floored at
    * 4 decimals (engine-stable hashing); documents with fewer than
    * three tokens have no trigrams and are absent. Sharper than the
    * add-k bigram [[lmPerplexity]] on repeated-phrase boilerplate
    * (trigram hits dominate) while still backing off smoothly on novel
    * text — the scale shape is identical: the uni/bi/tri count tables
    * stay distributed and join on their natural keys (AQE broadcasts
    * only what measures small), the scalar N broadcasts.
    */
  def stupidBackoffPerplexity(
      lmCorpus: DataFrame,
      docs: DataFrame,
      alpha: Double = 0.4): DataFrame = {
    def tokenized(d: DataFrame) =
      Scale.parallelismFloor(d)
        .select(col("doc_id"), tokensCol(col("text")).as("toks"))
    // The LM corpus feeds THREE count-table branches (uni/bi/tri) plus
    // the scored stream, each re-running the tokenize scan. Measured in
    // r18: materializing the tokenized frame (localCheckpoint) REGRESSED
    // the query ~1.3x — the stored token arrays are corpus-fat and pay
    // more in (de)serialization than the codegen tokenize costs to
    // re-run — so the repeated map-side tokenize stays, deliberately
    // (and at 100 TB the count tables, not the token stream, are the
    // artifact to persist).
    val lmToks = tokenized(lmCorpus)
    val docToks = tokenized(docs)
    val uni = lmToks
      .select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("uc"))
    val total = uni.agg(sum(col("uc")).as("n_total"))
    val bi = bigramOccurrences(lmToks)
      .groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    val tri = trigramOccurrences(lmToks)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("tc"))
    trigramOccurrences(docToks)
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi.select(col("w1"), col("w2"), col("bc").as("bc12")),
        Seq("w1", "w2"), "left")
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"), col("bc").as("bc23")),
        Seq("w2", "w3"), "left")
      .join(uni.select(col("w").as("w2"), col("uc").as("uc2")), Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("uc").as("uc3")), Seq("w3"), "left")
      .crossJoin(broadcast(total))
      // An empty LM corpus has n_total null — no model to score under;
      // drop the rows (empty output = "no signal"), same convention as
      // lmPerplexity.
      .filter(col("n_total").isNotNull && col("n_total") > 0)
      .withColumn("s",
        when(col("tc").isNotNull,
          col("tc").cast("double") / col("bc12").cast("double"))
        .when(col("bc23").isNotNull,
          lit(alpha) * col("bc23").cast("double") / col("uc2").cast("double"))
        .otherwise(lit(alpha) * lit(alpha) *
          coalesce(col("uc3"), lit(1L)).cast("double") /
            col("n_total").cast("double")))
      .groupBy("doc_id")
      .agg(
        TextAnalysis.floorScale(exp(-avg(log(col("s")))), 4).as("perplexity"),
        count(lit(1)).as("n_trigrams"))
  }

  /** Bigram language-model perplexity per document — the classic
    * pretraining-corpus quality signal (a well-formed document scores a
    * low perplexity under an LM trained on a trusted reference corpus; a
    * high score flags boilerplate, gibberish, or OCR damage). This is
    * the batch scoring shape of CCNet-style filtering with the n-gram LM
    * itself trained in the same engine.
    *
    * Model: add-k smoothed bigram LM over `lmCorpus`,
    * P(w2|w1) = (C(w1 w2) + k) / (C(w1) + k·V), V = unigram vocabulary
    * size. Per-document score = exp(−mean ln P) over the document's
    * consecutive bigrams (floored at 4 decimals for engine-stable
    * hashing). Documents with fewer than two tokens have no bigrams and
    * are absent from the output — callers treat "no signal" upstream.
    *
    * Scale shape: LM training is two hash aggregations (unigram, bigram
    * counts) — map-side partial then one shuffle each, never collected
    * or broadcast (a 100 TB reference corpus has a vocab²-scale bigram
    * table; it stays distributed and joins by its natural keys). Scoring
    * joins the document bigram stream to those tables on (w1, w2) and
    * (w1) — plain equi-joins, left so unseen bigrams smooth to k/(C+kV)
    * instead of dropping, with AQE free to broadcast only if a small LM
    * actually measures small. The scalar V broadcasts unconditionally.
    */
  def lmPerplexity(
      lmCorpus: DataFrame,
      docs: DataFrame,
      addK: Double = 0.5): DataFrame = {
    def tokenized(d: DataFrame) =
      Scale.parallelismFloor(d)
        .select(col("doc_id"), tokensCol(col("text")).as("toks"))
    // Same deliberate re-tokenize as [[stupidBackoffPerplexity]] (r18):
    // a localCheckpoint of the tokenized frame measured neutral-to-worse
    // here — the token arrays are corpus-fat relative to the codegen
    // tokenize they would save.
    val lmToks = tokenized(lmCorpus)
    val docToks = tokenized(docs)
    val uni = lmToks
      .select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("uc"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = bigramOccurrences(lmToks)
      .groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    bigramOccurrences(docToks)
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      // A token-less LM corpus (v = 0, all counts null) has no model to
      // score under — drop the rows (empty output = "no signal") instead
      // of dividing by zero. With any real LM, v >= 1 keeps this true.
      .filter(coalesce(col("uc"), lit(0L)) + lit(addK) * col("v") > 0)
      .withColumn("logp", log(
        (coalesce(col("bc"), lit(0L)) + lit(addK)) /
          (coalesce(col("uc"), lit(0L)) + lit(addK) * col("v"))))
      .groupBy("doc_id")
      .agg(
        TextAnalysis.floorScale(exp(-avg(col("logp"))), 4).as("perplexity"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Corpus-wide top `k` word n-grams by occurrence count (ties broken by
    * the n-gram string) — the standard corpus-statistics probe. Pure
    * integer arithmetic; one shuffle on the n-gram, then a global top-k
    * (TakeOrderedAndProject, no full sort).
    */
  def topNgrams(docs: DataFrame, n: Int, k: Int): DataFrame = {
    val toks = Scale.parallelismFloor(docs)
      .select(col("doc_id"), tokensCol(col("text")).as("toks"))
    val grams = toks
      .withColumn("gram",
        explode(when(size(col("toks")) < n, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), size(col("toks")) - n),
            i => concat_ws(" ", (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*)))))
    grams.groupBy("gram")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(desc("n_occurrences"), asc("gram"))
      .limit(k)
  }

  /** Hybrid retrieval fusion via Reciprocal Rank Fusion (Cormack et al.
    * SIGIR'09): combine a lexical ranking (e.g. [[bm25TopK]]) and a
    * semantic ranking (e.g. `Retrieval.knnJoin`) into one list with
    * `score = Σ 1/(rrfK + rank)` over the lists that retrieved the doc.
    * RRF needs only ranks, never the incomparable raw scores, which is
    * why it is the standard fusion for hybrid RAG search. Docs retrieved
    * by one channel keep that channel's contribution alone; ties (same
    * rank pattern from different channels) break by doc_id.
    *
    * Inputs are (query_id, doc_id, rank) frames. Scale shape: both
    * inputs are top-N lists — O(|queries|·N) rows regardless of corpus
    * size — so the full-outer fusion join and the per-query re-rank
    * window never touch the corpus; AQE broadcasts the smaller side.
    */
  def hybridTopK(
      lexical: DataFrame,
      semantic: DataFrame,
      k: Int,
      rrfK: Int = 60): DataFrame = {
    val lex = lexical.select(
      col("query_id"), col("doc_id"), col("rank").cast("int").as("lex_rank"))
    val sem = semantic.select(
      col("query_id"), col("doc_id"), col("rank").cast("int").as("sem_rank"))
    val fused = lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("sem_rank")), lit(0.0)))
    val w = Window.partitionBy("query_id").orderBy(desc("rrf"), asc("doc_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "rrf", "lex_rank", "sem_rank")
  }
}
