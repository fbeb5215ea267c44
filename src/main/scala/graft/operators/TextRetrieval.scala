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
  * aggregates (N, avgdl) broadcast unconditionally; the per-term document
  * frequency table is left UNHINTED so AQE broadcasts it only when its
  * measured size is actually small — a billion-term vocabulary stays a
  * term-keyed shuffle join instead of OOMing the driver. The only wide
  * shuffles key on term or doc id. All hot-path expressions are native
  * (codegen), no UDFs.
  */
object TextRetrieval {

  /** Lowercased word tokens as a column (same tokenization as
    * [[graft.functions.HashEmbedder.tokens]] — split on non-letter/digit).
    */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => t =!= "")

  /** (doc_id, term, tf) term frequencies. */
  def termFrequencies(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokensCol(col("text"))).as("term"))
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
      b: Double = 0.75,
      // Who decides how the term-df table joins: None (default) leaves it
      // unhinted — AQE broadcasts when the measured size is small, else a
      // term-keyed shuffle join; scale-safe for any vocabulary, but the
      // static planner assumes a shuffle join, so the plan pays its
      // exchange materializations before AQE can convert. Some(true) is
      // the caller's ASSERTION that the vocabulary is broadcast-small
      // (word-tokenized corpora: ~1e6 terms) — deterministic single-pass
      // plan, no shuffle of tf by term. Some(false) forces the shuffle
      // join (a character/CJK-heavy corpus with billions of terms).
      broadcastDf: Option[Boolean] = None): DataFrame = {
    val tf = termFrequencies(docs)
    // Document lengths derived from tf (sum of a doc's term counts == its
    // token count): no second tokenization scan, and docs with zero
    // tokens can never score anyway. dl is corpus-cardinality, so it is
    // NEVER broadcast — the doc_id join shuffles (or broadcasts only when
    // the planner's size stats justify it).
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = queries
      .select(col("query_id"), explode(tokensCol(col("qtext"))).as("term"))
      .distinct()
    val dfSide = broadcastDf match {
      case Some(true)  => broadcast(df)
      case Some(false) => df.hint("shuffle_merge")
      case None        => df
    }
    val contrib = qterms
      .join(tf, "term") // inverted-index equi-join on term
      .join(dfSide, "term")
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
    */
  def tfidfTopTerms(
      docs: DataFrame,
      k: Int,
      // same contract as bm25TopK: None = AQE decides; Some(true) =
      // caller asserts a broadcast-small vocabulary.
      broadcastDf: Option[Boolean] = None): DataFrame = {
    val tf = termFrequencies(docs)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val dfSide = broadcastDf match {
      case Some(true)  => broadcast(df)
      case Some(false) => df.hint("shuffle_merge")
      case None        => df
    }
    val scored = tf
      .join(dfSide, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        TextAnalysis.floorScale(
          col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "score")
  }

  /** Corpus-wide top `k` word n-grams by occurrence count (ties broken by
    * the n-gram string) — the standard corpus-statistics probe. Pure
    * integer arithmetic; one shuffle on the n-gram, then a global top-k
    * (TakeOrderedAndProject, no full sort).
    */
  def topNgrams(docs: DataFrame, n: Int, k: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), tokensCol(col("text")).as("toks"))
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
}
