package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the last
  * in-engine step of a pretraining data pipeline the reference leaves to
  * client-side libraries (tokenizer boundary, chroma_utils.py's chunker
  * feeds a pre-trained tokenizer): learn the merge table itself from the
  * corpus, Sennrich et al. 2016 ("Neural Machine Translation of Rare
  * Words with Subword Units").
  *
  * Scale shape — the whole point of the word-level formulation: BPE
  * statistics are a function of the WORD-COUNT TABLE, not the corpus.
  * One corpus-scale tokenize+count produces (word, n) — at 100 TB that
  * is the only pass over the data; everything after runs on the distinct
  * vocabulary (10⁶–10⁸ rows at web scale — big enough to stay
  * distributed, orders of magnitude smaller than the corpus). Each merge
  * iteration is one explode+aggregate job over the cached vocab (pair
  * counts weighted by word frequency, map-side combinable) plus one
  * vocab-local merge application; driver state is the merge list — two
  * strings per merge. Production tokenizers at 32k merges amortize
  * further with delta pair-count maintenance; this implementation
  * recounts per iteration, trading jobs for exactness of the
  * reference-checkable rule.
  *
  * Determinism (the property the Verify gate pins): pair selection is
  * max by (count, left, right) — lexicographic tiebreak, no hash or
  * partition order anywhere — and merge application is greedy
  * left-to-right (overlapping runs like "aaa" merge to ["aa","a"]), so
  * the distributed learner is EXACTLY equal, merge for merge, to the
  * sequential reference [[learnMergesReference]].
  */
object Bpe {

  /** Greedy left-to-right application of ONE merge (a,b) to a symbol
    * sequence — the shared rule of the distributed learner, the
    * reference learner, and the encoder.
    */
  def mergeOnce(symbols: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < symbols.length) {
      if (i + 1 < symbols.length && symbols(i) == a && symbols(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += symbols(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Sequential reference learner over a collected word-count table —
    * the in-driver oracle the Verify gate compares the distributed run
    * against (BPE is iterative with data-dependent choices, so no SQL
    * oracle can express it).
    */
  def learnMergesReference(
      wordCounts: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Seq[(Seq[String], Long)] =
      wordCounts.map { case (w, n) => (w.map(_.toString), n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (merges.length < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((a, b, c))
        vocab = vocab.map { case (syms, n) => (mergeOnce(syms, a, b), n) }
      }
    }
    merges.toSeq
  }

  /** (word, n) frequency table of the corpus — the single corpus-scale
    * pass; the parallelism floor keeps the tokenize off one scan split.
    */
  def wordCounts(docs: DataFrame): DataFrame =
    Scale.parallelismFloor(docs)
      .select(explode(TextRetrieval.tokensCol(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Distributed BPE training: `nMerges` rounds of pair-count + merge
    * over the materialized vocabulary. Returns the ordered merge table
    * (left, right, weighted pair count).
    *
    * Each round re-materializes the vocab via `localCheckpoint` — NOT
    * `persist`: an iteratively-cached frame nests every prior round's
    * adaptive plan inside the next round's `InMemoryRelation`, and AQE's
    * per-job plan-change explain strings then grow super-linearly with
    * the round number (measured: OOM on the driver before round 20 even
    * at a 50-doc corpus). The checkpoint truncates lineage to an RDD
    * leaf, so round k's plan is one project over one leaf regardless of
    * k. Storage cost is one vocab copy per live round (the previous
    * round's blocks release with its reference); a cluster run would
    * trade this for reliable-checkpoint storage, same shape.
    */
  def learnMerges(docs: DataFrame, nMerges: Int): Seq[(String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = wordCounts(docs)
      .select(split(col("w"), "").as("symbols"), col("n"))
      .as[(Seq[String], Long)].localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (merges.length < nMerges && !done) {
      // pair counts weighted by word frequency: explode adjacent pairs,
      // one map-side-combinable aggregation; winner = max by
      // (count, left, right) — collect exactly one row
      val top = vocab.toDF("symbols", "n")
        .select(explode(zip_with(
          slice(col("symbols"), lit(1), greatest(size(col("symbols")) - 1, lit(0))),
          slice(col("symbols"), lit(2), greatest(size(col("symbols")) - 1, lit(0))),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"), col("n"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("n").as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = top.head
        merges += ((a, b, c))
        val mergeUdf = udf((syms: Seq[String]) => mergeOnce(syms, a, b))
        vocab = vocab.toDF("symbols", "n")
          .select(mergeUdf(col("symbols")).as("symbols"), col("n"))
          .as[(Seq[String], Long)].localCheckpoint()
      }
    }
    merges.toSeq
  }

  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String, Long)]]()

  /** [[learnMerges]] memoized on a corpus fingerprint — same discipline
    * as the PQ codebook cache: registry queries and the Verify gate that
    * share a corpus train once per JVM, and a corpus CHANGE (count or
    * content hash) retrains rather than serving stale merges.
    */
  def learnMergesCached(
      docs: DataFrame,
      cacheKey: String,
      nMerges: Int): Seq[(String, String, Long)] = {
    val fpRow = docs.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(doc_id, text))"), lit(0L)).as("fp"))
      .head()
    val key = s"$cacheKey|${fpRow.getLong(0)}|${fpRow.getLong(1)}|$nMerges"
    mergeCache.computeIfAbsent(key, _ => learnMerges(docs, nMerges))
  }

  /** Greedy BPE ENCODE of a word under a learned merge table: repeatedly
    * merge the lowest-rank (earliest-learned) adjacent pair — the
    * standard inference rule, exactly the training merge order replayed.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    var continue = syms.length > 1
    while (continue) {
      val best = syms.iterator.zip(syms.iterator.drop(1))
        .map(p => (p, ranks.get(p)))
        .collect { case (p, Some(r)) => (r, p) }
        .minByOption(_._1)
      best match {
        case Some((_, (a, b))) => syms = mergeOnce(syms, a, b)
        case None => continue = false
      }
      if (syms.length < 2) continue = false
    }
    syms
  }

  /** Corpus-scale encode under a learned merge table, the vocab-level
    * way: the greedy merge loop runs ONCE per DISTINCT word (a UDF over
    * the word-count table — there is no builtin for an iterative
    * rank-greedy fold), and the corpus gets its subword counts back
    * through an equi-join on the word — the corpus itself never pays
    * per-token merge loops. Output: (doc_id, n_words, n_subwords) — the
    * per-document compression the tokenizer achieves. The merge table
    * rides the closure (two strings per merge, KBs at production 32k).
    */
  def encodeStats(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val encLen = udf((w: String) => encodeWord(w, ranks).length)
    val perWord = wordCounts(docs)
      .select(col("w"), encLen(col("w")).as("n_sub"))
    Scale.parallelismFloor(docs)
      .select(col("doc_id"), explode(TextRetrieval.tokensCol(col("text"))).as("w"))
      .join(perWord, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
  }
}
