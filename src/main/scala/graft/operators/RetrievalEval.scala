package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Retrieval-quality evaluation: recall@k, precision@k, MRR@k and
  * nDCG@k per query plus a macro-average row, over any retriever that
  * produces `(query_id, doc_id, rank)` top-k lists.
  *
  * The reference ships a retriever (chroma_utils.py:237-263) but no way
  * to measure it; any production RAG stack tunes k / fusion weights /
  * chunking against exactly these metrics, so the evaluation harness is
  * a first-class operator here. Labels are graded rather than binary
  * (`rel` = strength of the query↔doc match) so nDCG exercises the
  * gain ladder, and the same label set evaluates every retriever —
  * that is the point of an eval harness: one yardstick, many systems.
  *
  * Design for 100 TB: the evaluator itself never touches the corpus —
  * its inputs are top-k lists (O(queries · k) rows) and a label table
  * (O(queries · labels_per_query)), joined on (query_id, doc_id) and
  * aggregated per query; the macro row reduces O(queries) rows. Label
  * GENERATION ([[gradedTermOverlapLabels]]) is the only corpus-scale
  * stage: one tokenize scan semi-joined to the broadcast query
  * vocabulary (the same query-bounded prune as
  * [[TextRetrieval.bm25TopK]]), so only docs sharing a query term reach
  * the shuffle. No cross joins; all windows partition on query_id
  * (query-bounded cardinality, never a content key).
  *
  * Cross-engine determinism: nDCG uses natural-log position discounts —
  * the log base cancels in the DCG/IDCG ratio, and `ln` is the one
  * log both engines evaluate bit-identically in the existing BM25
  * oracle (`log2` would pit JVM `log(x)/log(2)` against libm `log2`).
  * Every emitted metric is floored at 6 decimals
  * ([[TextAnalysis.floorScale]]); the macro row averages the FLOORED
  * per-query metrics so both engines average identical inputs.
  */
object RetrievalEval {

  /** Graded relevance labels from query-term overlap: `rel` = number of
    * DISTINCT query terms present in the document's token set (docs with
    * zero overlap get no row). Deterministic, corpus-derived ground
    * truth — the standard trick for eval fixtures without human labels.
    * Tokenization matches [[TextRetrieval.tokensCol]] so the labels
    * live in the same term space as the lexical retrievers they judge.
    */
  def gradedTermOverlapLabels(docs: DataFrame, queries: DataFrame): DataFrame = {
    val qterms = queries
      .select(col("query_id"),
        explode(TextRetrieval.tokensCol(col("qtext"))).as("term"))
      .distinct()
    docs
      .select(col("doc_id"), explode(TextRetrieval.tokensCol(col("text"))).as("term"))
      .distinct()
      .join(broadcast(qterms), "term")
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).cast("int").as("rel"))
  }

  /** Per-query rank metrics at cutoff `k` for one retriever, plus a
    * macro row under `query_id = -1` (counts summed, metrics averaged).
    *
    * `retrieved`: (query_id, doc_id, rank) — ranks start at 1; rows
    * beyond `k` are ignored, so callers may pass deeper lists.
    * `labels`: (query_id, doc_id, rel) graded relevance; `rel <= 0`
    * rows are dropped. Every labeled query gets an output row even if
    * the retriever returned nothing for it (all-zero metrics) — silent
    * query loss would inflate macro averages.
    */
  def evaluate(retrieved: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    val rel = labels.filter(col("rel") > 0)
    val nRel = rel.groupBy("query_id")
      .agg(count(lit(1)).as("n_rel"))
    // Ideal DCG: labels ranked by grade (doc_id tiebreak), top k.
    val wIdeal = Window.partitionBy("query_id").orderBy(desc("rel"), asc("doc_id"))
    val idcg = rel
      .withColumn("pos", row_number().over(wIdeal))
      .filter(col("pos") <= k)
      .groupBy("query_id")
      .agg(sum((pow(lit(2.0), col("rel")) - lit(1.0)) /
        log(col("pos") + lit(1.0))).as("idcg"))
    val hits = retrieved
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "rank")
      .join(rel, Seq("query_id", "doc_id"))
    val hitAgg = hits.groupBy("query_id").agg(
      count(lit(1)).as("n_hits"),
      min(col("rank")).as("first_hit"),
      sum((pow(lit(2.0), col("rel")) - lit(1.0)) /
        log(col("rank") + lit(1.0))).as("dcg"))
    nRel
      .join(idcg, Seq("query_id"))
      .join(hitAgg, Seq("query_id"), "left")
      .select(
        col("query_id"),
        col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        TextAnalysis.floorScale(
          coalesce(col("n_hits"), lit(0L)) / col("n_rel"), 6).as("recall_at_k"),
        TextAnalysis.floorScale(
          coalesce(col("n_hits"), lit(0L)) / lit(k.toDouble), 6).as("precision_at_k"),
        TextAnalysis.floorScale(
          coalesce(lit(1.0) / col("first_hit"), lit(0.0)), 6).as("mrr"),
        // +1e-9 before the floor: when the retrieved head IS the ideal
        // ranking, dcg/idcg is mathematically 1 but the two engines sum
        // the identical terms in different orders, so one lands at 1-ulp
        // and would floor to 0.999999. The epsilon absorbs sum-order
        // noise at that structural boundary (and shifts every other
        // floor boundary by a semantically irrelevant 1e-9).
        TextAnalysis.floorScale(
          coalesce(col("dcg"), lit(0.0)) / col("idcg") + lit(1e-9), 6)
          .as("ndcg_at_k"))
  }

  /** [[evaluate]] plus the macro-average summary row (`query_id = -1`).
    *
    * The per-query frame feeds both the output rows and the macro
    * aggregate, so its lineage executes twice — DELIBERATELY left
    * uncut (r18): the frame is O(queries) rows over caller-materialized
    * inputs, and a checkpoint here serializes the three-retriever eval
    * into blocking AQE materializations (measured 1.8 → 4.3 s on
    * retrieval_eval), while the duplicated tiny joins run concurrently
    * inside one adaptive execution. Callers pass MATERIALIZED
    * retrieved/labels frames (the registry checkpoints them) so the
    * duplication never re-runs a corpus pass.
    */
  def evaluateWithMacro(retrieved: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    val per = evaluate(retrieved, labels, k)
    // Same +1e-9 as the per-query ndcg, for a different structural
    // reason: the inputs are exact 1e-6 multiples, so whenever their sum
    // is divisible by the query count the TRUE average sits exactly on a
    // floor boundary — and the engines' different summation orders land
    // one ulp on either side of it.
    val macroRow = per.agg(
      sum(col("n_rel")).as("n_rel"),
      sum(col("n_hits")).as("n_hits"),
      TextAnalysis.floorScale(avg(col("recall_at_k")) + lit(1e-9), 6).as("recall_at_k"),
      TextAnalysis.floorScale(avg(col("precision_at_k")) + lit(1e-9), 6).as("precision_at_k"),
      TextAnalysis.floorScale(avg(col("mrr")) + lit(1e-9), 6).as("mrr"),
      TextAnalysis.floorScale(avg(col("ndcg_at_k")) + lit(1e-9), 6).as("ndcg_at_k"))
      .select(lit(-1L).as("query_id"), col("n_rel"), col("n_hits"),
        col("recall_at_k"), col("precision_at_k"), col("mrr"), col("ndcg_at_k"))
    per.unionByName(macroRow)
  }

  /** Multi-retriever [[evaluateWithMacro]] in ONE pass (r19, guide §2.4):
    * `retrieved` is the MELTED long table `(retriever, query_id, doc_id,
    * rank)` of every system's top-k list, `ks` names each retriever's
    * cutoff. Metric formulas are expression-identical to [[evaluate]] /
    * [[evaluateWithMacro]] — same floors, same +1e-9 guards — so the
    * output rows (per-query plus a `query_id = -1` macro row per
    * retriever) match the per-retriever path bit for bit on any input
    * whose floats sit off the 1e-6 floor boundaries (the guard's
    * documented contract).
    *
    * Why melted: N separate evaluateWithMacro calls duplicate the label
    * subtree 6N ways and each macro row re-executes its per-query
    * lineage — the registered `retrieval_eval` plan ran 352 Exchanges
    * over three retrievers. Here the label table is aggregated ONCE
    * (one window pass produces every cutoff's IDCG as conditional
    * sums), the hit join runs ONCE over the union of lists, and the
    * macro rows come from GROUPING SETS over the per-query frame —
    * `(retriever, query_id)` leaf groups pass metrics through
    * unaggregated (single-row groups) while `(retriever)` groups
    * average them, so the per-query lineage executes exactly once.
    *
    * Preconditions: `ks` lists every retriever present in `retrieved`;
    * `labels` is non-empty (the labeled-query frame drives output rows,
    * exactly like [[evaluate]] — a retriever with no hits still gets
    * all-zero rows for every labeled query).
    */
  def evaluateMeltedWithMacro(
      retrieved: DataFrame,
      labels: DataFrame,
      ks: Seq[(String, Int)]): DataFrame = {
    require(ks.nonEmpty && ks.map(_._1).distinct.size == ks.size,
      "evaluateMeltedWithMacro needs distinct retriever names")
    val spark = retrieved.sparkSession
    import spark.implicits._
    val rel = labels.filter(col("rel") > 0)
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    // One ideal-ranking window pass; each distinct cutoff's IDCG is a
    // conditional sum over the same positioned stream (pos = 1 always
    // exists for a labeled query, so no cutoff sum can be empty-null).
    val wIdeal = Window.partitionBy("query_id").orderBy(desc("rel"), asc("doc_id"))
    val distinctKs = ks.map(_._2).distinct.sorted
    val gain = (pow(lit(2.0), col("rel")) - lit(1.0)) / log(col("pos") + lit(1.0))
    val idcgAggs = distinctKs.map(k =>
      sum(when(col("pos") <= k, gain)).as(s"idcg_$k"))
    val idcg = rel
      .withColumn("pos", row_number().over(wIdeal))
      .groupBy("query_id")
      .agg(idcgAggs.head, idcgAggs.tail: _*)
    val meta = broadcast(ks.toDF("retriever", "k"))
    val hitAgg = retrieved
      .join(meta, "retriever")
      .filter(col("rank") <= col("k"))
      .select("retriever", "query_id", "doc_id", "rank")
      .join(rel, Seq("query_id", "doc_id"))
      .groupBy("retriever", "query_id")
      .agg(
        count(lit(1)).as("n_hits"),
        min(col("rank")).as("first_hit"),
        sum((pow(lit(2.0), col("rel")) - lit(1.0)) /
          log(col("rank") + lit(1.0))).as("dcg"))
    // Every labeled query × every retriever gets a row (all-zero when the
    // retriever missed it) — same population as evaluate()'s nRel ⋈ idcg
    // base, crossed with the retriever list.
    // CASE over the retriever name picks that cutoff's idcg column.
    val idcgFor = ks.tail.foldLeft(
      when(col("retriever") === ks.head._1, col(s"idcg_${ks.head._2}"))) {
      case (acc, (nm, k)) => acc.when(col("retriever") === nm, col(s"idcg_$k"))
    }
    val per = nRel
      .join(idcg, Seq("query_id"))
      .crossJoin(meta)
      .withColumn("idcg", idcgFor)
      .join(hitAgg, Seq("retriever", "query_id"), "left")
      .select(
        col("retriever"),
        col("query_id"),
        col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        TextAnalysis.floorScale(
          coalesce(col("n_hits"), lit(0L)) / col("n_rel"), 6).as("recall_at_k"),
        TextAnalysis.floorScale(
          coalesce(col("n_hits"), lit(0L)) / col("k").cast("double"), 6)
          .as("precision_at_k"),
        TextAnalysis.floorScale(
          coalesce(lit(1.0) / col("first_hit"), lit(0.0)), 6).as("mrr"),
        TextAnalysis.floorScale(
          coalesce(col("dcg"), lit(0.0)) / col("idcg") + lit(1e-9), 6)
          .as("ndcg_at_k"))
    // Per-query rows AND macro rows from one aggregation over `per`:
    // leaf groups (retriever, query_id) hold exactly one row, so
    // first() passes the already-floored metrics through; the rolled-up
    // (retriever) groups average them with the same +1e-9 floor as
    // evaluateWithMacro's macro row.
    def metric(name: String) =
      when(grouping(col("query_id")) === 0, first(col(name)))
        .otherwise(TextAnalysis.floorScale(avg(col(name)) + lit(1e-9), 6))
        .as(name)
    per
      .groupingSets(
        Seq(Seq(col("retriever"), col("query_id")), Seq(col("retriever"))),
        col("retriever"), col("query_id"))
      .agg(
        sum(col("n_rel")).as("n_rel"),
        sum(col("n_hits")).as("n_hits"),
        metric("recall_at_k"),
        metric("precision_at_k"),
        metric("mrr"),
        metric("ndcg_at_k"))
      .select(
        col("retriever"),
        coalesce(col("query_id"), lit(-1L)).as("query_id"),
        col("n_rel"), col("n_hits"), col("recall_at_k"),
        col("precision_at_k"), col("mrr"), col("ndcg_at_k"))
  }
}
