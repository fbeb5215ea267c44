package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit => LWindowGroupLimit}

/** Registry-WIDE plan audit (r5 verdict #7): every registered query's
  * plan is checked for the two 100 TB scale-killers this project has
  * actually had to remove —
  *
  *  1. pairwise joins: `CartesianProduct` is forbidden outright;
  *     `BroadcastNestedLoopJoin` is allowed only where the broadcast
  *     side is a BOUNDED frame (a probe/query set or a 1-row statistics
  *     aggregate) and the query is named in the allowlist below, so a
  *     refactor that silently turns an equi-join into a nested loop
  *     fails here, not at cluster scale;
  *  2. content-key windows: a Window/WindowGroupLimit whose partition
  *     spec references ONLY content-valued columns (lines, grams,
  *     shingles, bands, raw text) serializes a Zipfian key — one
  *     boilerplate line with 10⁹ copies — into a single task, and
  *     unlike a join partition it cannot be AQE-skew-split. The
  *     line/span dedup and df-cap rewrites removed every instance; this
  *     gate keeps them out. Windows keyed by an entity id (doc_id,
  *     query_id, user_id...), alone or alongside content columns, are
  *     fine: their cardinality is the entity's row count, not the
  *     corpus's hot-key count.
  *
  * The audit walks the OPTIMIZED logical plan for windows (stable under
  * AQE re-planning) and the physical plan string for join strategies,
  * the same source the per-query PlanQualitySpec assertions read.
  */
class RegistryPlanAuditSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose BroadcastNestedLoopJoin is the intended plan: the
    * broadcast side is a bounded probe/query set (kNN brute force — the
    * corpus side streams and never shuffles) or a broadcast 1-row
    * aggregate attach. Each entry must actually exhibit a BNLJ — a
    * stale entry fails the audit too, so the list cannot rot.
    */
  private val boundedBroadcastNlj: Set[String] = Set(
    // brute-force kNN: crossJoin(broadcast(queries)) — the probe set is
    // bounded and the corpus side streams map-only, never shuffles
    "t4_knn_cosine", "p9_filtered_knn", "t7_stuff_context",
    "rag_chat_pipeline", "rag_chat_hybrid", "retrieval_hybrid_rrf",
    // retrieval_eval: kNN brute force inside the hybrid leg + the
    // 5-row broadcast static-baseline attach — both bounded frames
    // (r19 melt: labels and retriever legs are inline in one adaptive
    // execution, so the BNLJ remains in the plan)
    "retrieval_eval",
    // ann_recall(_murmur): the exact-brute-force arm IS the recall
    // yardstick — broadcast bounded probe set, corpus streams map-only
    "ann_recall", "ann_recall_murmur",
    "ann_quantized_topk", "ann_quantized_rerank",
    // PQ ADC scan: broadcast bounded query set against the m-byte code
    // table (self-pair exclusion makes the join non-equi)
    // (ann_pq_trained_topk left this list when it moved onto the
    // cell-partitioned layout: its probe is now an equi-join on `cell`.)
    // ann_opq_adc_topk is the same flat ADC probe over the ROTATED
    // corpus — identical bounded-broadcast shape.
    "ann_pq_adc_topk", "ann_opq_adc_topk",
    // broadcast 1-row corpus-statistics attach (n_docs/avgdl/LM totals)
    "bm25_topk", "tfidf_top_terms", "text_perplexity", "text_perplexity_sb",
    "text_rarity_score")
    // (dsir_weights/dsir_select left this list in r19: the corpus
    // totals moved from a broadcast 1-row crossJoin onto a bounded
    // global window over the ≤nBuckets-row λ table — no NLJ remains.)

  /** Column names that hold content values (not entity ids) anywhere in
    * the registry's lineages.
    */
  private val contentCols = Set(
    "line", "line_h", "gram", "gram_h", "shingle", "band", "term",
    "text", "qtext", "chunk_text", "cleaned_text", "tok", "toks")

  test("all registered queries: no cartesian, NLJ only where allowlisted, no content-key windows") {
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    val sawNlj = scala.collection.mutable.Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val physical = df.queryExecution.executedPlan.toString
        if (physical.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct in physical plan"
        if (physical.contains("BroadcastNestedLoopJoin")) {
          sawNlj += name
          if (!boundedBroadcastNlj.contains(name))
            failures += s"$name: BroadcastNestedLoopJoin outside the bounded-broadcast allowlist"
        }
        val windows = df.queryExecution.optimizedPlan.collect {
          case w: LWindow => w.partitionSpec
          case w: LWindowGroupLimit => w.partitionSpec
        }
        windows.foreach { spec =>
          val refs = spec.flatMap(_.references.map(_.name)).toSet
          if (refs.nonEmpty && refs.forall(r => contentCols.contains(r.toLowerCase)))
            failures += s"$name: window partitioned only by content columns ${refs.mkString(",")}"
        }
      } catch {
        case e: Exception => failures += s"$name: plan build failed: ${e.getMessage}"
      }
    }
    val stale = boundedBroadcastNlj -- sawNlj
    if (stale.nonEmpty)
      failures += s"stale allowlist entries (no BNLJ in plan): ${stale.mkString(", ")}"
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
