package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics. [[Dedup.duplicateClusters]] covers the
  * connected-components class; this adds the fixed-point ranking class —
  * weighted PageRank (Page et al. 1999, "The PageRank Citation
  * Ranking"), the standard importance prior a crawl pipeline puts on
  * domains/pages when deciding what to fetch and keep (Common Crawl
  * publishes exactly this family of host-level rank signals).
  */
object Graphs {

  /** Click-stream transition graph from an event log: each user's
    * consecutive events (by ts, event_id) emit a directed edge
    * item_i → item_j (self-loops dropped), weighted by transition
    * count — the web-graph shape PageRank consumes. One window shuffle
    * on `user_id`, one aggregation on the edge key.
    */
  def itemTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .withColumn("next_item", lead("item", 1).over(w))
      .filter(col("next_item").isNotNull && col("next_item") =!= col("item"))
      .groupBy(col("item").as("src"), col("next_item").as("dst"))
      .agg(count(lit(1)).cast("double").as("weight"))
  }

  /** Weighted PageRank over directed `edges(src, dst, weight)`:
    *
    *   pr(v) = (1−d)/N + d·( Σ_{u→v} pr(u)·w(u,v)/outW(u) + dangling/N )
    *
    * for a fixed `iters` power iterations from the uniform vector, with
    * the full mass of dangling nodes (no out-edges) redistributed
    * uniformly — so the ranks sum to 1 at every step.
    *
    * Scale shape: the per-iteration work is one equi-join of edges with
    * the current (one-row-per-node) rank frame on `src` and one
    * aggregation on `dst` — both hash-partitioned on node keys that AQE
    * can co-partition across iterations; the only driver-side values per
    * iteration are two scalar aggregates (dangling mass; nothing
    * node-sized is ever collected). Each iteration's rank frame is
    * eagerly localCheckpoint'ed: the lineage (and the join-size
    * statistics) reset every round instead of compounding across the
    * fixed point — the iterative-loop discipline the BPE trainer
    * established.
    */
  def pageRank(
      edges: DataFrame,
      damping: Double = 0.85,
      iters: Int = 15): DataFrame = {
    val e = edges.select(
      col("src"), col("dst"),
      coalesce(col("weight").cast("double"), lit(1.0)).as("w"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")
    // Normalized transition shares and the per-node dangling flag are
    // ITERATION-INVARIANT — build them once, checkpoint once; each
    // iteration then costs exactly one materialization job (the
    // localCheckpoint), with the dangling-mass total riding the lineage
    // as a broadcast 1-row aggregate instead of a per-iteration
    // driver collect.
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val shares = e.join(outW, "src")
      .select(col("src").as("node"), col("dst"),
        (col("w") / col("out_w")).as("share"))
      .localCheckpoint(true)
    val marked = nodes.join(
        outW.select(col("src").as("node"), lit(true).as("has_out")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("has_out"), lit(false)).as("has_out"))
      .localCheckpoint(true)
    var pr = marked.withColumn("pr", lit(1.0 / n)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val mass = pr.agg(
        coalesce(sum(when(!col("has_out"), col("pr"))), lit(0.0)).as("dangling"))
      val contrib = shares.join(pr.select(col("node"), col("pr")), Seq("node"))
        .select(col("dst").as("node"), (col("pr") * col("share")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_c"))
      pr = marked.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(mass))
        .select(col("node"), col("has_out"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("in_c"), lit(0.0)) +
              col("dangling") / lit(n.toDouble)))
            .as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("node"), col("pr"))
  }
}
