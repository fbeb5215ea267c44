package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times EVERY registry query on SPARK_GRAFT_SF_DIR and
  * prints ONE short JSON line.
  *
  * The driver captures only a bounded (~2000 char) tail of stdout, so the
  * stdout line carries totals + the top-10 slowest queries, while the full
  * per-query timing map goes to BENCH_full.json — previously only a
  * 34-query headline subset was timed at all, leaving the other ~50
  * registry queries free to regress silently. Each query runs four times:
  * one warm-up iteration (dropped — absorbs codegen/JIT for that plan
  * shape) then three timed iterations, reporting the MEDIAN. Min-of-2 (the
  * old scheme) cannot absorb a machine-wide stall spanning both
  * iterations — r3's recorded q1 at 7.79 s vs 0.65 s reproducible was
  * exactly that; a median of three timed runs survives any single stall.
  * `headline34` preserves the round-2 subset total so round-over-round
  * comparison stays apples to apples.
  */
object Bench {
  /** The round-2 stdout subset, kept as a stable cross-round comparand. */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_revenue_by_nation",
    "q18_large_orders", "cube_counts", "s1_history_last10", "w3_sliding_rate",
    "j1_broadcast_brand_revenue", "j4_purge_expired", "audit_orphans",
    "t1_split_chunks", "t4_knn_cosine", "t7_stuff_context",
    "t6_exact_dedup", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding_cosine",
    "ann_lsh_topk", "ann_ivf_topk", "ann_quantized_topk",
    "bm25_topk", "tfidf_top_terms", "dedup_clusters", "pack_sequences",
    "text_quality", "text_tokens", "text_contamination",
    "ingest_pipeline", "rag_chat_pipeline", "multimodal_near_dup",
    "j6_asof_attribution", "j7_range_band_join", "mix_temperature_sample")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val fullOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-footer paths once so the first timed
    // query doesn't absorb session start-up (~3s of JIT + classloading).
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
    } catch { case _: Throwable => }
    val registry = SparkEntry.queries
    val missing = headline.filterNot(registry.contains)
    require(missing.isEmpty, s"headline names not in registry: $missing")
    // Deterministic order: headline first (cross-round comparand timed
    // under the same warm-up position as round 2), then the rest sorted.
    val names = headline ++ registry.keys.toSeq.filterNot(headline.contains).sorted
    val resultsFull = names.map { name =>
      val runs = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        try { registry(name)(spark, sfDir).count() } catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }
      val timed = runs.drop(1).sorted // drop warm-up; median of 3 timed runs
      (name, timed(timed.length / 2), timed.head, timed.last)
    }
    val results = resultsFull.map { case (n, med, _, _) => n -> med }
    def r3(v: Double): String = f"$v%.3f"
    def jmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val h34 = results.filter(r => headline.contains(r._1)).map(_._2).sum
    val top10 = results.sortBy(-_._2).take(10)
    // Per-query [min, max] of the timed runs goes to the full file only:
    // a wide spread marks a measurement disturbed by machine noise, so a
    // reader can tell a real regression from a contended run.
    val spread = resultsFull
      .map { case (n, _, mn, mx) => "\"" + n + "\":[" + r3(mn) + "," + r3(mx) + "]" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(fullOut),
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","iters":3,""" +
        s""""n_queries":${results.size},"headline34":${r3(h34)},""" +
        s""""queries":${jmap(results)},"spread":$spread,"sf":"$sfDir"}""" + "\n")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","iters":3,""" +
        s""""n_queries":${results.size},"headline34":${r3(h34)},""" +
        s""""queries":${jmap(top10)},"full":"$fullOut","sf":"$sfDir"}"""
    // Hard guard: the driver's stdout tail capture is 2000 chars.
    require(line.length < 1800, s"bench JSON too long (${line.length})")
    println(line)
    spark.stop()
  }
}
