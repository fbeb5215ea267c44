package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (one per operator family)
  * on SPARK_GRAFT_SF_DIR and prints ONE short JSON line.
  *
  * The driver captures only a bounded tail of stdout, so the line must
  * stay well under 2000 chars: a curated headline subset (not all ~70
  * registry queries) with seconds rounded to 3 decimals. Each query is
  * timed over two iterations and the min is reported (steady-state:
  * first iteration absorbs codegen/JIT for that plan shape).
  */
object Bench {
  /** Representative subset spanning scans/joins/aggs/windows, the RAG
    * pipeline, dedup family, ANN, text analysis and multimodal plumbing.
    */
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
    val results = headline.map { name =>
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { registry(name)(spark, sfDir).count() } catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }.min
      name -> secs
    }
    def r3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","iters":2,""" +
        s""""n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}"""
    // Hard guard: the driver's stdout tail capture is 2000 chars.
    require(line.length < 1800, s"bench JSON too long (${line.length})")
    println(line)
    spark.stop()
  }
}
