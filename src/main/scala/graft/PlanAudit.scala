package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected registry queries
  * so plan quality (PushedFilters, ReadSchema pruning, broadcast joins,
  * WholeStageCodegen spans) can be audited. Usage:
  *   runMain graft.PlanAudit <sfDir> [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q3_top_revenue_orders", "q5_revenue_by_nation",
        "s1_history_last10", "t4_knn_cosine", "dedup_embedding_cosine",
        "dedup_ngram_jaccard", "j3_dedup_gate", "o13_retention",
        "pretrain_corpus_pipeline", "j8_interval_enrich", "j9_range_window_auto",
        "bm25_topk", "mix_temperature_sample")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        println(s"\n========== $n ==========")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
