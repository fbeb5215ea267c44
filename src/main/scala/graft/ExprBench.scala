package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-profiler for expression-level A/B (the map-stage cost a
  * full registry query hides behind its joins): times the fused
  * [[graft.expressions.CharShingles]] against the HOF twin it replaced
  * over the sf documents table. `runMain graft.ExprBench [n] [iters]`.
  */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5
    val iters = if (args.length > 1) args(1).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).cache()
    docs.count()
    def time(tag: String)(f: => Long): Unit =
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"[exprbench] $tag iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (sum=$r)")
      }
    time("fused") {
      docs.select(sum(size(functions.TextAnalysis.charShingles(col("text"), n))))
        .head().getLong(0)
    }
    time("hof") {
      docs.select(sum(size(functions.TextAnalysis.charShinglesHof(col("text"), n))))
        .head().getLong(0)
    }
    // DSIR term stream (unigrams + zip_with bigrams) vs tokens alone —
    // isolates the bigram HOF's marginal cost over the regex split.
    time("dsir_terms") {
      docs.select(sum(size(operators.Scale.dsirTermsCol(col("text")))))
        .head().getLong(0)
    }
    time("tokens_only") {
      docs.select(sum(size(operators.TextRetrieval.tokensCol(col("text")))))
        .head().getLong(0)
    }
    // span-dedup per-window gram hashing, fused vs HOF
    val toksDf = docs.select(split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
    time("gram_fused") {
      toksDf.select(sum(size(operators.Dedup.gramHashes(col("toks"), n))))
        .head().getLong(0)
    }
    time("gram_hof") {
      toksDf.select(sum(size(operators.Dedup.gramHashesHof(col("toks"), n))))
        .head().getLong(0)
    }
    spark.stop()
  }
}
