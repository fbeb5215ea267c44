package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence main for the r18-verdict #5 duty: the two deliberate
  * small-scale regressions (the pretrain narrow-proxy checkpoint and the
  * retrieval_eval label checkpoint) claim to win once the corpus
  * outgrows the per-stage fixed overhead — this probe MEASURES that
  * crossover on a row-inflated corpus instead of asserting it.
  *
  * `runMain graft.R19ScaleProbe [inflate] [iters]` (defaults 16, 3):
  * copies sf0.1 documents+embeddings into a temp dir with doc_id-shifted
  * replicas, then times each query twice — checkpoint ON (the shipped
  * shape) and OFF (via the `spark.graft.pretrain.proxyCheckpoint` /
  * `spark.graft.retrievaleval.labelsCheckpoint` evidence knobs) — and
  * prints per-variant medians. Results are recorded in SCALE.md; the
  * knobs exist only for this probe and specs, never set on the query
  * path.
  */
object R19ScaleProbe {
  def main(args: Array[String]): Unit = {
    val inflate = if (args.length > 0) args(0).toInt else 16
    val iters = if (args.length > 1) args(1).toInt else 3
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_r19probe").toString
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until inflate)
      .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    spark.read.parquet(s"$src/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val nDocs = spark.read.parquet(s"$tmp/documents.parquet").count()
    println(s"[r19probe] inflated corpus: $nDocs docs under $tmp")

    def timeQuery(name: String, conf: String, enabled: Boolean): Double = {
      spark.conf.set(conf, enabled.toString)
      try {
        spark.sparkContext.setJobDescription(s"$name ckpt=$enabled")
        val t = (0 to iters).map { i =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, tmp).count()
          (System.nanoTime() - t0) / 1e9
        }.drop(1).sorted // drop warm-up, median of the rest
        t(t.length / 2)
      } finally {
        spark.conf.unset(conf)
        spark.sparkContext.setJobDescription(null)
      }
    }
    Seq(
      ("pretrain_corpus_pipeline", "spark.graft.pretrain.proxyCheckpoint"),
      ("retrieval_eval", "spark.graft.retrievaleval.labelsCheckpoint"))
      .foreach { case (name, conf) =>
        val on = timeQuery(name, conf, enabled = true)
        val off = timeQuery(name, conf, enabled = false)
        println(f"[r19probe] $name inflate=$inflate ckpt_on=$on%.3f s " +
          f"ckpt_off=$off%.3f s ratio_off_over_on=${off / on}%.2f")
      }
    spark.stop()
  }
}
