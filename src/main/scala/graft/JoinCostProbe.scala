package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: decompose the distributed ANN joins' fixed
  * per-invocation costs (pruning job, salt machinery, scan shape) at a
  * given SF. Not part of the driver contract.
  */
object JoinCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val base = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_ann_layouts").getAbsolutePath
    val layout = operators.Ann.signaturePartitionedLayoutMurmur(spark, emb, base, nBits = 8)
    val (centroids, _) =
      operators.Ann.buildIvfCached(spark, emb, cacheKey = sfDir, nCells = 8, maxIter = 3)
    val cellLayout = operators.Ann.cellLayout(spark, emb, base, centroids)
    val qs = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    def med(f: => Long): Double = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    val tLshPrune = med(operators.Ann.lshJoin(spark, layout, qs, k = 5,
      nBits = 8, probeBits = 2).count())
    val tLshNoPrune = med(operators.Ann.lshJoin(spark, layout, qs, k = 5,
      nBits = 8, probeBits = 2, pruneBits = -1).count())
    val tLshNoSalt = med(operators.Ann.lshJoin(spark, layout, qs, k = 5,
      nBits = 8, probeBits = 2, pruneBits = -1, hotSigCap = 0).count())
    val tIvfPrune = med(operators.Ann.ivfJoin(spark, cellLayout, qs, centroids,
      k = 5, nProbe = 3).count())
    val tIvfNoPrune = med(operators.Ann.ivfJoin(spark, cellLayout, qs, centroids,
      k = 5, nProbe = 3, pruneCells = false).count())
    val tIvfNoSalt = med(operators.Ann.ivfJoin(spark, cellLayout, qs, centroids,
      k = 5, nProbe = 3, pruneCells = false, hotCellCap = 0).count())
    println(f"""{"lsh_prune":$tLshPrune%.3f,"lsh_noprune":$tLshNoPrune%.3f,""" +
      f""""lsh_nosalt_noprune":$tLshNoSalt%.3f,"ivf_prune":$tIvfPrune%.3f,""" +
      f""""ivf_noprune":$tIvfNoPrune%.3f,"ivf_nosalt_noprune":$tIvfNoSalt%.3f}""")
    spark.stop()
  }
}
