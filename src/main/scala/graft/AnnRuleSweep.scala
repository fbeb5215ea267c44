package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parameter sweep for the `ann_rule_ivfpq` rewrite tier (r16 verdict
  * #2): measures recall@k and wall time of the two-stage PQ probe
  * (ADC coarse cut at k·overfetch → exact cosine rerank) against the
  * exact brute-force top-k, for each (nProbe, overfetch) point, on the
  * REAL layout + trained books the registry query runs on. Prints one
  * JSON line per point so the adopted operating point in
  * [[SparkEntry]]/[[Verify]] is a measured figure, not a guess.
  *
  * Usage: `runMain graft.AnnRuleSweep [sfDir]` (default sf0.1 — the
  * scale the r16 verdict graded the 0.273 recall at).
  */
object AnnRuleSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    val embPath = s"$sfDir/embeddings.parquet"
    val emb = Tables.embeddings(spark, sfDir)
    val (centroids, _) =
      operators.Ann.buildIvfCached(spark, emb, cacheKey = sfDir, nCells = 8, maxIter = 3)
    val books = operators.Ann.trainPqCodebooksCached(
      emb, cacheKey = sfDir, m = 8, dsub = 8, kStar = 16, maxIter = 5)
    val base = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_ann_layouts").getAbsolutePath
    val layout = operators.Ann.ivfPqLayout(spark, emb, base, centroids, books)

    val k = 11
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    def naive() = spark.read.parquet(embPath)
      .select(col("vec_id"),
        expressions.VectorExpressions.cosineSim(typedLit(q), col("embedding")).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
    val exact = naive().select("vec_id").collect().map(_.getLong(0)).toSet

    // Collect vec_ids from the SAME Dataset whose plan gets audited —
    // wrapping in .select() re-plans and can un-fire the rewrite (the
    // r15 ann_rule_topk lesson), which would print a phantom recall
    // 1.000 (the exact plan's recall) for an un-fired point.
    def auditedVecIds(requireFired: Option[String]): Set[Long] = {
      val df = naive()
      requireFired.foreach { marker =>
        val leaves = df.queryExecution.executedPlan
          .collectLeaves().map(_.toString).mkString
        require(leaves.contains("PartitionFilters") && leaves.contains(marker),
          s"rule did not fire (expected marker '$marker' in the scan)")
      }
      df.collect().map(_.getLong(0)).toSet
    }

    // also report the exact-cell tier's recall at each nProbe — the
    // coverage ceiling the PQ tier can at best reach
    for (nProbe <- Seq(5, 6, 7)) {
      plans.AnnTopKRewrite.register(embPath,
        plans.AnnTopKRewrite.RegisteredLayout(
          operators.Ann.cellLayout(spark, emb, base, centroids),
          centroids, nProbe))
      try {
        val got = auditedVecIds(Some("cell"))
        val recall = exact.count(got.contains).toDouble / exact.size
        println(f"""{"tier":"exact","nProbe":$nProbe,"recall":$recall%.3f}""")
      } finally plans.AnnTopKRewrite.unregister(embPath)
    }

    for (nProbe <- Seq(5, 6, 7); overfetch <- Seq(4, 8, 16, 32, 64)) {
      plans.AnnTopKRewrite.registerPq(embPath,
        plans.AnnTopKRewrite.RegisteredPqLayout(
          layout, centroids, books, nProbe = nProbe, overfetch = overfetch))
      try {
        // warm once (audited), then median of 3 timed runs
        val got = auditedVecIds(Some("ivfpq_"))
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); naive().collect(); (System.nanoTime() - t0) / 1e9
        }.sorted
        val recall = exact.count(got.contains).toDouble / exact.size
        println(f"""{"tier":"ivfpq","nProbe":$nProbe,"overfetch":$overfetch,""" +
          f""""recall":$recall%.3f,"med_sec":${times(1)}%.3f}""")
      } finally plans.AnnTopKRewrite.unregisterPq(embPath)
    }

    // RESIDUAL (IVFADC) tier over the same grid (r18): codes quantize
    // x − centroid(cell); the rewrite scores with per-probed-cell
    // residual LUTs. Better ADC ordering ⇒ the same over-fetch should
    // buy ≥ the plain tier's recall.
    val resBooks = operators.Ann.trainPqCodebooksResidualCached(
      emb, cacheKey = sfDir, centroids, m = 8, dsub = 8, kStar = 16, maxIter = 5)
    val resLayout = operators.Ann.ivfPqResidualLayout(
      spark, emb, base, centroids, resBooks)
    for (nProbe <- Seq(5, 6, 7); overfetch <- Seq(4, 8, 16, 32, 64)) {
      plans.AnnTopKRewrite.registerPq(embPath,
        plans.AnnTopKRewrite.RegisteredPqLayout(
          resLayout, centroids, resBooks, nProbe = nProbe,
          overfetch = overfetch, residual = true))
      try {
        val got = auditedVecIds(Some("ivfpqr_"))
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); naive().collect(); (System.nanoTime() - t0) / 1e9
        }.sorted
        val recall = exact.count(got.contains).toDouble / exact.size
        println(f"""{"tier":"ivfpq_residual","nProbe":$nProbe,"overfetch":$overfetch,""" +
          f""""recall":$recall%.3f,"med_sec":${times(1)}%.3f}""")
      } finally plans.AnnTopKRewrite.unregisterPq(embPath)
    }
    spark.stop()
  }
}
