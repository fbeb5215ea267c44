package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[AnnOracle]] assembly contract: the static LSH mirrors are
  * always present, the trained tiers appear exactly when their captures
  * are set, and the embedded literals are shortest-roundtrip doubles
  * (the cross-engine exactness the generated SQL depends on). The SQL
  * SEMANTICS are pinned by the driver's DuckDB compare (178 OK at
  * sf0.01) — an engine this spec cannot reach from Scala.
  */
class AnnOracleSpec extends AnyFunSuite {

  private def floats(seed: Int, n: Int): Array[Float] =
    Array.tabulate(n)(i => ((seed * 31 + i * 7) % 13 - 6) / 7.0f)

  private val cents8 = Array.tabulate(8)(c => floats(c, 64))
  private val books8: Seq[Seq[Seq[Double]]] =
    Seq.tabulate(8)(s => Seq.tabulate(16)(c =>
      floats(s * 16 + c, 8).map(_.toDouble).toSeq))

  test("static LSH mirrors are always present") {
    val prev = (AnnOracle.mainCentroids, AnnOracle.globalBooks)
    try {
      AnnOracle.mainCentroids = None
      AnnOracle.globalBooks = None
      val keys = AnnOracle.sqlEntries.keySet
      assert(keys.contains("ann_lsh_topk"))
      assert(keys.contains("ann_lsh_multiprobe"))
      assert(keys.contains("ann_lsh_partitioned_adaptive"))
      // trained tiers absent without captures — the rows-only fallback
      assert(!keys.contains("ann_ivf_topk"))
      assert(!keys.contains("ann_ivfpq_topk"))
    } finally {
      AnnOracle.mainCentroids = prev._1
      AnnOracle.globalBooks = prev._2
    }
  }

  test("every trained tier assembles under full captures") {
    val prev = (AnnOracle.mainCentroids, AnnOracle.globalBooks,
      AnnOracle.residualBooks, AnnOracle.localBooks,
      AnnOracle.opqRotation, AnnOracle.opqBooks, AnnOracle.opqCentroids)
    try {
      AnnOracle.mainCentroids = Some(("dir|100|1|8|3", cents8))
      AnnOracle.globalBooks = Some(("dir|100|1|8|8|16|5", books8))
      AnnOracle.residualBooks = Some(("dir|res1|100|1|8|8|16|5", books8))
      AnnOracle.localBooks =
        Some(("dir|lopq1|100|1|8|8|16|5|2000", (0 until 8).map(_ -> books8).toMap))
      AnnOracle.opqRotation =
        Some(("opq|dir|100|1|8|8|16|8|8", Array.tabulate(64)(i => floats(i, 64))))
      AnnOracle.opqBooks = Some(("opq|dir|100|1|8|8|16|8|8", books8))
      AnnOracle.opqCentroids = Some(("dir|opq|100|1|8|3", cents8))
      val entries = AnnOracle.sqlEntries
      val expected = Set(
        "ann_lsh_topk", "ann_lsh_multiprobe", "ann_lsh_partitioned_adaptive",
        "ann_recall_murmur",
        "ann_ivf_topk", "ann_rule_topk", "ann_pq_trained_topk",
        "ann_ivfpq_topk", "ann_ivfpq_join", "ann_ivfpq_incremental",
        "ann_ivfpq_rerank", "ann_ivfpq_residual_topk",
        "ann_ivfpq_residual_rerank", "ann_ivfpq_local_topk",
        "ann_ivfpq_local_rerank", "ann_opq_adc_topk", "ann_ivfpq_opq_topk")
      assert(entries.keySet == expected,
        s"missing=${expected.diff(entries.keySet)} extra=${entries.keySet.diff(expected)}")
      // every entry must name the Spark output columns it is compared on
      entries.foreach { case (name, sql) =>
        val cols =
          if (name == "ann_rule_topk") Seq("vec_id", "sim")
          else if (name == "ann_recall_murmur") Seq("query_id", "n_hit", "recall_at_k")
          else if (name.endsWith("_rerank")) Seq("query_id", "rank", "vec_id", "d2")
          else if (name.startsWith("ann_lsh") || name == "ann_ivf_topk") Seq("query_id", "rank", "vec_id", "sim")
          else Seq("query_id", "rank", "vec_id", "adc_dist")
        cols.foreach(c => assert(sql.contains(c), s"$name missing column $c"))
      }
    } finally {
      AnnOracle.mainCentroids = prev._1
      AnnOracle.globalBooks = prev._2
      AnnOracle.residualBooks = prev._3
      AnnOracle.localBooks = prev._4
      AnnOracle.opqRotation = prev._5
      AnnOracle.opqBooks = prev._6
      AnnOracle.opqCentroids = prev._7
    }
  }

  test("capture routing: |opq cacheKey suffix lands in opqCentroids") {
    val prevMain = AnnOracle.mainCentroids
    val prevOpq = AnnOracle.opqCentroids
    try {
      val a = Array(floats(1, 64))
      val b = Array(floats(2, 64))
      AnnOracle.captureCentroids("/some/dir|100|1|8|3", a)
      AnnOracle.captureCentroids("/some/dir|opq|100|1|8|3", b)
      assert(AnnOracle.mainCentroids.exists(_._2 eq a))
      assert(AnnOracle.opqCentroids.exists(_._2 eq b))
      // a capture under DIFFERENT params must not feed the mirrors
      AnnOracle.captureCentroids("/some/dir|100|1|16|5", a)
      assert(!AnnOracle.sqlEntries.contains("ann_ivf_topk"),
        "param-mismatched capture leaked into a mirror")
    } finally {
      AnnOracle.mainCentroids = prevMain
      AnnOracle.opqCentroids = prevOpq
    }
  }

  test("embedded literals round-trip to the identical IEEE double") {
    val samples = Seq(0.0, -0.0, 1.0 / 3.0, -2.7182818284590455e-7,
      Float.MinPositiveValue.toDouble, 123456.78911111e11,
      graft.operators.Ann.planeComp(3, 17).toDouble)
    val prev = AnnOracle.mainCentroids
    try {
      // Drive the literals through the real generator: one centroid row
      // carrying the samples (padded to dim 64), then parse them back
      // out of the VALUES clause.
      val cv = (samples ++ Seq.fill(64 - samples.size)(0.5)).map(_.toFloat)
      AnnOracle.mainCentroids = Some(("dir|100|1|8|3", Array(cv.toArray)))
      val sql = AnnOracle.sqlEntries("ann_ivf_topk")
      val row = sql.linesIterator.find(_.trim.startsWith("(0, [")).get
      val nums = row.trim.stripPrefix("(0, [").takeWhile(_ != ']')
        .split(", ").map(_.toDouble)
      cv.zip(nums).foreach { case (f, parsed) =>
        assert(java.lang.Double.doubleToLongBits(f.toDouble) ==
          java.lang.Double.doubleToLongBits(parsed) ||
          (f == 0.0f && parsed == 0.0),
          s"literal $f round-tripped to $parsed")
      }
    } finally AnnOracle.mainCentroids = prev
  }
}
