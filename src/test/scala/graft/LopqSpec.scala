package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Per-cell (LOPQ) codebooks: training determinism, the
  * scored-distance-equals-reconstruction-distance identity, and the core
  * claim — on a corpus whose cells have DIFFERENT local residual
  * structure, per-cell books quantize with lower error than one global
  * residual codebook of the same budget.
  */
class LopqSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val dim = 16
  private val nCells = 4

  /** 4 well-separated clusters; cluster c's residuals live in dims
    * [4c, 4c+4) — per-cell structure a global codebook must smear. */
  private lazy val corpus = {
    val rnd = new scala.util.Random(19)
    Seq.tabulate(400) { i =>
      val c = i % 4
      val v = Array.fill(dim)(0.0f)
      v(c) = 10.0f // cluster offset: cells separate on the first 4 dims
      (0 until 4).foreach(j => v(4 * c + j) += (rnd.nextGaussian() * 1.5).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val centroids = Ann.buildIvf(spark, corpus, nCells, maxIter = 5)._1

  test("per-cell training is deterministic and covers every non-empty cell") {
    val b1 = Ann.trainLocalPqCodebooks(corpus, centroids, m = 4, dsub = 4, kStar = 8)
    val b2 = Ann.trainLocalPqCodebooks(corpus, centroids, m = 4, dsub = 4, kStar = 8)
    assert(b1 == b2)
    val cells = Ann.assignCells(corpus, centroids)
      .select("cell").distinct().as[Int].collect().toSet
    assert(b1.keySet == cells)
    // cells actually trained DIFFERENT books
    assert(b1.values.toSeq.distinct.size > 1)
  }

  test("ADC distance equals distance to the full reconstruction") {
    val books = Ann.trainLocalPqCodebooks(corpus, centroids, m = 4, dsub = 4, kStar = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_lopq").toString
    Ann.writeIvfPqLocalPartitioned(corpus, centroids, books, s"$dir/codes")
    val qs = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val got = Ann.ivfPqLocalTopK(spark, s"$dir/codes", qs, centroids, books,
        k = 5, nProbe = nCells) // probe everything: no coverage error left
      .select("query_id", "vec_id", "adc_dist")
      .as[(Long, Long, Double)].collect()
    // brute-force reconstruction distances on the driver
    val cellOf = Ann.assignCells(corpus, centroids)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val vecs = corpus.as[(Long, Seq[Float])].collect().toMap
    def reconstruct(id: Long): Array[Double] = {
      val c = cellOf(id)
      val v = vecs(id)
      val res = Array.tabulate(dim)(i => (v(i) - centroids(c)(i)).toDouble)
      val bk = books(c)
      val out = new Array[Double](dim)
      (0 until 4).foreach { s =>
        val cands = bk(s)
        val best = cands.indices.minBy { cd =>
          (0 until 4).map(j => math.pow(res(4 * s + j) - cands(cd)(j), 2)).sum
        }
        (0 until 4).foreach(j => out(4 * s + j) = centroids(c)(4 * s + j) + cands(best)(j))
      }
      out
    }
    got.foreach { case (qid, vid, adc) =>
      val q = vecs(qid)
      val rec = reconstruct(vid)
      val d2 = (0 until dim).map(i => math.pow(q(i) - rec(i), 2)).sum
      assert(math.abs(adc - math.floor(d2 * 1e6) / 1e6) < 1e-6,
        s"q=$qid v=$vid adc=$adc recon=$d2")
    }
  }

  test("per-cell books beat one global residual codebook on quantization error") {
    val local = Ann.trainLocalPqCodebooks(corpus, centroids, m = 4, dsub = 4, kStar = 8)
    val global = Ann.trainPqCodebooksResidual(corpus, centroids, m = 4, dsub = 4, kStar = 8)
    val cellOf = Ann.assignCells(corpus, centroids)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val vecs = corpus.as[(Long, Seq[Float])].collect().toMap
    def err(books: Int => Seq[Seq[Seq[Double]]]): Double =
      vecs.map { case (id, v) =>
        val c = cellOf(id)
        val res = Array.tabulate(dim)(i => (v(i) - centroids(c)(i)).toDouble)
        val bk = books(c)
        (0 until 4).map { s =>
          bk(s).map(cd =>
            (0 until 4).map(j => math.pow(res(4 * s + j) - cd(j), 2)).sum).min
        }.sum
      }.sum / vecs.size
    val eLocal = err(local)
    val eGlobal = err(_ => global)
    info(f"mean quantization error: local=$eLocal%.4f global=$eGlobal%.4f")
    assert(eLocal < eGlobal,
      f"local $eLocal%.4f not below global $eGlobal%.4f on a structured corpus")
  }
}
