package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** SemDeDup semantics on a fixture with two well-separated clusters:
  * planted near-twins drop, cluster cores survive, and the Lloyd-refined
  * centroid path agrees with the oracle-checked seeded path.
  */
class SemanticDedupSpec extends AnyFunSuite with SparkTestSession {

  // Two clusters on orthogonal axes. The two SMALLEST ids sit in
  // different clusters so the seeded path (centroids = first-nCells
  // embeddings) starts with one centroid per cluster.
  //   cluster A: 0 (axis), 2 (near-twin of 0), 4 (same cell, cos 0.9)
  //   cluster B: 1 (axis), 3 (near-twin of 1), 5 (same cell, cos 0.9)
  private def fixture = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (2L, Array(0.999f, 0.04f, 0.0f, 0.0f)),
    (3L, Array(0.04f, 0.999f, 0.0f, 0.0f)),
    (4L, Array(0.9f, 0.43f, 0.0f, 0.0f)),
    (5L, Array(0.43f, 0.9f, 0.0f, 0.0f)))

  private def run(lloydIter: Int): Map[Long, (Int, Boolean)] = {
    import spark.implicits._
    val df = fixture.toDF("vec_id", "embedding")
    Dedup.semanticDedup(df, nCells = 2, threshold = 0.95, lloydIter = lloydIter)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cell"), r.getAs[Boolean]("kept")))
      .toMap
  }

  test("seeded path: twins drop, cores survive, cells follow clusters") {
    val out = run(lloydIter = 0)
    assert(out.size === 6)
    assert(out.filter(_._2._2).keySet === Set(0L, 1L, 4L, 5L))
    // cluster A ids share a cell, cluster B ids share the other
    assert(Set(out(0L)._1, out(2L)._1, out(4L)._1).size === 1)
    assert(Set(out(1L)._1, out(3L)._1, out(5L)._1).size === 1)
    assert(out(0L)._1 !== out(1L)._1)
  }

  test("lloyd-refined path drops the same planted twins") {
    val out = run(lloydIter = 2)
    assert(out.filter(!_._2._2).keySet === Set(2L, 3L))
  }

  test("greedy smaller-id rule, not closure: a dup of a dropped doc still drops") {
    import spark.implicits._
    // 1 is a twin of 0 (dropped); 2 is a twin of 1 but NOT of 0
    // (cos(0,2) ≈ 0.9919 < 0.995). Greedy drops 2 anyway — its witness
    // (1) has a smaller id regardless of 1's own fate.
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.998f, 0.0637f, 0.0f, 0.0f)),
      (2L, Array(0.9919f, 0.127f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, nCells = 1, threshold = 0.995)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(0L -> true, 1L -> false, 2L -> false))
  }

  test("null embeddings are excluded from cells and output") {
    import spark.implicits._
    val df = Seq(
      (0L, Some(Array(1.0f, 0.0f, 0.0f, 0.0f))),
      (1L, Option.empty[Array[Float]]),
      (2L, Some(Array(0.0f, 1.0f, 0.0f, 0.0f))))
      .toDF("vec_id", "embedding")
    val ids = Dedup.semanticDedup(df, nCells = 2, threshold = 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(0L, 2L))
  }
}
