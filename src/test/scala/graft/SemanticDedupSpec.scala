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

  test("mega-cell budget: over-budget cells route through banded candidates, no all-pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // One cell (nCells=1) holding 40 vectors — over a maxCellRows=8
    // budget — with planted IDENTICAL twins (41..44 duplicate 1..4).
    // Identical vectors share every signature band, so the banded leg's
    // recall on them is exactly 1 regardless of band geometry: the
    // approximate path must still drop all four.
    val base = (0 until 40).map { i =>
      val ang = i * 0.07
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat, 0.3f, 0.1f))
    }
    val twins = (1 to 4).map(i => ((40 + i).toLong, base(i)._2.clone()))
    val df = (base ++ twins).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, nCells = 1, threshold = 0.9999,
      maxCellRows = 8, megaNBits = 16, megaBands = 4)
    // plan: the mega leg must join on the scoped band key, never the bare
    // cell — an all-pairs |cell|^2 join would surface as a cell-only
    // equi-join over the full set (or worse, a nested loop).
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"mega-cell path fell back to all-pairs:\n${plan.take(800)}")
    assert(plan.contains("band"), s"banded candidate join missing:\n${plan.take(800)}")
    val kept = out.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert((41 to 44).forall(i => !kept(i.toLong)), s"planted twins survived: $kept")
    // exact leg disabled at this budget, so only the twins drop (0.9999
    // threshold keeps the 0.07-radian-spaced base set apart even under
    // the exact recheck)
    assert((0 until 40).forall(i => kept(i.toLong)), s"false drops: $kept")
  }

  test("mega-cell result agrees with the exact path on identical twins either side of the budget") {
    import spark.implicits._
    val df = fixture.toDF("vec_id", "embedding")
    // budget of 2 makes BOTH 3-vector cells mega; identical band
    // signatures for the planted near-twins (cos 0.999) still collide on
    // every band at 16/4 geometry, so the drops match the exact path.
    val exact = Dedup.semanticDedup(df, nCells = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val banded = Dedup.semanticDedup(df, nCells = 2, threshold = 0.95,
      maxCellRows = 2, megaNBits = 16, megaBands = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(banded === exact, s"banded leg diverged: exact=$exact banded=$banded")
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
