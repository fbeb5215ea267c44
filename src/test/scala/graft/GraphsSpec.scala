package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Graphs

/** PageRank: analytic fixed points, dangling-mass conservation, weighted
  * contribution split, and exact agreement with a dense driver-side power
  * iteration on a random graph.
  */
class GraphsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  /** Dense reference power iteration — same formula, same iteration
    * count, driver-side. */
  private def ref(
      edges: Seq[(Long, Long, Double)], d: Double, iters: Int): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outW.contains).map(pr).sum
      val inC = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => pr(s) * w / outW(s) }.sum).toMap
      pr = nodes.map(v =>
        v -> ((1 - d) / n + d * (inC.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    pr
  }

  private def run(edges: Seq[(Long, Long, Double)], iters: Int = 15): Map[Long, Double] =
    Graphs.pageRank(edges.toDF("src", "dst", "weight"), iters = iters)
      .as[(Long, Double)].collect().toMap

  test("two-node cycle is the uniform fixed point") {
    val out = run(Seq((1L, 2L, 1.0), (2L, 1L, 1.0)))
    assert(math.abs(out(1L) - 0.5) < 1e-12 && math.abs(out(2L) - 0.5) < 1e-12)
  }

  test("dangling mass is redistributed — ranks always sum to 1") {
    val out = run(Seq((1L, 2L, 1.0))) // node 2 dangles
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    assert(out(2L) > out(1L)) // sink accumulates rank
  }

  test("weights split a node's contribution proportionally") {
    // one iteration from uniform: node 2 gets 3/4 of node 1's push
    val edges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0))
    val out = run(edges, iters = 1)
    val expected = ref(edges, 0.85, 1)
    edges.flatMap(e => Seq(e._1, e._2)).distinct.foreach { v =>
      assert(math.abs(out(v) - expected(v)) < 1e-12, s"node $v")
    }
    assert(out(2L) > out(3L))
  }

  test("random 40-node graph matches the dense reference") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)(
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong, (rnd.nextInt(5) + 1).toDouble))
      .filter(e => e._1 != e._2).distinct
    val out = run(edges)
    val expected = ref(edges, 0.85, 15)
    assert(out.keySet == expected.keySet)
    expected.foreach { case (v, p) =>
      assert(math.abs(out(v) - p) < 1e-9, s"node $v: ${out(v)} vs $p")
    }
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
  }

  test("pageRankPicos: exact vs the integer reference, ~float fixed point") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)(
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong, (rnd.nextInt(5) + 1).toDouble))
      .filter(e => e._1 != e._2).distinct
    val got = Graphs.pageRankPicos(edges.toDF("src", "dst", "weight"))
      .as[(Long, Long)].collect().toMap
    // EXACT equality with the sequential integer twin — order-free Long
    // arithmetic on both sides makes this an equality, not a tolerance
    val refPicos = Graphs.pageRankPicosReference(
      edges.map { case (s, d, w) => (s, d, w.toLong) })
    assert(got == refPicos)
    // within the analytic quantization bound of the FLOAT fixed point
    // (share truncation ≤1e-6 amplified ≤ d/(1−d) ≈ 5.67 ⇒ < 1e-4)
    val fl = ref(edges, 0.85, 15)
    val maxDiff = got.map { case (v, p) => math.abs(p / 1e12 - fl(v)) }.max
    assert(maxDiff < 1e-4, s"maxDiff=$maxDiff")
    // truncation only loses mass, and boundedly so
    val mass = got.values.sum
    assert(mass <= 1000000000000L && mass > 999000000000L, s"mass=$mass")
  }
}
