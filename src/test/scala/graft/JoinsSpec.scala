package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // (key, ts-as-long rendered to timestamp, payload)
  private def tsCol(c: String) = timestamp_micros(col(c) * 1000000L)

  private def lefts = Seq(
    (1L, 10L), (1L, 20L), (1L, 5L), (2L, 15L), (3L, 7L)
  ).toDF("k", "t").select(col("k"), tsCol("t").as("ts"), col("t").as("lt"))

  private def rights = Seq(
    (1L, 10L, 100L), (1L, 12L, 101L), (1L, 3L, 102L), (2L, 99L, 103L)
  ).toDF("k", "t", "v").select(col("k"), tsCol("t").as("ts"), col("v"))

  test("asofJoin picks the latest right row at-or-before each left row") {
    val out = Joins.asofJoin(lefts, rights, "k", "ts")
      .select(col("k"), col("lt"), col("_match.v").as("v"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 10L, Some(100L)), // tie: right at the same ts matches (<=)
      (1L, 20L, Some(101L)), // latest of 3,10,12
      (1L, 5L, Some(102L)),  // only ts=3 precedes
      (2L, 15L, None),       // right exists but only in the future
      (3L, 7L, None)))       // no right rows for the key at all
  }

  test("asofJoin equals the brute-force greatest-match per left row") {
    val n = 400
    val rnd = new scala.util.Random(42)
    val l = (1 to n).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
      .select(col("k"), tsCol("t").as("ts"), col("lid"))
    val r = (1 to n).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong * 2, i.toLong))
      .distinct.toDF("k", "t", "rid")
      .groupBy("k", "t").agg(max("rid").as("rid"))
      .select(col("k"), tsCol("t").as("ts"), col("rid"))
    val got = Joins.asofJoin(l, r, "k", "ts")
      .select(col("lid"), coalesce(col("_match.rid"), lit(-1L)).as("rid"))
      .as[(Long, Long)].collect().toMap
    val want = l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") && col("l.ts") >= col("r.ts"), "left")
      .groupBy(col("lid"))
      .agg(coalesce(max(struct(col("r.ts"), col("r.rid"))).getField("rid"), lit(-1L)).as("rid"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("rangeJoinBucketed equals the naive theta join, incl. overlapping ranges") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 500).map(i => (i.toLong, 880.0 + rnd.nextDouble() * 120)).toDF("pid", "x")
    val ranges = Seq(
      (0L, 880.0, 910.0), (1L, 900.0, 950.0), (2L, 920.0, 940.0),
      (3L, 925.0, 975.0), (4L, 950.0, 1000.0), (5L, 990.0, 1000.0)
    ).toDF("band_id", "lo", "hi")
    for (width <- Seq(5.0, 25.0, 200.0)) {
      val got = Joins.rangeJoinBucketed(points, "x", ranges, "lo", "hi", width)
        .select("pid", "band_id").as[(Long, Long)].collect().sorted.toSeq
      val want = points.join(ranges, col("x") >= col("lo") && col("x") < col("hi"))
        .select("pid", "band_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"width=$width")
    }
  }

  test("rangeJoinBucketed plans as an equi-join, not a nested loop") {
    val points = (1 to 100).map(i => (i.toLong, i * 1.5)).toDF("pid", "x")
    val ranges = Seq((0L, 0.0, 50.0), (1L, 40.0, 150.0)).toDF("band_id", "lo", "hi")
    val plan = Joins.rangeJoinBucketed(points, "x", ranges, "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop plan:\n$plan")
    // and the naive formulation really does degenerate without the rewrite
    val naive = points.join(ranges, col("x") >= col("lo") && col("x") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin") || naive.contains("CartesianProduct"))
  }

  test("asofJoin plans one exchange per side and no join operator") {
    val plan = Joins.asofJoin(lefts, rights, "k", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in asof plan:\n$plan")
  }
}
