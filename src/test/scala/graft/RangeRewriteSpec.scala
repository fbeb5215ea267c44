package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

/** The range theta-join → bucketed equi-join optimizer rule: fires on
  * the naive `lo <= p AND p < hi` spelling, preserves exact semantics
  * (including negative domains and inverted/empty ranges), leaves
  * already-equi joins alone.
  */
class RangeRewriteSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try f finally spark.experimental.extraOptimizations = prev
  }

  // negative values exercise the floor-division bucketing; (60,55) is an
  // inverted (empty) range; overlapping ranges multi-match points
  private val points = (-25L to 25L).map(p => (p, p)).toDF("pid", "p")
  private val ranges = Seq(
    (0L, -30L, -10L), (1L, -15L, 5L), (2L, 0L, 7L),
    (3L, 3L, 30L), (4L, 60L, 55L), (5L, 25L, 26L))
    .toDF("rid", "lo", "hi")

  private def naive = points.join(ranges, $"p" >= $"lo" && $"p" < $"hi")
    .select("pid", "rid")

  private lazy val expected = (for {
    p <- -25L to 25L
    (rid, lo, hi) <- Seq((0L, -30L, -10L), (1L, -15L, 5L), (2L, 0L, 7L),
      (3L, 3L, 30L), (4L, 60L, 55L), (5L, 25L, 26L))
    if p >= lo && p < hi
  } yield (p, rid)).toSet

  test("rule result equals the theta join, negatives and empty ranges included") {
    withRule {
      spark.conf.set(RangeJoinRewrite.WidthKey, "7")
      try {
        val got = naive.as[(Long, Long)].collect().toSet
        assert(got == expected)
      } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
    }
  }

  test("rule removes the nested-loop join; plan becomes an equi-join") {
    withRule {
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule did not fire:\n${plan.take(800)}")
      assert(plan.contains("__graft_rbucket"), "bucket key expected in the plan")
    }
  }

  test("bucket width only affects the plan, never the result") {
    withRule {
      Seq("1", "3", "1000").foreach { w =>
        spark.conf.set(RangeJoinRewrite.WidthKey, w)
        try {
          assert(naive.as[(Long, Long)].collect().toSet == expected, s"width $w broke results")
        } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
      }
    }
  }

  test("joins that already have an equality conjunct are left alone") {
    withRule {
      val left = Seq((1L, 5L), (2L, 15L)).toDF("k", "p")
      val right = Seq((1L, 0L, 10L), (2L, 10L, 20L)).toDF("k2", "lo", "hi")
      val joined = left.join(right, $"k" === $"k2" && $"p" >= $"lo" && $"p" < $"hi")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_rbucket"), "rule must not touch equi joins")
      assert(joined.count() == 2)
    }
  }

  test("timestamp domains bucket via epoch seconds") {
    withRule {
      val pts = Seq(("2024-01-01 05:00:00", 1L), ("2024-01-03 00:00:00", 2L))
        .toDF("t", "pid").select($"pid", $"t".cast("timestamp").as("ts"))
      val rng = Seq((0L, "2024-01-01 00:00:00", "2024-01-02 00:00:00"))
        .toDF("rid", "a", "b")
        .select($"rid", $"a".cast("timestamp").as("w_start"), $"b".cast("timestamp").as("w_end"))
      val joined = pts.join(rng, $"ts" >= $"w_start" && $"ts" < $"w_end")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_rbucket"), s"rule should fire on timestamps:\n${plan.take(600)}")
      assert(joined.select("pid").as[Long].collect().toSeq == Seq(1L))
    }
  }
}
