package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessions

/** Strict-order funnel semantics on a hand-built log: out-of-order events
  * don't count, the completion window binds, and the anchor is the FIRST
  * occurrence of step one.
  */
class FunnelSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private def log(rows: (Long, String, Timestamp)*) =
    rows.zipWithIndex.map { case ((u, t, time), i) => (i.toLong, time, u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")

  private def run(df: org.apache.spark.sql.DataFrame): Map[Int, (Long, Long)] =
    Sessions.funnel(df, Seq("view", "click", "purchase"), maxSpanSeconds = 7L * 86400)
      .select("step_idx", "n_users", "sum_latency_us")
      .as[(Int, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("completes in order, counts latency from the first view") {
    val out = run(log(
      (1L, "view", ts(1)), (1L, "view", ts(3)), // second view is NOT the anchor
      (1L, "click", ts(2)), (1L, "purchase", ts(4))))
    assert(out(1) == ((1L, 0L)))
    assert(out(2) == ((1L, 86400L * 1000000))) // click one day after anchor
    assert(out(3) == ((1L, 3L * 86400 * 1000000)))
  }

  test("a purchase BEFORE the click does not complete the funnel") {
    val out = run(log(
      (2L, "view", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(3))))
    assert(out(2)._1 == 1L && out(3)._1 == 0L)
  }

  test("steps after the 7-day window do not count") {
    val out = run(log(
      (3L, "view", ts(1)), (3L, "click", ts(2)), (3L, "purchase", ts(10))))
    assert(out(2)._1 == 1L && out(3)._1 == 0L)
  }

  test("same-timestamp events are not strictly after and do not advance") {
    val out = run(log((4L, "view", ts(1)), (4L, "click", ts(1))))
    assert(out(1)._1 == 1L && out(2)._1 == 0L)
  }

  test("users without the anchor never enter the funnel") {
    val out = run(log((5L, "click", ts(1)), (5L, "purchase", ts(2))))
    assert(out(1)._1 == 0L && out(2)._1 == 0L && out(3)._1 == 0L)
  }
}
