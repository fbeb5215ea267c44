package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session / chat-log analytics over an event-log table
  * (reference: backend/db_utils.py — application_logs queries).
  *
  * The log table here is `events(event_id, ts, user_id, event_type, value,
  * props)`, with `user_id`+`ts` playing `session_id`+`created_at`
  * (FIXTURES.md). All cutoffs are passed as literal timestamps, not
  * `current_timestamp()`, to keep results deterministic/oracle-stable
  * (the reference's `datetime('now', ...)` becomes a parameter).
  *
  * Scale notes: the last-N window shuffles once on the session key — the
  * same partitioning every per-session operator reuses; at 100 TB the logs
  * table is date-partitioned on `ts` so retention/cutoff predicates become
  * partition pruning instead of a full scan.
  */
object Sessions {

  /** S-1: last `n` rows per session by time (desc), ties broken by id,
    * returned in chronological order — the chat-history window
    * (db_utils.py:92-137 `ORDER BY created_at DESC LIMIT n` + reverse).
    */
  def lastNPerSession(logs: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    logs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .drop("rn")
  }

  /** T-12: unnest one log row into two (role, content) message rows —
    * human (the query) then ai (the response) (db_utils.py:126-133).
    * Here: event_type plays the human content, props the ai content.
    */
  def toMessages(logs: DataFrame): DataFrame =
    logs.select(
      col("user_id"),
      col("event_id"),
      col("ts"),
      explode(array(
        struct(lit("human").as("role"), col("event_type").as("content")),
        struct(lit("ai").as("role"), col("props").as("content")))).as("m"))
      .select(col("user_id"), col("event_id"), col("ts"), col("m.role"), col("m.content"))

  /** A-4: per-session stats — count, first/last activity (db_utils.py:139-161). */
  def sessionStats(logs: DataFrame): DataFrame =
    logs.groupBy("user_id").agg(
      count(lit(1)).as("message_count"),
      min("ts").as("first_at"),
      max("ts").as("last_at"))

  /** A-5: distinct sessions whose latest activity predates `cutoff`
    * (expired sessions, db_utils.py:320-328).
    */
  def expiredSessions(logs: DataFrame, cutoff: String): DataFrame =
    logs.groupBy("user_id")
      .agg(max("ts").as("last_at"))
      .filter(col("last_at") < lit(cutoff).cast("timestamp"))
      .select("user_id")

  /** J-4: delete expired sessions' rows = keep via left_anti
    * (db_utils.py:330-339).
    */
  def purgeExpired(logs: DataFrame, cutoff: String): DataFrame =
    logs.join(expiredSessions(logs, cutoff), Seq("user_id"), "left_anti")

  /** O-13: retention — keep rows at/after the cutoff (db_utils.py:280-302). */
  def retain(logs: DataFrame, cutoff: String): DataFrame =
    logs.filter(col("ts") >= lit(cutoff).cast("timestamp"))

  /** A-2/A-3: total distinct sessions and distinct sessions active since
    * `activeCutoff` (db_utils.py:357-374), in one multi-aggregate pass.
    */
  def activityStats(logs: DataFrame, activeCutoff: String): DataFrame =
    logs.agg(
      count(lit(1)).as("total_messages"),
      countDistinct("user_id").as("total_sessions"),
      countDistinct(when(col("ts") > lit(activeCutoff).cast("timestamp"), col("user_id")))
        .as("active_sessions"))

  /** Strict-order funnel: per user, the first `steps.head` event anchors
    * the funnel; each later step counts only at its first occurrence
    * STRICTLY AFTER the previous step's time, and the whole chain must
    * land within `maxSpanSeconds` of the anchor. Emits one row per step
    * — (step_idx, event_type, n_users, sum_latency_us) — the classic
    * drop-off table, in exact integers (epoch-micros sums, no float
    * aggregation) so every engine hashes it identically.
    *
    * Plan shape: step 1 is one user-keyed aggregate; each later step is
    * an equi-join of the (compact, one-row-per-qualifying-user) frontier
    * frame against only that step's event type, re-aggregated on the
    * same user key — k−1 shuffles on `user_id` that all share one
    * partitioning, never a window over the full log and never a
    * cross-step self-join of events. At 100 TB with date-partitioned
    * logs the per-step type filter prunes before the shuffle.
    */
  def funnel(
      logs: DataFrame,
      steps: Seq[String],
      maxSpanSeconds: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val spanUs = maxSpanSeconds * 1000000L
    val us = logs.select(
      col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    // frontier: (user_id, t1, tPrev) per user still alive in the funnel
    val first = us.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val frontiers = steps.tail.scanLeft(first.withColumn("tp", col("t1"))) {
      case (prev, step) =>
        us.filter(col("event_type") === step)
          .join(prev, Seq("user_id"))
          .filter(col("us") > col("tp") && col("us") <= col("t1") + lit(spanUs))
          .groupBy("user_id", "t1").agg(min(col("us")).as("tp"))
    }
    frontiers.zip(steps).zipWithIndex.map { case ((f, step), i) =>
      f.agg(
        lit(i + 1).as("step_idx"),
        lit(step).as("event_type"),
        count(lit(1)).as("n_users"),
        coalesce(sum(col("tp") - col("t1")), lit(0L)).as("sum_latency_us"))
    }.reduce(_ unionByName _)
  }
}
