package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark has no native operator for, rewritten into shapes it
  * executes well at 100 TB. Both avoid the BroadcastNestedLoopJoin /
  * CartesianProduct plans a naive theta-join formulation produces — the
  * difference between a per-key sort and an O(n·m) comparison loop.
  *
  * The reference has no as-of or range joins (SURVEY.md §2.4: its stores
  * are joined only implicitly by key); these are the time-correlation
  * operators its event-log analytics (backend/db_utils.py:304-348 session
  * expiry, backend/main.py:92-113 running metrics) imply once the log
  * grows past one machine.
  */
object Joins {

  /** As-of join: for each left row, the single most recent right row with
    * the same `key` and `right.ts <= left.ts` (DuckDB/`ASOF JOIN`, kdb
    * `aj` semantics, left-outer flavor).
    *
    * Implementation is a tagged union + one per-key ordered window — NOT a
    * range self-join: both sides shuffle once on `key`, sort once on
    * `(ts, side)`, and `last(payload, ignoreNulls)` carries the latest
    * right payload forward to each left row. Cost is identical to a
    * sort-merge join (one exchange + one sort per side, no row
    * multiplication), so it survives arbitrarily many right matches per
    * key where a `l.ts >= r.ts` theta join degenerates to a nested loop.
    * Right rows sort BEFORE left rows at equal `ts` (side 0 < 1), giving
    * the inclusive `<=` match DuckDB ASOF uses.
    *
    * `right` must be unique per (key, ts) — pre-aggregate duplicates to
    * keep "the" match deterministic (the caller chooses the reduction).
    * Left columns pass through; right columns (including the matched
    * right `ts`) arrive nested under `_match` (null when no prior right
    * row exists).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val payloadCols = right.columns.filter(_ != key)
    val rightTagged = right.select(
      col(key), col(ts),
      struct(payloadCols.toIndexedSeq.map(col): _*).as("_payload"),
      lit(0).as("_side"))
    val leftTagged = left.withColumn("_side", lit(1))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_payload")
  }

  /** Interval (range) join: points × ranges on `lo <= point < hi`, with
    * possibly overlapping ranges. Naively this is a theta join — Spark
    * plans it as BroadcastNestedLoopJoin (or a cartesian product when
    * neither side fits in memory): every point compared to every range.
    *
    * Rewrite: quantize the point domain into fixed-width buckets, explode
    * each range into the buckets it overlaps, and equi-join on the bucket
    * id before re-checking the exact predicate. The equi-join shuffles on
    * `_bucket` like any key join (sort-merge/shuffled-hash, AQE-sizable),
    * so the comparison count drops from |points|·|ranges| to
    * |points|·(ranges overlapping each point's bucket) — the same
    * bin-and-filter plan Databricks' range-join hints and PostGIS grid
    * indexes use. `bucketWidth` trades replication of wide ranges against
    * bucket selectivity; choose ≈ the median range width.
    */
  def rangeJoinBucketed(
      points: DataFrame,
      pointCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    val expanded = ranges.withColumn(
      "_bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        // hi is exclusive, but a range ending exactly on a bucket edge
        // still owns that edge's bucket start; ceil-1 would drop it.
        floor(col(hiCol) / bucketWidth).cast("long"))))
    points
      .withColumn("_bucket", floor(col(pointCol) / bucketWidth).cast("long"))
      .join(expanded, "_bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bucket")
  }

  /** Batch equivalent of the stream–stream interval join
    * ([[graft.streaming.Streams.enrichWithRecentEvents]]): each query row
    * joined to the SAME user's events in the preceding `lookbackSec`
    * window, bounds inclusive on both ends like the streaming BETWEEN.
    *
    * Same bin-and-filter rewrite as [[rangeJoinBucketed]], but the bucket
    * key composes with the user equi-key: both sides shuffle on
    * (user_id, time-bucket) — a plain equi-join AQE can size and skew-split
    * — and each query replicates into only lookback/bucketSec + 1 buckets.
    * A naive `ts BETWEEN q_ts - lookback AND q_ts` theta join plans as a
    * BroadcastNestedLoopJoin, which is exactly what dies at 100 TB.
    *
    * `queries` must carry (q_ts, user_id), `events` (ts, user_id); other
    * columns pass through.
    */
  def recentEventsJoin(
      queries: DataFrame,
      events: DataFrame,
      lookbackSec: Long,
      bucketSec: Long = 3600): DataFrame = {
    val qs = queries
      .withColumn("_qsec", col("q_ts").cast("long"))
      .withColumn("_bucket", explode(sequence(
        floor((col("_qsec") - lookbackSec).cast("double") / bucketSec).cast("long"),
        floor(col("_qsec").cast("double") / bucketSec).cast("long"))))
    val es = events
      .withColumn("_esec", col("ts").cast("long"))
      .withColumn("_bucket", floor(col("_esec").cast("double") / bucketSec).cast("long"))
    qs.join(es, Seq("_bucket", "user_id"))
      .filter(col("_esec") >= col("_qsec") - lookbackSec && col("_esec") <= col("_qsec"))
      .drop("_bucket", "_qsec", "_esec")
  }
}
