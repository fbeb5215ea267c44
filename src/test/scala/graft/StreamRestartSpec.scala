package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{RestartHarness, Streams}
import graft.streaming.Streams.{SessionEvent, SessionUpdate}

/** Streaming restart-from-checkpoint recovery — the streaming twin of
  * FaultToleranceSpec (r14 verdict #2: FaultToleranceSpec proves the
  * BATCH iterative loops survive executor loss; the stateful streaming
  * operators were spec'd for replay-equals-batch but never killed and
  * restarted from their `checkpointLocation` mid-stream).
  *
  * Two recovery shapes over a real FILE source + checkpoint dir
  * (MemoryStream state lives in the JVM, so only a file source can
  * prove offsets + state-store + watermark actually restore):
  *
  *  - CRASH mid-batch (funnelStream): the foreachBatch sink throws on
  *    its first sight of batch 3 — the batch is uncommitted, the query
  *    dies. A new query on the SAME checkpoint must replay batch 3 with
  *    byte-identical emissions (the idempotent-sink contract), resume
  *    at 3 (not 0), carry state across the boundary (a funnel anchored
  *    before the crash completes after it), and the union of emissions
  *    must equal an uninterrupted run AND the batch funnel aggregate.
  *
  *  - GRACEFUL stop/restart (trackSessions): stop after the first file
  *    segment, restart on the same checkpoint once more files exist.
  *    Session counts accumulate across the boundary, and a session
  *    whose gap expires only after the restart still emits its terminal
  *    expired=true row — both require the restored state store, not a
  *    fresh one.
  *
  * The reference's session store survives process restarts trivially
  * (SQLite, db_utils.py:14-26); these legs prove the streaming twin
  * does too, from repo evidence rather than framework trust.
  */
class StreamRestartSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // File fixture + funnel runner live in graft.streaming.RestartHarness
  // (main sources, the FaultSim precedent) — ONE implementation shared
  // with StreamBench's per-round restart epilogue so the recovery
  // evidence logic cannot drift between spec and bench.
  private def writeBatchFile(dir: Path, idx: Int, events: Seq[(Long, String, Timestamp)]): Unit =
    RestartHarness.writeBatchFile(dir, idx, events)

  private def eventStream(dir: Path): Dataset[SessionEvent] =
    RestartHarness.eventStream(spark, dir)

  // Six in-event-time-order batches; user shapes chosen so recovery has
  // to carry REAL state across the batch-3 boundary:
  //  u1 anchors (f0) and advances (f2) BEFORE the crash, completes AFTER
  //     it (f4) — its step-3 advance needs the restored funnel state;
  //  u2 sees an out-of-order purchase (no advance), then click f3 /
  //     purchase f5 complete across the boundary;
  //  u3 completes past the 7-day span (step 3 must NOT emit);
  //  u4 has no anchor; u5 anchors mid-stream and never completes;
  //  u6 anchors after the restart entirely.
  private val funnelBatches: Seq[Seq[(Long, String, Timestamp)]] = Seq(
    Seq((1L, "view", ts("2024-01-01 00:00:00")), (2L, "view", ts("2024-01-01 01:00:00")),
      (4L, "click", ts("2024-01-01 02:00:00"))),
    Seq((2L, "purchase", ts("2024-01-01 12:00:00")), (3L, "view", ts("2024-01-01 13:00:00")),
      (4L, "purchase", ts("2024-01-01 14:00:00"))),
    Seq((1L, "click", ts("2024-01-02 00:00:00")), (3L, "click", ts("2024-01-02 01:00:00"))),
    Seq((2L, "click", ts("2024-01-03 00:00:00")), (5L, "view", ts("2024-01-03 01:00:00"))),
    Seq((1L, "purchase", ts("2024-01-04 00:00:00")), (6L, "view", ts("2024-01-04 01:00:00"))),
    Seq((2L, "purchase", ts("2024-01-05 00:00:00")), (6L, "click", ts("2024-01-05 01:00:00")),
      (3L, "purchase", ts("2024-01-09 00:00:00"))))

  private val funnelSteps = Seq("view", "click", "purchase")

  test("funnelStream: crash mid-batch, restart from checkpoint — replay exact, state carried") {
    val dir = Files.createTempDirectory("graft_restart_in")
    val ckpt = Files.createTempDirectory("graft_restart_ckpt")
    funnelBatches.zipWithIndex.foreach { case (b, i) => writeBatchFile(dir, i, b) }

    // Leg 1: crashes at batch 3 (sink failure, batch uncommitted). The
    // death must be the INJECTED crash — any other failure is a real
    // break, not recovery evidence.
    val c = new RestartHarness.Collector(crashArmed = true)
    def run() = RestartHarness.runFunnel(spark, dir, ckpt, c, funnelSteps,
      maxSpanSeconds = 7L * 86400, crashAtBatch = 3L)
    val thrown = run()
    assert(thrown.exists(RestartHarness.isInjectedCrash),
      s"query must die on the injected sink failure, got: $thrown")
    val beforeRestart = c.collected.keySet().asScala.toSet
    assert(beforeRestart == Set(0L, 1L, 2L),
      s"batches committed before the crash must be exactly 0-2: $beforeRestart")

    // Leg 2: same checkpoint, sink healthy — must RESUME at 3, not 0.
    assert(run().isEmpty, "recovery run must finish cleanly")
    val keys = c.collected.keySet().asScala.toSet
    assert(Set(0L, 1L, 2L, 3L, 4L, 5L).subsetOf(keys),
      s"all six data batches must commit: $keys")
    // Resume-at-3 proof: the pre-crash batches ran through the sink
    // exactly once — the restart replayed NOTHING before the crash point.
    assert((0L to 2L).forall(b => c.commits.get(b) == 1),
      s"batches 0-2 must not reprocess on restart: ${c.commits}")
    // Replay determinism: the recovered batch 3 emits exactly what the
    // crashed attempt saw (same offsets, same restored state).
    assert(c.collected.get(3L).toSet == c.crashSeen.get(3L).toSet,
      s"batch-3 replay diverged: ${c.collected.get(3L)} vs ${c.crashSeen.get(3L)}")
    // State carried across the crash: u1 anchored (batch 0) and clicked
    // (batch 2) pre-crash, purchased in batch 4 — the step-3 advance
    // can only emit from the RESTORED state store.
    val all = c.allRows
    assert(all.exists(a => a.user_id == 1L && a.step_idx == 3),
      s"u1's post-restart completion missing — state not restored: $all")
    assert(!all.exists(a => a.user_id == 3L && a.step_idx == 3),
      "u3's past-span purchase must not advance")

    // Uninterrupted reference run (fresh checkpoint): identical emissions.
    val ref = new RestartHarness.Collector(crashArmed = false)
    assert(RestartHarness.runFunnel(spark, dir,
        Files.createTempDirectory("graft_restart_ckpt_ref"), ref, funnelSteps,
        maxSpanSeconds = 7L * 86400).isEmpty,
      "reference run must finish cleanly")
    val refAll = ref.allRows
    assert(all.toSet == refAll.toSet && all.size == refAll.size,
      s"crash+restart emissions diverged from the uninterrupted run:\n$all\nvs\n$refAll")

    // And both equal the batch funnel's aggregates.
    val batch = graft.operators.Sessions.funnel(
        funnelBatches.flatten.map { case (u, t, time) => (time, u, t) }
          .toDF("ts", "user_id", "event_type"),
        funnelSteps, maxSpanSeconds = 7L * 86400)
      .select("step_idx", "n_users", "sum_latency_us")
      .as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val streamed = (1 to 3).map { i =>
      val rows = all.filter(_.step_idx == i)
      i -> ((rows.size.toLong, rows.map(_.latency_us).sum))
    }.toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("trackSessions: graceful stop/restart from checkpoint — counts and expiry carry over") {
    val dir = Files.createTempDirectory("graft_restart_sess_in")
    val ckpt = Files.createTempDirectory("graft_restart_sess_ckpt")
    // Segment 1 (files 0-2): u1 accumulates 3 events; u2 accumulates 2.
    // Segment 2 (files 3-5): u1 keeps the SAME session (within gap) —
    // counts must continue from the restored 3, not restart at 1; u2
    // returns past the 1 h gap — the dead session's terminal
    // expired=true row (count=2) must emit from restored state.
    val seg1 = Seq(
      Seq((1L, "msg", ts("2024-01-01 00:00:00")), (2L, "msg", ts("2024-01-01 00:05:00"))),
      Seq((1L, "msg", ts("2024-01-01 00:10:00")), (2L, "msg", ts("2024-01-01 00:15:00"))),
      Seq((1L, "msg", ts("2024-01-01 00:20:00"))))
    val seg2 = Seq(
      Seq((1L, "msg", ts("2024-01-01 00:50:00"))), // within u1's 00:20 + 1h gap
      Seq((1L, "msg", ts("2024-01-01 01:40:00"))), // within u1's 00:50 + 1h gap
      Seq((2L, "msg", ts("2024-01-01 02:00:00")))) // past u2's 00:15 + 1h gap
    val collected = new ConcurrentHashMap[Long, Seq[SessionUpdate]]()
    def run(): Unit = {
      val query = Streams.trackSessions(eventStream(dir),
          watermark = "0 seconds", gapMs = 3600L * 1000)
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .outputMode(OutputMode.Update())
        .foreachBatch { (ds: Dataset[SessionUpdate], batchId: Long) =>
          collected.put(batchId, ds.collect().toSeq): Unit
        }
        .start()
      try query.processAllAvailable()
      finally query.stop()
    }
    seg1.zipWithIndex.foreach { case (b, i) => writeBatchFile(dir, i, b) }
    run()
    val seg1Keys = collected.keySet().asScala.toSet
    assert(Set(0L, 1L, 2L).subsetOf(seg1Keys), s"3 data batches expected: $seg1Keys")
    val seg1Rows = collected.values().asScala.flatten.toSeq
    assert(seg1Rows.filter(u => u.user_id == 1L && !u.expired).map(_.count).max == 3L,
      s"u1 must reach count 3 before the stop: $seg1Rows")
    seg2.zipWithIndex.foreach { case (b, i) => writeBatchFile(dir, i + seg1.size, b) }
    run()
    val afterKeys = collected.keySet().asScala.toSet
    assert((afterKeys -- seg1Keys).nonEmpty && (afterKeys -- seg1Keys).min > seg1Keys.max,
      s"restart must append batches after ${seg1Keys.max}, not restart at 0: $afterKeys")
    val all = collected.values().asScala.flatten.toSeq
    // u1's first post-restart update continues the restored count (4th
    // event of one session), and the final one reaches 5 in-session.
    val u1 = all.filter(u => u.user_id == 1L && !u.expired).map(_.count)
    assert(u1.max == 5L, s"u1 must accumulate 5 events across the restart: $all")
    // u2's gap expiry fires only after the restart — the terminal row
    // for the PRE-restart session (count=2) needs the restored state.
    val u2exp = all.filter(u => u.user_id == 2L && u.expired)
    assert(u2exp.map(_.count) == Seq(2L),
      s"u2's pre-restart session must expire exactly once with count=2: $all")
    // and u2's return opened a FRESH session at count=1
    assert(all.exists(u => u.user_id == 2L && !u.expired && u.count == 1L &&
        u.lastSeen == ts("2024-01-01 02:00:00")),
      s"u2's return must start a fresh session: $all")
  }

  test("dedupEvents: restart from checkpoint — admitted keys stay suppressed") {
    // r15 verdict #3: the watermark-state operators
    // (dropDuplicatesWithinWatermark) were replay-spec'd but never
    // restarted from a real checkpoint. The contract that needs the
    // RESTORED state store: a key admitted before the stop must stay
    // suppressed when it is re-delivered after the restart — a fresh
    // state store would re-admit it (at-least-once delivery would leak
    // duplicates through every restart boundary).
    val dir = Files.createTempDirectory("graft_restart_dedup_in")
    val ckpt = Files.createTempDirectory("graft_restart_dedup_ckpt")
    // The harness file source carries (ts, user_id, event_type);
    // user_id serves as the event id being deduped. Event times stay
    // inside the 1 h watermark horizon so no state is evicted by time —
    // suppression across the boundary is then attributable only to the
    // restored store.
    val collected = new ConcurrentHashMap[Long, Seq[(Long, Timestamp)]]()
    def run(): Unit = {
      val deduped = Streams.dedupEvents(
        eventStream(dir).toDF(), idCol = "user_id", watermark = "1 hour")
      val query = deduped
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .outputMode(OutputMode.Append())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          collected.put(batchId,
            df.select("user_id", "ts").collect()
              .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq): Unit
        }
        .start()
      try query.processAllAvailable()
      finally query.stop()
    }
    // Segment 1: ids 1,2 admitted in batch 0; batch 1 re-delivers id 1
    // (suppressed within the run) and admits id 3.
    val seg1 = Seq(
      Seq((1L, "msg", ts("2024-01-01 00:00:00")), (2L, "msg", ts("2024-01-01 00:05:00"))),
      Seq((1L, "msg", ts("2024-01-01 00:10:00")), (3L, "msg", ts("2024-01-01 00:15:00"))))
    seg1.zipWithIndex.foreach { case (b, i) => writeBatchFile(dir, i, b) }
    run()
    val seg1Keys = collected.keySet().asScala.toSet
    val seg1Rows = collected.values().asScala.flatten.toSeq
    assert(seg1Rows.map(_._1).sorted == Seq(1L, 2L, 3L),
      s"segment 1 must admit each id exactly once: $seg1Rows")
    // Segment 2 (after restart): id 2 re-delivered — must stay
    // SUPPRESSED via the restored state; id 4 is fresh — admitted.
    val seg2 = Seq(
      Seq((2L, "msg", ts("2024-01-01 00:20:00")), (4L, "msg", ts("2024-01-01 00:25:00"))))
    seg2.zipWithIndex.foreach { case (b, i) => writeBatchFile(dir, i + seg1.size, b) }
    run()
    val afterKeys = collected.keySet().asScala.toSet
    assert((afterKeys -- seg1Keys).nonEmpty && (afterKeys -- seg1Keys).min > seg1Keys.max,
      s"restart must append batches after ${seg1Keys.max}, not reprocess from 0: $afterKeys")
    val all = collected.values().asScala.flatten.toSeq
    assert(all.count(_._1 == 2L) == 1,
      s"id 2's post-restart re-delivery must stay suppressed by restored state: $all")
    assert(all.count(_._1 == 4L) == 1, s"fresh id 4 must be admitted: $all")
    assert(all.map(_._1).sorted == Seq(1L, 2L, 3L, 4L),
      s"exactly one admission per distinct id across the restart: $all")
    // the suppressed re-delivery must not even replace the admitted
    // row's payload — the surviving id-2 row is the ORIGINAL delivery
    assert(all.find(_._1 == 2L).map(_._2) == Some(ts("2024-01-01 00:05:00")),
      s"id 2's surviving row must be the pre-restart original: $all")
  }

  test("nearDupGate: restart from checkpoint — fingerprint state suppresses a post-restart twin") {
    // The text-keyed sibling of the dedupEvents leg: nearDupGate keys
    // its dropDuplicatesWithinWatermark state on the derived SimHash
    // FINGERPRINT, so the restart contract is about a twin DOCUMENT —
    // a different doc_id whose text collides (here: identical text) —
    // arriving after the restart and staying suppressed by restored
    // state.
    val dir = Files.createTempDirectory("graft_restart_ndg_in")
    val ckpt = Files.createTempDirectory("graft_restart_ndg_ckpt")
    val collected = new ConcurrentHashMap[Long, Seq[Long]]()
    def run(): Unit = {
      val gated = Streams.nearDupGate(
        RestartHarness.docStream(spark, dir), watermark = "1 hour")
      val query = gated
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .outputMode(OutputMode.Append())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          collected.put(batchId,
            df.select("doc_id").collect().map(_.getLong(0)).toSeq): Unit
        }
        .start()
      try query.processAllAvailable()
      finally query.stop()
    }
    // Segment 1: docs 1 (pattern A) and 2 (pattern B) admitted; doc 3
    // re-uploads pattern A under a new id — suppressed within the run.
    val textA = "the quick brown fox jumps over the lazy dog"
    val textB = "a completely different document about spark"
    RestartHarness.writeDocFile(dir, 0, Seq(
      (1L, textA, ts("2024-01-01 00:00:00")), (2L, textB, ts("2024-01-01 00:05:00"))))
    RestartHarness.writeDocFile(dir, 1, Seq(
      (3L, textA, ts("2024-01-01 00:10:00"))))
    run()
    val seg1Keys = collected.keySet().asScala.toSet
    assert(collected.values().asScala.flatten.toSeq.sorted == Seq(1L, 2L),
      s"segment 1 must admit one doc per fingerprint: ${collected.values()}")
    // Segment 2 (after restart): doc 4 re-uploads pattern B — its
    // fingerprint was admitted pre-stop, so the RESTORED state must
    // suppress it; doc 5 is a fresh pattern — admitted.
    RestartHarness.writeDocFile(dir, 2, Seq(
      (4L, textB, ts("2024-01-01 00:20:00")),
      (5L, "yet another novel text body entirely", ts("2024-01-01 00:25:00"))))
    run()
    val afterKeys = collected.keySet().asScala.toSet
    assert((afterKeys -- seg1Keys).nonEmpty && (afterKeys -- seg1Keys).min > seg1Keys.max,
      s"restart must append batches, not reprocess from 0: $afterKeys")
    val all = collected.values().asScala.flatten.toSeq
    assert(!all.contains(4L),
      s"doc 4's twin fingerprint must stay suppressed by restored state: $all")
    assert(all.count(_ == 5L) == 1, s"fresh doc 5 must be admitted: $all")
    assert(all.sorted == Seq(1L, 2L, 5L),
      s"exactly one admission per distinct fingerprint across the restart: $all")
  }
}
