package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming analogs of the reference's stream-shaped behaviors
  * (SURVEY.md §2.9). The reference implements these as in-process
  * wall-clock checks; the streaming versions are event-time with
  * watermarks, so they tolerate late/out-of-order data and scale out.
  *
  * Each transform takes any DataFrame (batch or streaming) with the events
  * schema (`ts timestamp, user_id long, event_type string`), so the same
  * code path is unit-testable in batch and runs under `readStream` in
  * production.
  */
object Streams {

  /** Rate limiting (main.py:58-63: 30 req/min sliding window): per-user
    * request counts over a sliding event-time window; rows exceeding
    * `maxPerWindow` are the throttle candidates.
    */
  def rateLimitViolations(
      events: DataFrame,
      maxPerWindow: Int = 30,
      windowDur: String = "1 minute",
      slideDur: String = "10 seconds",
      watermark: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("user_id"))
      .agg(count(lit(1)).as("n_requests"))
      .filter(col("n_requests") > maxPerWindow)
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("user_id"), col("n_requests"))

  /** Live metrics counters (main.py:92-113): running per-dimension
    * request/error counts — a streaming stateful aggregate in update mode.
    * The dimension column and the error predicate are separate inputs:
    * grouping by the same column the error predicate tests would make
    * n_errors degenerate (all-or-nothing per group).
    */
  def runningCounters(
      events: DataFrame,
      dimCol: String,
      isError: org.apache.spark.sql.Column,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col(dimCol))
      .agg(count(lit(1)).as("n_requests"),
        count(when(isError, 1)).as("n_errors"))

  /** Session expiry via gap-based session windows (db_utils.py:304-348,
    * 24 h timeout): one row per (user, session burst) with bounds + count.
    */
  def sessionWindows(
      events: DataFrame,
      gap: String = "24 hours",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n_events"))

  /** Streaming exact dedup: drop re-delivered events by id within the
    * watermark horizon (the streaming form of T-6 — at-least-once sources
    * become effectively-once downstream). State holds one key per event id
    * and is evicted past the watermark, so memory is bounded by the
    * horizon, not the stream.
    */
  def dedupEvents(events: DataFrame, idCol: String = "event_id",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Streaming document ingest — the §3.2 upload path as a stream:
    * incoming (ts, doc_id, text, source) micro-batches are content-hashed,
    * deduped on the hash within the watermark horizon (the streaming
    * dedup gate: state holds one key per content hash, evicted past the
    * watermark), then split with the strided chunker and enriched. The
    * chunking stages are stateless column expressions, so they run
    * identically in batch and streaming — only the dedup gate carries
    * state, and it is bounded by the horizon.
    */
  def ingestStream(
      docs: DataFrame,
      chunkSize: Int = 100,
      overlap: Int = 20,
      watermark: String = "10 minutes"): DataFrame = {
    val fresh = docs
      .withColumn("file_hash", graft.operators.Ingest.contentHash(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("file_hash")
    graft.operators.Ingest.chunkStrided(fresh, chunkSize, overlap)
  }

  /** Stream–stream interval join: each incoming query row enriched with
    * the same user's events from the preceding `lookback` window — the
    * streaming form of the as-of/context-enrichment joins the batch side
    * covers ([[graft.operators.Joins]]). Both sides are watermarked, and
    * the event-time range condition bounds join state: events older than
    * `lookback` past the watermark are evicted, so state is
    * O(rate × lookback) per side, not unbounded.
    *
    * @param queries (q_ts timestamp, user_id long, question string)
    * @param events  (ts timestamp, e_user_id long, event_type string)
    */
  def enrichWithRecentEvents(
      queries: DataFrame,
      events: DataFrame,
      lookback: String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame =
    queries.withWatermark("q_ts", watermark)
      .join(
        events.withWatermark("ts", watermark),
        expr(s"user_id = e_user_id AND ts BETWEEN q_ts - INTERVAL $lookback AND q_ts"))
      .select(col("q_ts"), col("user_id"), col("question"),
        col("ts").as("event_ts"), col("event_type"))

  /** Streaming NEAR-dup gate: drop documents whose 31-bit portable
    * SimHash fingerprint was already seen within the watermark horizon —
    * the streaming companion of [[ingestStream]]'s exact-hash gate.
    * Fingerprint collision (Hamming distance 0) is the zero-state-growth
    * approximation of near-dup: it catches boilerplate re-uploads and
    * reworded-whitespace twins that the exact SHA gate misses, while
    * state stays one key per distinct fingerprint, evicted past the
    * watermark. Banded multi-key matching (any shared SimHash band, the
    * batch [[graft.operators.Dedup.simHashPairsBanded]] semantics) would
    * need one state row per band and a post-aggregation across band
    * verdicts — a documented extension, not attempted here because
    * chained stateful aggregations constrain output modes.
    */
  def nearDupGate(
      docs: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("simhash",
        graft.functions.TextAnalysis.simHashModUdf(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("simhash")

  /** Streaming admission gate against a STANDING corpus — the
    * stream-static form of [[graft.operators.Dedup.incrementalAdmit]]:
    * each micro-batch's documents look up their LSH band keys in the
    * corpus's (band, blocker) index ([[graft.operators.Dedup
    * .admissionIndex]]) and docs colliding on any band are flagged
    * blocked. The index is pre-aggregated to one row per band key, so
    * the gate is four per-band equi left joins — stateless, append-mode,
    * no explode, no watermark needed (the static side carries no event
    * time). Criterion is band collision without the signature-agreement
    * recheck: the conservative LSH-candidate rule, which can over-block
    * but never under-block relative to the batch operator; within-batch
    * sibling blocking is the batch op's job at compaction time.
    *
    * @param docs  streaming (doc_id long, text string, ...) frame
    * @param index static (band, blocker) frame from `Dedup.admissionIndex`
    * @param shingleWords,numHashes,bands signature parameters — these MUST
    *              match the ones the index was built with (defaults mirror
    *              `Dedup.admissionIndex`'s). A mismatch produces band keys
    *              that never collide, so the gate would silently admit
    *              everything — which is why the parameters are taken here
    *              rather than hardcoded.
    */
  def admissionGate(
      docs: DataFrame,
      index: DataFrame,
      shingleWords: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      broadcastIndex: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigUdf = udf { (text: String) =>
      graft.functions.TextAnalysis.minHashSignaturePortable(
        graft.functions.TextAnalysis.wordShingles(text, shingleWords), numHashes)
    }
    val withBands = (0 until bands).foldLeft(
      docs.withColumn("sig", sigUdf(col("text")))) { (df, b) =>
      df.withColumn(s"band_$b",
        concat_ws("_", (lit(b) +: (0 until rows).map(r =>
          element_at(col("sig"), b * rows + r + 1))): _*))
    }
    // broadcastIndex (default on): a checkpointed/derived static side
    // carries no size statistics, so without the hint EVERY per-band
    // stream-static join plans as a sort-merge that re-shuffles and
    // re-sorts the index once per band PER MICRO-BATCH — measured 13×
    // the per-row cost of the stateless stages (STREAMBENCH r10,
    // pretrain_gate 289 rows/s vs quality_gate 3,730). Broadcast turns
    // each into a map-side hash probe. Pass false only when the standing
    // index outgrows executor memory — then pre-bucket the index table
    // on `band` instead and accept the per-batch stream-side shuffle.
    def idx(b: Int): DataFrame = {
      val sel = index.select(col("band").as(s"band_$b"), col("blocker").as(s"blocker_$b"))
      if (broadcastIndex) broadcast(sel) else sel
    }
    val joined = (0 until bands).foldLeft(withBands) { (df, b) =>
      df.join(idx(b), Seq(s"band_$b"), "left")
    }
    joined
      .withColumn("blocked_by_raw",
        least((0 until bands).map(b => col(s"blocker_$b")): _*))
      .withColumn("admitted", col("blocked_by_raw").isNull)
      .withColumn("blocked_by", coalesce(col("blocked_by_raw"), lit(-1L)))
      .drop((0 until bands).flatMap(b => Seq(s"band_$b", s"blocker_$b")) :+ "sig" :+ "blocked_by_raw": _*)
  }

  /** Streaming VECTOR-similarity admission against a STANDING IVF-PQ
    * index — the ANN-layout counterpart of [[admissionGate]]'s LSH-band
    * gate, closing the loop between the persisted PQ code layouts
    * ([[graft.operators.Ann.writeIvfPqPartitioned]]) and the streaming
    * tier: each arriving vector probes its `nProbe` nearest IVF cells,
    * equi-joins the per-cell entry lists of
    * [[graft.operators.Ann.pqAdmissionIndex]], and is BLOCKED when its
    * best asymmetric-distance match falls at or under `maxDist` —
    * ADC distance below threshold means an indexed near-duplicate.
    *
    * Stateless by construction, like the other admission gates: the
    * probe is a per-row UDF over driver-held centroids (KBs), the cell
    * lookups are `nProbe` stream-static left equi-joins (one row per
    * cell on the static side), and the min-distance scan is per-row
    * column arithmetic ([[graft.operators.Ann.adcBestMatch]] — the
    * per-query lookup tables are let-bound, built once per row). No
    * watermark, no state store, append mode; the static index is
    * rebuilt per snapshot exactly like the LSH admission index. As with
    * [[admissionGate]], within-batch sibling blocking (two novel twins
    * arriving together) is the batch operator's job at compaction —
    * the gate checks the STANDING corpus only, so it never blocks a
    * vector the batch rule would keep.
    *
    * Emits the input columns plus `admitted`, `nearest_id` (blocking
    * vector, -1 when admitted) and `nearest_dist` (floored ADC distance
    * to the best indexed match, null when no probed cell had entries).
    *
    * @param vecs      streaming (vec_id long, embedding array<float>, ...)
    * @param index     static frame from [[graft.operators.Ann.pqAdmissionIndex]]
    * @param centroids IVF centroids the index layout was built with
    * @param codebooks PQ codebooks the index codes were encoded with —
    *                  as with [[admissionGate]], a mismatch would score
    *                  garbage distances, which is why both artifacts are
    *                  parameters tied to one index snapshot
    * @param maxDist   squared-euclidean ADC distance at or under which an
    *                  arriving vector counts as a duplicate
    */
  def pqAdmissionGate(
      vecs: DataFrame,
      index: DataFrame,
      centroids: Array[Array[Float]],
      codebooks: Seq[Seq[Seq[Double]]],
      maxDist: Double,
      nProbe: Int = 3,
      broadcastIndex: Boolean = true): DataFrame = {
    val probeUdf = udf { (v: Seq[Float]) =>
      graft.operators.Ann.nearestCells(v, centroids, nProbe)
    }
    val withProbes = (0 until nProbe).foldLeft(
      vecs.withColumn("probes", probeUdf(col("embedding")))) { (df, p) =>
      df.withColumn(s"cell_$p", element_at(col("probes"), p + 1))
    }
    // Same per-micro-batch sort-merge hazard (and fix) as
    // [[admissionGate]]'s broadcastIndex: the index is one row per IVF
    // cell (entry lists of m-byte codes — MBs at admission scale), so
    // the hinted broadcast makes each probe join a map-side hash lookup
    // instead of a per-batch re-shuffle of the static side.
    def idx(p: Int): DataFrame = {
      val sel = index.select(col("cell").as(s"cell_$p"), col("entries").as(s"entries_$p"))
      if (broadcastIndex) broadcast(sel) else sel
    }
    val joined = (0 until nProbe).foldLeft(withProbes) { (df, p) =>
      df.join(idx(p), Seq(s"cell_$p"), "left")
    }
    val bests = (0 until nProbe).map(p =>
      graft.operators.Ann.adcBestMatch(col(s"entries_$p"), col("embedding"), codebooks))
    joined
      // least() skips nulls: the best match over all probed cells, null
      // only when every probed cell was absent/empty in the index
      // (least needs two args — a single-probe gate is just its one best)
      .withColumn("best", if (bests.length == 1) bests.head else least(bests: _*))
      .withColumn("admitted", col("best").isNull || col("best.d") > maxDist)
      .withColumn("nearest_id", when(col("admitted"), lit(-1L)).otherwise(col("best.v")))
      .withColumn("nearest_dist", col("best.d"))
      .drop((0 until nProbe).flatMap(p => Seq(s"cell_$p", s"entries_$p")) ++
        Seq("probes", "best"): _*)
  }

  /** Streaming QUALITY admission: score each arriving document under a
    * TRAINED [[graft.operators.QualityModel]] weight vector and flag it
    * keep/drop against a threshold — the model-based-filter stage of
    * the ingest path run live, completing the streaming tier's gate
    * family (exact hash → SimHash near-dup → LSH/PQ similarity →
    * model-based quality). Entirely STATELESS: the weights ride the
    * closure and scoring is the row-local [[graft.operators.QualityModel
    * .qualityCol]] (bucket hashing in the `hash()` builtin, exact
    * integer count/margin arithmetic in the UDF), so it is legal in any
    * output mode, needs no watermark, and is bit-equal to the batch
    * [[graft.operators.QualityModel.score]] on every doc with ≥1 token
    * (spec-pinned). Docs are flagged, not dropped — retention stays a
    * policy step, as with [[graft.operators.Scale.sourceQualityGate]].
    */
  def qualityGate(
      docs: DataFrame,
      weights: Seq[Long],
      nBuckets: Int = 1024,
      minQuality: Double = 0.5): DataFrame =
    docs
      .withColumn("quality",
        graft.operators.QualityModel.qualityCol(col("text"), weights, nBuckets))
      .withColumn("keep", col("quality") >= minQuality)

  /** COMPOSED streaming pretrain admission — the streaming twin of the
    * batch `pretrain_corpus_pipeline`'s gate stages as ONE lineage:
    * model-based quality scoring ([[qualityGate]]) → LSH-band near-dup
    * admission against the standing corpus ([[admissionGate]]) → PQ
    * vector-similarity admission over the standing IVF-PQ index
    * ([[pqAdmissionGate]]). Every stage is STATELESS (weights/centroids/
    * codebooks ride the closure; corpus indexes are stream-static
    * joins), so the composition is itself stateless: append-mode legal,
    * no watermark, no state store — the scale property that lets one
    * admission query run indefinitely against 100 TB standing indexes.
    * The stage verdicts are kept as separate columns (`quality_keep`,
    * `lsh_admitted`, `pq_admitted`) with the final
    * `admitted = quality_keep ∧ lsh_admitted ∧ pq_admitted`, so
    * downstream routing can distinguish drop reasons; the batch
    * equivalence (same verdicts as running the three batch-side rules on
    * the same rows) is spec-pinned in StreamsSpec.
    *
    * [[nearDupGate]] (within-stream SimHash dedup) is deliberately NOT
    * in the chain: it is the one stateful gate, and its
    * `dropDuplicatesWithinWatermark` would impose a watermark + state
    * store on the whole pipeline for within-horizon stream self-dedup —
    * which compaction handles batch-side. Callers wanting it compose it
    * upstream of this gate.
    *
    * @param docs streaming (doc_id long, text string,
    *             embedding array<float>, ...) frame — text feeds the
    *             quality and LSH stages, embedding the PQ stage
    */
  def pretrainAdmissionGate(
      docs: DataFrame,
      weights: Seq[Long],
      lshIndex: DataFrame,
      pqIndex: DataFrame,
      centroids: Array[Array[Float]],
      codebooks: Seq[Seq[Seq[Double]]],
      maxDist: Double,
      nBuckets: Int = 1024,
      minQuality: Double = 0.5,
      nProbe: Int = 3,
      broadcastIndexes: Boolean = true): DataFrame = {
    val scored = qualityGate(docs, weights, nBuckets, minQuality)
      .withColumnRenamed("keep", "quality_keep")
    val lsh = admissionGate(scored, lshIndex, broadcastIndex = broadcastIndexes)
      .withColumnRenamed("admitted", "lsh_admitted")
      .withColumnRenamed("blocked_by", "lsh_blocked_by")
    pqAdmissionGate(lsh, pqIndex, centroids, codebooks, maxDist, nProbe,
      broadcastIndex = broadcastIndexes)
      .withColumnRenamed("admitted", "pq_admitted")
      .withColumn("admitted",
        col("quality_keep") && col("lsh_admitted") && col("pq_admitted"))
  }

  /** Streaming line-dedup gate: the stream-shaped half of
    * [[graft.operators.Dedup.incrementalLineDedup]]. Each arriving
    * document explodes into lines (stateless) and stream-static
    * left-joins the corpus line index, emitting
    * (doc_id, line_idx, line, keep) in append mode — no state, no
    * watermark, the static side reusable across micro-batches.
    * Deliberately NOT handled here: first-occurrence dedup WITHIN the
    * stream (that needs unbounded line state); as with [[admissionGate]],
    * intra-batch dedup is the batch operator's job at compaction time, so
    * the gate is conservative — it never strips a line the batch rule
    * would keep, and reassembly is a per-doc groupBy at compaction.
    */
  def lineDedupGate(
      docs: DataFrame, index: DataFrame, broadcastIndex: Boolean = true): DataFrame = {
    // same stream-static join discipline as [[admissionGate]]: the
    // distinct line set is hinted broadcast (default) so the per-batch
    // join is a hash probe, not a sort-merge re-shuffling the static
    // side; callers with corpus-scale line indexes pass false and
    // pre-bucket (the distinct itself re-runs per micro-batch either
    // way — pre-aggregate and persist the index frame to avoid that)
    val lines = index.select(col("line")).distinct().withColumn("in_corpus", lit(1))
    docs
      .select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("line_idx", "line")))
      .join(if (broadcastIndex) broadcast(lines) else lines, Seq("line"), "left")
      .withColumn("keep", col("in_corpus").isNull)
      .select("doc_id", "line_idx", "line", "keep")
  }

  /** Custom per-session state via flatMapGroupsWithState: running message count
    * and last-seen timestamp per user, with a real event-time timeout —
    * once the watermark passes lastSeen + gap, the session emits a final
    * `expired = true` update and its state is REMOVED (bounded state; the
    * reference's cleanup-expired-sessions scan, db_utils.py:304-348, as
    * incremental state eviction).
    */
  case class SessionEvent(ts: Timestamp, user_id: Long, event_type: String)
  case class SessionState(count: Long, lastSeen: Timestamp)
  case class SessionUpdate(user_id: Long, count: Long, lastSeen: Timestamp, expired: Boolean)

  /** One funnel advance: `user_id` reached step `step_idx` (1-based) at
    * `ts`, `latency_us` after their anchor event. */
  case class FunnelAdvance(
      user_id: Long, step_idx: Int, event_type: String,
      ts: Timestamp, latency_us: Long)
  case class FunnelProgress(times: List[Long])

  /** Streaming strict-order funnel via flatMapGroupsWithState — the
    * incremental twin of [[graft.operators.Sessions.funnel]]: per user,
    * the first `steps.head` event anchors; each later step advances only
    * at its first occurrence strictly after the previous step and within
    * `maxSpanSeconds` of the anchor, emitting one [[FunnelAdvance]] per
    * step reached (0..k records per micro-batch per user — the flatMap
    * shape mapGroupsWithState can't express).
    *
    * State is BOUNDED two ways: a completed funnel removes its state
    * immediately, and an incomplete one times out (event-time) once the
    * watermark passes anchor + span — past that point no event can
    * advance it. Within a micro-batch events are processed in event-time
    * order (ties are order-insensitive: a same-timestamp event can never
    * advance past its twin because the order test is strict), so replay
    * of an in-event-time-order stream emits EXACTLY the batch funnel's
    * frontier — the spec gate asserts count-and-latency equality per
    * step. Late events beyond the watermark are dropped, the standard
    * streaming-completeness trade the batch form doesn't face.
    */
  def funnelStream(
      events: Dataset[SessionEvent],
      steps: Seq[String],
      maxSpanSeconds: Long,
      watermark: String = "1 hour"): Dataset[FunnelAdvance] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    import events.sparkSession.implicits._
    val spanUs = maxSpanSeconds * 1000000L
    def micros(t: Timestamp): Long = (t.getTime / 1000) * 1000000L + t.getNanos / 1000
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelAdvance](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // Reap state the timeout hasn't collected yet: if the
            // watermark already passed anchor + span, no event this
            // batch can legally advance the funnel, and re-updating
            // would set a timeout BEHIND the watermark (Spark throws).
            // The group was invoked with data before its timeout fired
            // — drop the expired progress and let the batch's events
            // anchor a fresh funnel if they qualify.
            val wmMs = state.getCurrentWatermarkMs()
            var times = state.getOption.map(_.times).getOrElse(Nil)
            if (times.nonEmpty && times.head / 1000 + maxSpanSeconds * 1000 <= wmMs) {
              state.remove(); times = Nil
            }
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAdvance]
            rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
              val us = micros(e.ts)
              val k = times.length
              if (k < steps.size && e.event_type == steps(k) &&
                  (k == 0 || (us > times.last && us <= times.head + spanUs))) {
                times = times :+ us
                out += FunnelAdvance(uid, k + 1, steps(k), e.ts, us - times.head)
              }
            }
            if (times.length == steps.size) state.remove()
            else if (times.nonEmpty) {
              state.update(FunnelProgress(times))
              // Clamp to just past the watermark: a timeout at or
              // behind the current watermark is an IllegalArgumentException.
              state.setTimeoutTimestamp(
                math.max(times.head / 1000 + maxSpanSeconds * 1000, wmMs + 1))
            }
            out.iterator
          }
      }
  }

  def trackSessions(
      events: Dataset[SessionEvent],
      watermark: String = "1 hour",
      gapMs: Long = 24L * 3600 * 1000): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      // flatMapGroupsWithState, not mapGroupsWithState: the in-function
      // reap below must emit TWO rows in one batch — the superseded
      // session's terminal expired=true closure AND the fresh session's
      // first update. mapGroupsWithState's one-row-per-group contract
      // silently dropped the closure (r13 ADVICE), so a consumer that
      // finalizes sessions on expiry rows lost that session.
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val prev = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, prev.count, prev.lastSeen, expired = true))
          } else {
            // Reap a session the gap already ended but whose timeout
            // hasn't fired (the timeout only fires in a batch where the
            // group has NO data — a user returning right after the
            // watermark passed last+gap would otherwise merge into the
            // dead session). Gap semantics demand a FRESH session; the
            // dead one still gets its terminal expiry row, emitted
            // alongside the fresh session's update.
            val reaped = state.getOption.filter(p =>
              p.lastSeen.getTime + gapMs <= state.getCurrentWatermarkMs())
            val prev = if (reaped.isDefined) SessionState(0L, new Timestamp(0L))
              else state.getOption.getOrElse(SessionState(0L, new Timestamp(0L)))
            var count = prev.count
            var last = prev.lastSeen
            rows.foreach { e =>
              count += 1
              if (e.ts.after(last)) last = e.ts
            }
            state.update(SessionState(count, last))
            state.setTimeoutTimestamp(last.getTime + gapMs)
            reaped.map(p => SessionUpdate(userId, p.count, p.lastSeen, expired = true)).iterator ++
              Iterator.single(SessionUpdate(userId, count, last, expired = false))
          }
      }
  }
}
