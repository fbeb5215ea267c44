package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Per-iteration re-materialization for the engine's iterative loops
  * (PageRank, star-clustering rounds, the BPE/Unigram trainers).
  *
  * Two modes, selected by session config:
  *
  *  - DEFAULT (`spark.graft.loop.checkpointDir` unset):
  *    `localCheckpoint` — blocks live on executor block managers, no
  *    HDFS round-trip. The right call on local[N] and on clusters with
  *    stable executors.
  *  - RELIABLE (`spark.graft.loop.checkpointDir` set to a fault-tolerant
  *    path): `df.checkpoint()` under that directory. `localCheckpoint`
  *    stores blocks only on executors and TRUNCATES lineage, so on a
  *    real cluster an executor loss (or dynamic-allocation decommission)
  *    mid-loop loses blocks that can no longer be recomputed and the
  *    job dies. A 1000-executor 100 TB run sets the conf once and every
  *    loop in the engine becomes executor-loss-safe, at the cost of one
  *    distributed-FS write per iteration.
  *
  * Both modes produce IDENTICAL results (CheckpointModeSpec pins this):
  * the choice only moves where the cut lineage's blocks live.
  */
object LoopCheckpoint {

  val ConfKey = "spark.graft.loop.checkpointDir"

  def reliableDir(df: DataFrame): Option[String] =
    df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty)

  /** Cut the plan's lineage: reliable `checkpoint` when the conf names a
    * directory, `localCheckpoint` otherwise. `eager=false` defers
    * materialization to the first action, exactly like the underlying
    * Dataset methods.
    */
  def apply(df: DataFrame, eager: Boolean = true): DataFrame =
    reliableDir(df) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir mints a fresh UUID subdirectory per call —
        // set once per context (first reliable checkpoint wins; change
        // the conf before any loop runs, not mid-session).
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }

  /** Shared-subtree materialization for TRANSIENT frames — per-query or
    * per-batch intermediates whose lifetime is one action (the r18/r19
    * checkpoint-once frames: tf streams, shingle streams, label tables,
    * bloom-gate slivers, narrow proxies). ALWAYS `localCheckpoint`, even
    * when `spark.graft.loop.checkpointDir` selects reliable mode for the
    * LOOP frames: a reliable checkpoint here would write files per query
    * (per micro-batch in the bloom gate) that nothing ever deletes —
    * only [[IterScope]] reclaims files, and Spark's own checkpoint
    * cleaner is opt-in and GC-driven. The executor-loss trade is
    * explicit: losing a local block mid-query fails that one action
    * (the caller re-runs it), instead of leaking an unbounded
    * checkpoint directory across a long ingestion.
    */
  def transient(df: DataFrame, eager: Boolean = true): DataFrame =
    df.localCheckpoint(eager)

  /** Partition count for an iterative loop, derived from the LOOP
    * FRAME's row count (guide §2: derive partitioning from input, never
    * a constant tuned for one deployment): ~`spark.graft.loop
    * .rowsPerPartition` (default 64k) rows per partition, floored at 1
    * and capped by the session's `spark.sql.shuffle.partitions` (the
    * cluster operator's scale knob). A 200-doc dedup graph runs its
    * whole fixed point in single-task stages instead of 32 empty tasks
    * per exchange; a 10⁹-row loop still fans out to the configured
    * width.
    */
  def loopPartitions(
      spark: org.apache.spark.sql.SparkSession, n: Long): Int = {
    val rowsPer = spark.conf.getOption("spark.graft.loop.rowsPerPartition")
      .map(_.toLong).filter(_ > 0).getOrElse(65536L)
    val cap = spark.conf.get("spark.sql.shuffle.partitions").toInt
    math.max(1L, math.min(cap.toLong, (n + rowsPer - 1) / rowsPer)).toInt
  }

  /** Runs `body` (an iterative loop's plan construction AND its
    * materializing actions) under STATIC planning — AQE off and
    * `spark.sql.shuffle.partitions` pinned to the loop width `p`, both
    * restored after. Inside a loop every frame is already a LogicalRDD
    * with KNOWN hash partitioning (invariants pre-partitioned on the
    * loop key; [[LoopCheckpoint]] preserves physical partitioning
    * through the checkpoint), so the per-iteration equi-joins are
    * exchange-free BY CONSTRUCTION and each round's one real shuffle
    * lands back on the same partitioning — the fixed-partitioner loop
    * discipline of the GraphX lineage. AQE would instead re-plan every
    * exchange as its own blocking stage job (measured r19: the dominant
    * per-iteration cost on small frames) and its partition coalescing
    * breaks the co-partitioning reuse at ANY scale. Opt out with
    * `spark.graft.loop.aqe=true` (results are identical either way —
    * the loops' cross-row arithmetic is order-free integers or
    * tolerance-gated floats).
    */
  def staticLoop[T](
      spark: org.apache.spark.sql.SparkSession, p: Int)(body: => T): T = {
    if (spark.conf.getOption("spark.graft.loop.aqe").contains("true")) body
    else {
      val aqeKey = "spark.sql.adaptive.enabled"
      val partKey = "spark.sql.shuffle.partitions"
      val aqeWas = spark.conf.get(aqeKey)
      val partWas = spark.conf.get(partKey)
      spark.conf.set(aqeKey, "false")
      spark.conf.set(partKey, p.toString)
      try body finally {
        spark.conf.set(aqeKey, aqeWas)
        spark.conf.set(partKey, partWas)
      }
    }
  }

  /** Loop-carried iterate with RETENTION: in reliable mode, each call
    * deletes the previous iterate's checkpoint files once the new one
    * has materialized, so a 300-iteration trainer holds at most two
    * iterations on the distributed FS instead of all 300 (Spark's own
    * checkpoint cleaner is opt-in — `spark.cleaner.referenceTracking
    * .cleanCheckpoints` — and GC-driven even then).
    *
    * Contract: use ONE scope per loop-carried variable, and only for
    * frames the loop fully supersedes — a superseded iterate's files
    * are gone, so callers must not hold references to earlier iterates
    * (loop-invariant frames keep using plain [[LoopCheckpoint.apply]]).
    * The FINAL iterate's files are intentionally retained: the returned
    * frame reads them downstream. Lazy (`eager = false`) iterates defer
    * deletion until a later eager call, since an unmaterialized
    * checkpoint still recomputes through its predecessor's files.
    * In default (localCheckpoint) mode this is exactly
    * [[LoopCheckpoint.apply]] — executor block managers already evict
    * superseded blocks via the reference-tracking cleaner.
    */
  final class IterScope {
    private var session: org.apache.spark.sql.SparkSession = null
    private var pending: List[RDD[_]] = Nil

    def apply(df: DataFrame, eager: Boolean = true): DataFrame = {
      val out = LoopCheckpoint(df, eager)
      if (reliableDir(df).isDefined) {
        session = df.sparkSession
        pending =
          out.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }
            .toList ::: pending
        if (eager) materialized()
      }
      out
    }

    /** Signal that all but the newest `keep` iterates are superseded AND
      * no longer recompute-reachable (eager applies call this
      * automatically with keep = 1; lazy loops call it after their
      * materializing action) — everything older is deleted. Use
      * keep = 2 for chains where iterate k's checkpoint only writes when
      * iterate k+1 first computes (e.g. the BPE overlay chain), so the
      * newest entry may still recompute through its predecessor.
      *
      * Mixed lazy/eager safety: an unmaterialized lazy iterate still
      * recomputes through the first MATERIALIZED entry older than it,
      * so the kept prefix EXTENDS past `keep` to cover that entry for
      * every still-unmaterialized member (a bare splitAt would delete
      * the recompute path and strand the lazy iterate). Deletion is
      * deferred, not refused: the next materialized() after the lazy
      * entries write their files reclaims the backlog. */
    def materialized(keep: Int = 1): Unit = {
      var cut = math.min(keep, pending.length)
      for (j <- pending.indices if !isMaterialized(pending(j))) {
        // An entry that hasn't written its files yet must stay TRACKED:
        // dropping it now would be a silent no-op delete
        // (getCheckpointFile is still None), and when a later action
        // materializes it the files would leak untracked forever.
        cut = math.max(cut, j + 1)
        // It also still recomputes through the first MATERIALIZED entry
        // older than it (unmaterialized ones in between have no files
        // and contribute nothing) — retain up to and including that
        // entry, wherever it sits relative to `keep`.
        (j + 1 until pending.length).find(i => isMaterialized(pending(i)))
          .foreach(i => cut = math.max(cut, i + 1))
      }
      val (kept, olds) = pending.splitAt(cut)
      olds.foreach(deleteCheckpointFiles)
      pending = kept
    }

    /** True once the RDD's checkpoint files exist on the FS — a lazy
      * `checkpoint(eager = false)` flips this at its first action. */
    private def isMaterialized(rdd: RDD[_]): Boolean = rdd.isCheckpointed

    /** Delete EVERY tracked checkpoint, including the latest — for a
      * loop-carried frame that has been folded into another frame (e.g.
      * the BPE overlay after a compaction) and is dead entirely. */
    def released(): Unit = { pending.foreach(deleteCheckpointFiles); pending = Nil }

    private def deleteCheckpointFiles(rdd: RDD[_]): Unit =
      rdd.getCheckpointFile.foreach { file =>
        try {
          val p = new org.apache.hadoop.fs.Path(file)
          p.getFileSystem(session.sessionState.newHadoopConf()).delete(p, true)
        } catch {
          // Best-effort cleanup: a closed filesystem / bad URI surfaces
          // as a RuntimeException, not only IOException — neither may
          // abort a long training loop over a deletion.
          case scala.util.control.NonFatal(_) => ()
        }
      }
  }
}
