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
