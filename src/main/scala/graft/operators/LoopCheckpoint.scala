package graft.operators

import org.apache.spark.sql.DataFrame

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
}
