package graft

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.util.{Failure, Success, Try}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Graphs, LoopCheckpoint}

/** Executor-loss simulation for the reliable-checkpoint mode — the
  * harness behind FaultToleranceSpec (r13 verdict #3: turn the SCALE.md
  * executor-loss claim from prose into a test).
  *
  * Runs `Graphs.pageRankPicos` on a `local-cluster[2,1,...]` master —
  * REAL executor JVM boundaries, unlike local[N] — and, once the
  * iteration loop is underway, HALTS one executor process from inside a
  * task (`Runtime.halt`, no shutdown hooks, the closest local stand-in
  * for a lost node). Two modes:
  *
  *  - `reliable`: `spark.graft.loop.checkpointDir` set. Each iterate's
  *    blocks live as checkpoint FILES on the shared filesystem, so the
  *    standalone master's replacement executor recomputes through them
  *    and the fixed point must complete EQUAL to the sequential integer
  *    reference. Exits 0 and prints `FAULTSIM_RESULT=ok` only if it
  *    does (and the kill provably happened).
  *  - `local`: default localCheckpoint mode under the SAME kill. Lost
  *    blocks have no lineage to recompute (localCheckpoint truncates
  *    it), so the run must FAIL — the negative leg proving the harness
  *    has teeth. Prints `FAULTSIM_RESULT=failed:<exception>`.
  *
  * Run directly: `runMain graft.FaultSim <reliable|local> <workDir>`.
  * Spawned by FaultToleranceSpec in a child JVM (one SparkContext per
  * JVM; the suite's shared local[2] session must survive).
  */
object FaultSim {

  def main(args: Array[String]): Unit = {
    val Array(mode, workDir) = args
    require(mode == "reliable" || mode == "local", s"bad mode $mode")
    new java.io.File(workDir).mkdirs()

    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1200]")
      .appName("graft-faultsim")
      .config("spark.sql.shuffle.partitions", "4")
      // keep the loop iterates at 4 partitions spread over BOTH
      // executors (coalescing to one partition would let the kill land
      // on an executor holding no blocks, defanging the negative leg)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // the separate executor JVMs need the engine's classes and the
      // JDK-17 module opens the driver itself runs with; classpath
      // entries must be ABSOLUTE (executors run in their own work dirs)
      .config("spark.executor.extraClassPath",
        sys.props("java.class.path").split(java.io.File.pathSeparator)
          .map(p => new java.io.File(p).getAbsolutePath)
          .mkString(java.io.File.pathSeparator))
      .config("spark.executor.extraJavaOptions",
        org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, mode, workDir)
    finally spark.stop()
  }

  private def run(spark: SparkSession, mode: String, workDir: String): Unit = {
    if (mode == "reliable")
      spark.conf.set(LoopCheckpoint.ConfKey, s"$workDir/ckpt")

    // Ring + chords, weights 1..7 — irregular enough that every
    // iteration moves mass. Small so the run is seconds, 12 iterations
    // so the kill lands with most of the loop still ahead.
    val nNodes = 120L
    val edgeSeq = (0L until nNodes).flatMap { i =>
      Seq((i, (i + 1) % nNodes, 1L + i % 7),
        (i, (i * 13 + 5) % nNodes, 1L + (i * 3) % 5))
    }.filter { case (s, d, _) => s != d }
    val expected = Graphs.pageRankPicosReference(edgeSeq, iters = 12)

    val jobsDone = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(jobEnd: SparkListenerJobEnd): Unit =
        jobsDone.incrementAndGet()
    })

    import spark.implicits._
    val edges = edgeSeq.toDF("src", "dst", "weight").repartition(4)

    import scala.concurrent.ExecutionContext.Implicits.global
    val ranked = Future {
      Graphs.pageRankPicos(edges, iters = 12)
        .as[(Long, Long)].collect().toMap
    }

    // Fire the kill once the loop is demonstrably mid-flight: past the
    // setup jobs (nodes/shares/marked/pr0 checkpoints) and several
    // iterations in, with most of the fixed point still ahead.
    val killFlag = new java.io.File(workDir, "killed")
    val t0 = System.nanoTime()
    while (jobsDone.get() < 10 && !ranked.isCompleted &&
        (System.nanoTime() - t0) < 120e9) Thread.sleep(50)
    // A kill fired AFTER the loop already finished proves nothing (and
    // in `local` mode would print a spurious ok with killed=true): when
    // the wait loop exited because the run completed, report a distinct
    // inconclusive result instead of killing a finished pipeline.
    if (ranked.isCompleted) {
      println(s"FAULTSIM_RESULT=inconclusive_run_finished_before_kill mode=$mode")
      return
    }
    val killDir = workDir
    Try {
      spark.sparkContext.parallelize(0 until 8, 8).foreach { _ =>
        val env = org.apache.spark.SparkEnv.get
        if (env.executorId == "0") {
          val f = new java.io.File(killDir, "killed")
          if (f.createNewFile()) {
            // halt, not exit: no shutdown hooks, no graceful block
            // handoff — the executor just disappears, like a lost node
            Runtime.getRuntime.halt(137)
          }
        }
      }
    } // the kill job itself may die with the executor; that's fine

    Try(Await.result(ranked, 180.seconds)) match {
      case Success(got) =>
        val equal = got == expected
        println(s"FAULTSIM_RESULT=${if (equal) "ok" else "wrong_answer"} " +
          s"mode=$mode killed=${killFlag.exists()} nodes=${got.size}")
      case Failure(e) =>
        println(s"FAULTSIM_RESULT=failed:${e.getClass.getSimpleName} " +
          s"mode=$mode killed=${killFlag.exists()}")
    }
  }
}
