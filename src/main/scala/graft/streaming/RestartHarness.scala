package graft.streaming

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime
import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.streaming.Streams.{FunnelAdvance, SessionEvent}

/** Shared restart-from-checkpoint harness — ONE implementation of the
  * file-source + crash-injecting-sink scenario, consumed by BOTH
  * StreamRestartSpec (the r14-verdict-#2 recovery spec) and
  * [[graft.StreamBench]]'s per-round restart epilogue, so the recovery
  * evidence logic cannot drift between the two (the [[graft.FaultSim]]
  * precedent: the harness lives in main, the spec drives it).
  *
  * Scenario shape: events arrive as one JSON-lines FILE per micro-batch
  * (mtimes ascending so the file source's batch order is deterministic
  * across runs; `maxFilesPerTrigger = 1`), the funnel runs against a
  * real `checkpointLocation`, and the foreachBatch sink records rows
  * idempotently BY BATCH ID — plus an optional one-shot injected crash
  * at a chosen batch, before that batch commits. A subsequent run on
  * the same checkpoint must then resume (not reprocess), replay the
  * uncommitted batch identically, and carry operator state across the
  * boundary — the callers assert those three from the collector.
  *
  * NOTE batch ids: each input file is one micro-batch, and the engine
  * appends NO-DATA batches after the data ones to advance the watermark
  * and fire event-time timeouts — callers bound the data batches, not
  * the exact id set.
  */
object RestartHarness {

  val InjectedCrashMessage = "injected sink crash"

  val eventSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType), StructField("user_id", LongType),
    StructField("event_type", StringType)))

  /** One JSON-lines file per micro-batch, mtimes ascending. */
  def writeBatchFile(dir: Path, idx: Int, events: Seq[(Long, String, Timestamp)]): Unit = {
    val lines = events.map { case (u, t, time) =>
      s"""{"ts":"${time.toInstant}","user_id":$u,"event_type":"$t"}"""
    }.mkString("", "\n", "\n")
    val f = dir.resolve(f"batch-$idx%03d.json")
    Files.writeString(f, lines)
    Files.setLastModifiedTime(f, FileTime.fromMillis(1700000000000L + idx * 1000L))
    ()
  }

  /** The harnessed file source: one file per trigger, [[eventSchema]]. */
  def eventStream(spark: SparkSession, dir: Path): Dataset[SessionEvent] = {
    import spark.implicits._
    spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .json(dir.toString)
      .as[SessionEvent]
  }

  /** Document-shaped twin of the event fixture, for the text-keyed
    * streaming gates ([[Streams.nearDupGate]] / [[Streams.ingestStream]]):
    * (ts, doc_id, text), one JSON-lines file per micro-batch, mtimes
    * ascending.
    */
  val docSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType), StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** JSON string escaping for the doc fixture: text is FREE TEXT (the
    * field that will eventually carry quotes/backslashes/newlines), and
    * Spark's PERMISSIVE json reader silently nulls a malformed line —
    * a corrupt fixture would exercise the wrong stream instead of
    * failing loudly.
    */
  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def writeDocFile(dir: Path, idx: Int, docs: Seq[(Long, String, Timestamp)]): Unit = {
    val lines = docs.map { case (id, text, time) =>
      s"""{"ts":"${time.toInstant}","doc_id":$id,"text":"${jsonEscape(text)}"}"""
    }.mkString("", "\n", "\n")
    val f = dir.resolve(f"docs-$idx%03d.json")
    Files.writeString(f, lines)
    Files.setLastModifiedTime(f, FileTime.fromMillis(1700000000000L + idx * 1000L))
    ()
  }

  def docStream(spark: SparkSession, dir: Path): org.apache.spark.sql.DataFrame =
    spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .json(dir.toString)

  /** Idempotent by-batchId sink state, shared across the crash run and
    * the recovery run of one scenario:
    *  - `collected`: last rows committed per batch id;
    *  - `crashSeen`: what the crashed attempt saw before it threw —
    *    replay determinism compares the recovery's rows against this;
    *  - `commits`: sink executions per batch id — a count of 1 after
    *    recovery proves the batch was NOT reprocessed;
    *  - `crashArmed`: one-shot trigger (armed per scenario).
    */
  final class Collector(crashArmed: Boolean) {
    val collected = new ConcurrentHashMap[Long, Seq[FunnelAdvance]]()
    val crashSeen = new ConcurrentHashMap[Long, Seq[FunnelAdvance]]()
    val commits = new ConcurrentHashMap[Long, Int]()
    val crashOnce = new AtomicBoolean(crashArmed)
    def allRows: Seq[FunnelAdvance] = {
      import scala.jdk.CollectionConverters._
      collected.values().asScala.flatten.toSeq
    }
  }

  /** One funnel run over `dir` against `ckpt`: processes everything
    * available, then stops. Returns the failure if the query died
    * (callers match [[InjectedCrashMessage]] in the cause chain to
    * verify the death was the INJECTED crash, not an unrelated break).
    */
  def runFunnel(
      spark: SparkSession,
      dir: Path,
      ckpt: Path,
      c: Collector,
      steps: Seq[String],
      maxSpanSeconds: Long,
      watermark: String = "0 seconds",
      crashAtBatch: Long = 3L): Option[Throwable] = {
    val query = Streams.funnelStream(
        eventStream(spark, dir), steps, maxSpanSeconds, watermark)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .outputMode(OutputMode.Append())
      .foreachBatch { (ds: Dataset[FunnelAdvance], batchId: Long) =>
        val rows = ds.collect().toSeq
        if (batchId == crashAtBatch && c.crashOnce.compareAndSet(true, false)) {
          c.crashSeen.put(batchId, rows)
          throw new RuntimeException(s"$InjectedCrashMessage at batch $batchId")
        }
        c.commits.merge(batchId, 1, (a: Int, b: Int) => a + b)
        c.collected.put(batchId, rows): Unit
      }
      .start()
    val failure = scala.util.Try {
      try query.processAllAvailable()
      finally query.stop()
    }.failed.toOption
    failure
  }

  /** True when `t`'s cause chain contains the injected crash marker. */
  def isInjectedCrash(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .exists(e => e.getMessage != null && e.getMessage.contains(InjectedCrashMessage))
}
