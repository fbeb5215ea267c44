package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Dedup, Graphs, LoopCheckpoint}

/** The reliable-checkpoint mode (`spark.graft.loop.checkpointDir`) must
  * be a pure EXECUTION choice: every iterative loop produces bit-equal
  * results under localCheckpoint (the local[N] default) and under
  * reliable `checkpoint(dir)` (the executor-loss-safe cluster mode).
  * Exercised on the three loop families the engine runs: the PageRank
  * fixed point, star-round connected components, and the BPE trainer
  * (both the recount path and the incremental overlay path share
  * [[LoopCheckpoint]] internally).
  */
class CheckpointModeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // ONE directory for the whole suite: SparkContext.setCheckpointDir is
  // set once per context (LoopCheckpoint documents first-set-wins), so a
  // per-test temp dir would silently keep writing under the first one.
  private lazy val reliableDir =
    java.nio.file.Files.createTempDirectory("graft_ckpt")

  private def withReliableDir[T](f: => T): T = {
    spark.conf.set(LoopCheckpoint.ConfKey, reliableDir.toString)
    try f
    finally spark.conf.unset(LoopCheckpoint.ConfKey)
  }

  private def edgesDf = Seq(
    (1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L), (1L, 3L, 1L),
    (4L, 1L, 5L), (5L, 5L, 1L), (6L, 2L, 2L), (7L, 7L, 4L))
    .toDF("src", "dst", "weight")
    .filter(col("src") =!= col("dst")) // drop self-loops like itemTransitions

  test("pageRankPicos: reliable checkpoint equals localCheckpoint bit for bit") {
    val local = Graphs.pageRankPicos(edgesDf, iters = 8)
      .as[(Long, Long)].collect().toMap
    val reliable = withReliableDir {
      Graphs.pageRankPicos(edgesDf, iters = 8)
        .as[(Long, Long)].collect().toMap
    }
    assert(local == reliable)
    assert(local.nonEmpty)
  }

  test("duplicateClustersStar: both modes produce the identical clustering") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 13L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val local = Dedup.duplicateClustersStar(pairs)
      .as[(Long, Long)].collect().toSet
    val reliable = withReliableDir {
      Dedup.duplicateClustersStar(pairs).as[(Long, Long)].collect().toSet
    }
    assert(local == reliable)
    assert(local.map(_._2) == Set(1L, 10L, 20L))
  }

  test("BPE learnMerges: both modes learn the identical merge sequence") {
    val docs = Seq(
      (1L, "lower lower lowest low low low"),
      (2L, "newer newest new new lower"),
      (3L, "wider wide widest lowest")).toDF("doc_id", "text")
    val local = Bpe.learnMerges(docs, nMerges = 6)
    val reliable = withReliableDir { Bpe.learnMerges(docs, nMerges = 6) }
    assert(local == reliable)
    assert(local.size == 6)
  }

  test("BPE incremental path: reliable mode with compactions equals the recount result") {
    // The incremental trainer juggles THREE IterScopes (pairs, base,
    // overlay) with deletion points tied to materialization order —
    // the retention logic most likely to delete a file something still
    // reads. Force it through reliable mode with a tiny overlay cap so
    // compactions fire (overlayIter.released + baseIter), and pin the
    // merge sequence against the default-mode recount result.
    val docs = Seq(
      (1L, "lower lower lowest low low low newer"),
      (2L, "newer newest new new lower wider"),
      (3L, "wider wide widest lowest low newest")).toDF("doc_id", "text")
    val expected = Bpe.learnMerges(docs, nMerges = 8)
    val reliable = withReliableDir {
      Bpe.learnMergesIncremental(docs, nMerges = 8, maxOverlayRows = 2)
    }
    assert(reliable == expected)
    assert(reliable.size == 8)
  }

  test("the reliable mode actually writes checkpoint files") {
    withReliableDir {
      Graphs.pageRankPicos(edgesDf, iters = 2).collect()
    }
    val it = java.nio.file.Files.walk(reliableDir).iterator()
    var n = 0
    while (it.hasNext) { it.next(); n += 1 }
    assert(n > 1, s"expected checkpoint files under $reliableDir")
  }

  test("IterScope retention: superseded iteration checkpoints are deleted") {
    // An 8-iteration PageRank checkpoints 5 loop-invariants (the edge
    // list, nodes, shares, marked, pr0-as-first-iterate) plus 8
    // iterates; without retention all ~13 rdd-* directories would
    // persist. IterScope deletes each superseded iterate once its
    // successor materializes, so only the invariants + the FINAL
    // iterate survive the run.
    def rddDirs(): Set[java.nio.file.Path] = {
      val out = scala.collection.mutable.Set.empty[java.nio.file.Path]
      val it = java.nio.file.Files.walk(reliableDir).iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.startsWith("rdd-")) out += p
      }
      out.toSet
    }
    val before = rddDirs()
    val result = withReliableDir {
      Graphs.pageRankPicos(edgesDf, iters = 8).collect()
    }
    assert(result.nonEmpty)
    val created = rddDirs() -- before
    assert(created.nonEmpty, "reliable run must have written checkpoints")
    assert(created.size <= 7,
      s"retention failed: ${created.size} rdd-* dirs survived an 8-iteration run " +
        s"(expected invariants + final iterate only): ${created.mkString(", ")}")
  }

  test("IterScope mixed lazy/eager: deletion defers past an unmaterialized lazy iterate") {
    // A lazy (eager = false) iterate recomputes through its
    // PREDECESSOR's checkpoint files until its own first action. An
    // eager apply arriving while the lazy one is still unmaterialized
    // auto-runs materialized(keep = 1) — which must NOT delete the
    // lazy iterate's predecessor (it would strand the recompute path).
    // Deletion is deferred until the lazy entry has written its files.
    withReliableDir {
      val scope = new LoopCheckpoint.IterScope
      val f0 = scope(spark.range(10).toDF("v"))                 // eager: materialized
      val f1 = scope(f0.withColumn("v", col("v") + 1), eager = false) // lazy: NOT yet
      val d0 = checkpointFile(f0)
      // Eager apply while f1 is unmaterialized: keep=1 would name f0 for
      // deletion, but f1 still recomputes through it — must survive.
      val f2 = scope(spark.range(5).toDF("w"))
      assert(exists(d0), "predecessor of an unmaterialized lazy iterate was deleted")
      assert(f1.count() == 10) // materializes f1 through d0's files
      // Next eager apply reclaims the backlog: f0 and f1 are now both
      // superseded AND f1's files exist, so d0 (and f1's) can go.
      val f3 = scope(spark.range(3).toDF("x"))
      assert(!exists(d0), "superseded checkpoint not reclaimed after the lazy iterate materialized")
      assert(f3.count() == 3)
    }
  }

  test("IterScope: an unmaterialized lazy head entry stays tracked, files reclaimed later") {
    // A lazy iterate with NO materialized ancestor must not be DROPPED
    // from tracking by an eager successor's auto-materialized(1): the
    // delete would be a silent no-op (no files yet), and once a later
    // action materializes the frame its reliable-FS files would leak
    // untracked forever.
    withReliableDir {
      val scope = new LoopCheckpoint.IterScope
      val f0 = scope(spark.range(7).toDF("v"), eager = false) // lazy head, no ancestor
      val f1 = scope(spark.range(4).toDF("w")) // eager: auto-materialized(1)
      assert(f0.count() == 7) // NOW f0 writes its checkpoint files
      val d0 = checkpointFile(f0)
      assert(exists(d0))
      val f2 = scope(spark.range(3).toDF("x")) // next eager reclaims the backlog
      assert(!exists(d0),
        "lazy head entry's files leaked — it was dropped from tracking while unmaterialized")
      assert(f2.count() == 3)
    }
  }

  private def checkpointFile(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.analyzed
      .collectFirst { case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd }
      .flatMap(_.getCheckpointFile)
      .getOrElse(fail("no checkpointed RDD in the plan"))

  private def exists(file: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(file)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
