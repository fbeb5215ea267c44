package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance sinks (SURVEY.md §2.1): append, keyed/predicate/bulk
  * delete, retention, JSON sink. The reference mutates SQLite rows and a
  * Chroma collection in place (db_utils.py:71-90, 230-246;
  * chroma_utils.py:127-184, 265-291); the Spark-native equivalents are
  * append writes and filtered overwrites of parquet tables — each delete is
  * one declarative anti-join/filter lineage and the write is atomic
  * (no cross-store rollback, cf. main.py:400-405).
  *
  * Scale notes: appends create new files only (no rewrite); deletes rewrite
  * only because plain parquet has no row-level delete — at 100 TB the same
  * operators target a table layout partitioned by date(ts) so retention
  * deletes drop whole partitions, and a format with deletion vectors would
  * make the rewrite incremental. The operator surface stays identical.
  */
object Store {

  /** O-7: append rows (INSERT analog, db_utils.py:71-90). */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** O-10: delete by key list (db_utils.py:230-246) — keep via anti-join. */
  def deleteByKey(table: DataFrame, keyCol: String, keys: DataFrame): DataFrame =
    table.join(keys.select(keyCol).distinct(), Seq(keyCol), "left_anti")

  /** O-9: upsert — replace ALL existing rows of every key present in
    * `updates`, then append the update rows (the reference's re-index
    * path: delete_doc_from_chroma + index_document_to_chroma,
    * chroma_utils.py:146-235, so a re-ingested file's old chunk set
    * cannot linger). Anti-join + union: both sides hash-partition on the
    * key at scale, no broadcast requirement.
    */
  def upsertByKey(table: DataFrame, updates: DataFrame, keyCol: String): DataFrame =
    deleteByKey(table, keyCol, updates.select(keyCol)).unionByName(updates)

  /** O-11: delete by predicate (chroma_utils.py:146-184) — keep the rest. */
  def deleteWhere(table: DataFrame, predicate: org.apache.spark.sql.Column): DataFrame =
    table.filter(!predicate)

  /** O-13: retention — drop rows older than the cutoff (db_utils.py:280-302). */
  def retentionDelete(table: DataFrame, tsCol: String, cutoff: String): DataFrame =
    table.filter(col(tsCol) >= lit(cutoff).cast("timestamp"))

  /** O-12: clear — truncate to an empty table with the same schema
    * (chroma_utils.py:265-291).
    */
  def clear(table: DataFrame): DataFrame =
    table.filter(lit(false))

  /** Crash-consistent filtered rewrite: materialize `kept` ONCE into a
    * staging directory, then swap it in with filesystem renames. (Plain
    * parquet cannot overwrite a table being read from it — staging also
    * solves that.) The data is written exactly once — at 100 TB a
    * retention delete pays 1× write I/O, not the 2× of a re-read +
    * re-write — and the destination is never in a half-deleted state:
    * the previous table directory is parked at `path + ".old"` until the
    * staging dir has been renamed into place, so a crash at ANY point
    * leaves either the old table readable at `path`, or the swap
    * resumable by [[recoverSwap]] (old table parked, staging complete).
    * Renames are atomic metadata operations on HDFS and local
    * filesystems; on S3-style object stores (no atomic rename) the same
    * contract needs a manifest/snapshot-committing table format instead.
    */
  def overwriteWith(spark: SparkSession, kept: DataFrame, path: String): Unit = {
    val dest = new org.apache.hadoop.fs.Path(path)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new org.apache.hadoop.fs.Path(path + ".staging")
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    // The ONLY data write of the operation; everything after is metadata.
    kept.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"could not clear parked table at $old")
    if (fs.exists(dest) && !fs.rename(dest, old))
      throw new java.io.IOException(s"could not park $dest at $old")
    if (!fs.rename(staging, dest)) {
      // Roll the park back so readers of `path` see the pre-swap table.
      fs.rename(old, dest)
      throw new java.io.IOException(s"could not swap $staging into $dest")
    }
    fs.delete(old, true)
  }

  /** Resume or roll back an [[overwriteWith]] interrupted between its
    * renames. Idempotent; call before reading a table a crashed writer
    * may have left mid-swap. If the destination exists the swap either
    * committed or never started — leftovers are discarded. If not, the
    * staging dir is swapped in when its job committed (`_SUCCESS`
    * present — written by Spark's file output committer), else the
    * parked old table is restored.
    */
  def recoverSwap(spark: SparkSession, path: String): Unit = {
    val dest = new org.apache.hadoop.fs.Path(path)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new org.apache.hadoop.fs.Path(path + ".staging")
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    if (fs.exists(dest)) {
      fs.delete(staging, true)
      fs.delete(old, true)
    } else if (fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))) {
      if (!fs.rename(staging, dest))
        throw new java.io.IOException(s"could not resume swap of $staging into $dest")
      fs.delete(old, true)
    } else if (fs.exists(old)) {
      if (!fs.rename(old, dest))
        throw new java.io.IOException(s"could not restore parked table $old to $dest")
      fs.delete(staging, true)
    }
  }

  /** Small-files compaction: rewrite the table at `path` into
    * ceil(rows / rowsPerFile) files, committed through the same
    * crash-consistent rename swap as [[overwriteWith]] (a crash at any
    * point leaves the old file set readable — compaction must never be
    * the thing that loses a table). Returns (filesBefore, filesAfter).
    *
    * Why it exists: [[append]] writes new files only — that is what
    * makes appends cheap — so an append-heavy table accretes one file
    * set per micro-batch until open()/footer/planning overhead, not
    * bytes, dominates scan cost. Compaction is the standing maintenance
    * job that restores scan-sized files. The sizing pass is one
    * count(); the rewrite's repartition is a round-robin exchange whose
    * only purpose is output sizing (row count is the format-agnostic
    * proxy for file size a public API can compute). At 100 TB, run per
    * partition directory so each job is bounded and partitions compact
    * in parallel — and a deletion-vector table format would replace the
    * rewrite entirely; the operator surface stays the same.
    */
  def compact(spark: SparkSession, path: String, rowsPerFile: Long): (Long, Long) = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(): Long = fs.listStatus(p)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet")).toLong
    val before = dataFiles()
    val rows = spark.read.parquet(path).count()
    val nFiles = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile)
    overwriteWith(spark,
      spark.read.parquet(path).repartition(nFiles.toInt), path)
    (before, dataFiles())
  }

  // ------------------------------------------------------- snapshots
  // Manifest-committed table versions: the object-store-safe commit
  // protocol [[overwriteWith]]'s scaladoc points at (S3-style stores
  // have no atomic rename, so a rename swap cannot be the commit
  // there). The public design, as in snapshot-based table formats:
  // data files are IMMUTABLE and live under `path/data/snap-<v>-...`;
  // a table version IS its manifest file `manifest-v<v>.json`, written
  // once with create(overwrite = false) — an atomic create on HDFS and
  // a conditional PUT on object stores — AFTER its data job committed.
  // The current table = the highest manifest version. Consequences:
  //  - a crashed writer leaves an orphan data dir with NO manifest:
  //    invisible to every reader, reclaimed by [[vacuumSnapshots]];
  //  - readers never see a partial table: the manifest appears only
  //    after the data is complete, and old versions stay readable
  //    (time travel) until vacuumed;
  //  - two racing writers cannot both commit version v: the second
  //    create(overwrite = false) of the same manifest name fails.
  // The manifest carries the data dir + row count — a dir-granular
  // manifest is enough because snapshot dirs are write-once.

  private val manifestRe = "manifest-v([0-9]+)\\.json".r

  /** Versions present at `path`, ascending (empty for a fresh table). */
  def snapshotVersions(spark: SparkSession, path: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case manifestRe(v) => Some(v.toLong)
      case _ => None
    }).sorted
  }

  /** Commit `df` as the next table version; returns the new version
    * number. Single logical writer per version: a lost race to the
    * manifest create fails the commit (the orphaned data dir is
    * vacuumable), never corrupts the table.
    */
  def commitSnapshot(spark: SparkSession, df: DataFrame, path: String): Long = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val version = snapshotVersions(spark, path).lastOption.getOrElse(0L) + 1
    // Nonce keeps retried/raced writers from sharing a data dir.
    val nonce = java.util.UUID.randomUUID.toString.take(8)
    val dataDir = s"data/snap-$version-$nonce"
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$path/$dataDir")
    val rows = spark.read.parquet(s"$path/$dataDir").count()
    val manifest = new org.apache.hadoop.fs.Path(dir, s"manifest-v$version.json")
    // The COMMIT POINT: atomic create-if-absent of the manifest.
    val out = fs.create(manifest, /* overwrite = */ false)
    try out.write(
      s"""{"version":$version,"dir":"$dataDir","n_rows":$rows}""".getBytes("UTF-8"))
    finally out.close()
    version
  }

  private def manifestDir(
      spark: SparkSession, path: String, version: Long): String = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val p = new org.apache.hadoop.fs.Path(dir, s"manifest-v$version.json")
    val in = fs.open(p)
    val body = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8")
    } finally in.close()
    """"dir"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(body)
      .map(_.group(1))
      .getOrElse(throw new java.io.IOException(s"malformed manifest $p"))
  }

  /** Read a table version (default: current). Old versions stay
    * readable until vacuumed — time travel for audits and reproducible
    * reruns.
    */
  def readSnapshot(
      spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(snapshotVersions(spark, path).lastOption)
      .getOrElse(throw new java.io.IOException(s"no committed snapshot at $path"))
    spark.read.parquet(s"$path/${manifestDir(spark, path, v)}")
  }

  /** Drop all but the last `keepLast` versions AND any orphan data dir
    * no manifest references (crashed or out-raced writers). Returns the
    * number of directories deleted. Manifest-first deletion order: a
    * crash mid-vacuum can only leave an orphan dir (re-vacuumable),
    * never a manifest whose data is gone. `orphanGraceMs` protects an
    * IN-FLIGHT writer — a data dir younger than the grace window may
    * simply not have its manifest yet, so it survives the sweep (the
    * same age-based guard snapshot table formats use).
    */
  def vacuumSnapshots(
      spark: SparkSession, path: String, keepLast: Int = 1,
      orphanGraceMs: Long = 3600000L): Int = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val versions = snapshotVersions(spark, path)
    val (drop, keep) = versions.splitAt(math.max(0, versions.size - keepLast))
    val keptDirs = keep.map(v => manifestDir(spark, path, v)).toSet
    var deleted = 0
    drop.foreach { v =>
      val d = manifestDir(spark, path, v)
      fs.delete(new org.apache.hadoop.fs.Path(dir, s"manifest-v$v.json"), false)
      if (!keptDirs.contains(d) &&
          fs.delete(new org.apache.hadoop.fs.Path(dir, d), true)) deleted += 1
    }
    val dataRoot = new org.apache.hadoop.fs.Path(dir, "data")
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot).foreach { st =>
      val rel = s"data/${st.getPath.getName}"
      if (!keptDirs.contains(rel) && st.getModificationTime < cutoff &&
          fs.delete(st.getPath, true)) deleted += 1
    }
    deleted
  }

  /** O-14/O-6: JSON sink + scan (localStorage analog, App.js:20-61). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl)).json(path)
}
