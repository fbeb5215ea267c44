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

  /** Atomic filtered rewrite: materialize `kept` then overwrite `path`.
    * (Plain parquet cannot overwrite a table being read from it — stage
    * through a temp dir, then swap.)
    */
  def overwriteWith(spark: SparkSession, kept: DataFrame, path: String): Unit = {
    val tmp = path + ".staging"
    kept.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** O-14/O-6: JSON sink + scan (localStorage analog, App.js:20-61). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl)).json(path)
}
