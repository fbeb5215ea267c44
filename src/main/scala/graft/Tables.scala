package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All stores in the engine are plain parquet tables read through
  * `spark.read.parquet`, so Catalyst's parquet source provides predicate
  * pushdown, column pruning and min/max row-group skipping for free.
  * These stand in for the reference's SQLite tables + Chroma collection
  * (reference: backend/db_utils.py:45-65, backend/chroma_utils.py:34-43).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * µs-precision TimestampType refuses to read directly. Read it as a
    * nanos long and floor-divide to micros — the same truncation DuckDB
    * applies when casting TIMESTAMP_NS to TIMESTAMP, keeping the two
    * engines value-identical for the oracle compare.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Events with a time-range predicate applied in raw nanos space, BEFORE
    * the µs conversion: `timestamp_micros(ts div 1000) >= cutoff` wraps the
    * column in an expression Catalyst cannot push to parquet (the scan
    * would read everything — a full-table scan at 100 TB), whereas the
    * equivalent raw comparison `ts_ns >= cutoff_ns` reaches PushedFilters
    * and prunes row groups via min/max stats. The rewrite is sound because
    * ns→µs truncation is monotone and cutoffs are whole seconds.
    */
  def eventsSince(spark: SparkSession, dir: String, cutoff: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Parse the cutoff explicitly as UTC — Timestamp.valueOf would use the
    // JVM default timezone and shift the pushed filter by the host offset.
    val cutoffNs = java.time.LocalDateTime
      .parse(cutoff.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
      .toEpochMilli * 1000000L
    table(spark, dir, "events")
      .filter(col("ts") >= lit(cutoffNs))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
