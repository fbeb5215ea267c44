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
  /** `events.ts` has shipped under two encodings across fixture
    * generations: parquet TIMESTAMP(NANOS) (which Spark's µs-precision
    * TimestampType refuses to read directly, so we read it as a nanos long
    * via the legacy conf and floor-divide to micros), and plain
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark reads as
    * TIMESTAMP_NTZ). Dispatch on the OBSERVED schema rather than a
    * remembered one — the reference's loaders likewise branch on the
    * format they actually see (backend/chroma_utils.py:60-71) — so a
    * fixture regeneration changes the decode path, not the results.
    *
    * Both paths normalize to TimestampType. Sessions pin
    * `spark.sql.session.timeZone=UTC`, so the NTZ→Timestamp cast is
    * numerically the identity and matches DuckDB's naive read of the same
    * file, keeping the oracle compare value-identical.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(rawEvents(spark, dir))

  /** Events with a time-range predicate pushed to the parquet scan in the
    * column's NATIVE space, BEFORE any conversion: wrapping the column
    * first (`timestamp_micros(ts div 1000) >= cutoff`, or a cast) hides it
    * from Catalyst's pushdown — the scan would read everything, a
    * full-table scan at 100 TB. Filtering the raw column with a literal of
    * the same type reaches PushedFilters and prunes row groups via min/max
    * stats:
    *   - legacy nanos-long encoding → compare against the cutoff in raw
    *     nanos (sound: ns→µs truncation is monotone, cutoffs are whole
    *     seconds);
    *   - TIMESTAMP_NTZ encoding → compare against a LocalDateTime literal
    *     (TIMESTAMP_NTZ), which the parquet source pushes natively.
    */
  def eventsSince(spark: SparkSession, dir: String, cutoff: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // Parse the cutoff explicitly as UTC — Timestamp.valueOf would use the
    // JVM default timezone and shift the pushed filter by the host offset.
    val cutoffLdt = java.time.LocalDateTime.parse(cutoff.replace(' ', 'T'))
    val raw       = rawEvents(spark, dir)
    raw.schema("ts").dataType match {
      case LongType =>
        val cutoffNs = cutoffLdt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000000L
        normalizeTs(raw.filter(col("ts") >= lit(cutoffNs)))
      case TimestampNTZType =>
        normalizeTs(raw.filter(col("ts") >= lit(cutoffLdt)))
      case TimestampType =>
        val cutoffTs = java.sql.Timestamp.from(cutoffLdt.toInstant(java.time.ZoneOffset.UTC))
        raw.filter(col("ts") >= lit(cutoffTs))
      case other =>
        sys.error(s"events.ts: unsupported encoding $other (expected nanos long, TIMESTAMP_NTZ or TIMESTAMP)")
    }
  }

  /** Read events.parquet as written. The legacy conf only affects
    * TIMESTAMP(NANOS) columns (read as raw long); µs-encoded fixtures are
    * unaffected by it and come back as a timestamp type.
    */
  private def rawEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }

  /** Normalize whatever encoding `ts` arrived in to TimestampType. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        sys.error(s"events.ts: unsupported encoding $other (expected nanos long, TIMESTAMP_NTZ or TIMESTAMP)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
