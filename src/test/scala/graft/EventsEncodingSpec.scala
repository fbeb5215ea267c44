package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema pinning for the driver-owned `events.parquet` (VERDICT r7
  * directive #2): the fixture has silently changed encoding once already —
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS) — and the loader's remembered
  * assumption broke 36 queries without any test failing. This spec makes
  * encoding drift fail LOUDLY:
  *
  *   1. committed fixtures in BOTH historical encodings (written with
  *      parquet timestamp[ns] and timestamp[us] logical types) must read
  *      through [[Tables.events]]/[[Tables.eventsSince]] to identical,
  *      correctly-typed values;
  *   2. the live testdata's `ts` column must be one of the encodings the
  *      loader dispatches on — a third encoding fails here first, in one
  *      obvious place, instead of 36 queries deep.
  */
class EventsEncodingSpec extends AnyFunSuite with SparkTestSession {

  /** Copy a committed fixture into a temp dir under the `events.parquet`
    * name [[Tables]] expects.
    */
  private def fixtureDir(resource: String): String = {
    val src = getClass.getResource(s"/$resource.parquet")
    assert(src != null, s"missing test resource $resource.parquet")
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$resource-")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(src.toURI), dir.resolve("events.parquet"))
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private def tsStrings(dir: String): Seq[(Long, String)] = {
    import org.apache.spark.sql.functions._
    Tables.events(spark, dir)
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
  }

  test("all three historical encodings read to identical TimestampType values") {
    // nanos long (legacy), TIMESTAMP_NTZ (isAdjustedToUTC=false) and
    // instant-semantics TIMESTAMP (isAdjustedToUTC=true) — one fixture
    // each; the nanos fixture carries sub-µs residue so equality also
    // proves the ns path TRUNCATES (floor), matching DuckDB's cast.
    val nanosDir  = fixtureDir("events_nanos")
    val microsDir = fixtureDir("events_micros")
    val utcDir    = fixtureDir("events_micros_utc")
    for (d <- Seq(nanosDir, microsDir, utcDir))
      assert(Tables.events(spark, d).schema("ts").dataType == TimestampType)
    val n = tsStrings(nanosDir)
    val m = tsStrings(microsDir)
    val u = tsStrings(utcDir)
    assert(n == m, s"encodings diverged:\n  nanos : $n\n  micros: $m")
    assert(n == u, s"encodings diverged:\n  nanos : $n\n  utc   : $u")
    assert(n.nonEmpty && n.head._2.startsWith("2024-01-14 23:59:58.123456"),
      s"wall-clock shifted — timezone leak in the decode path: ${n.head}")
  }

  test("eventsSince filters every encoding identically and keeps the cutoff pushed") {
    val cutoff = "2024-01-15 00:00:00"
    for (res <- Seq("events_nanos", "events_micros", "events_micros_utc")) {
      val dir = fixtureDir(res)
      val df  = Tables.eventsSince(spark, dir, cutoff)
      assert(df.schema("ts").dataType == TimestampType, s"$res: ts not normalized")
      // rows 0-1 precede midnight; exactly 4 survive the cutoff
      assert(df.count() == 4, s"$res: cutoff filtered wrong row set")
      // the predicate must reach the scan in the column's native space
      val plan   = df.queryExecution.executedPlan.toString
      val pushed = plan.indexOf("PushedFilters")
      assert(pushed >= 0 &&
        plan.substring(pushed, math.min(plan.length, pushed + 400))
          .contains("GreaterThanOrEqual(ts,"),
        s"$res: cutoff not pushed to the parquet scan:\n${plan.take(800)}")
    }
  }

  test("live testdata events.ts is an encoding the loader dispatches on") {
    // Raw read, same conf the loader applies — if the driver regenerates
    // the fixture under a THIRD encoding, this is the assertion that names
    // the drift instead of 36 queries throwing DATATYPE_MISMATCH.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val dt  = raw.schema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType).contains(dt),
      s"events.ts regenerated under an unsupported encoding: $dt — extend Tables.normalizeTs")
    // and the normalized loader must expose TimestampType regardless
    assert(Tables.events(spark, "/root/testdata/sf0.001").schema("ts").dataType == TimestampType)
  }
}
