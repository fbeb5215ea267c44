package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pin the driver-owned testdata schemas — ALL of them, not just events.
  *
  * The r7 lesson: `events.parquet` silently changed encoding between
  * rounds and 36 queries + 44 tests failed with an error message naming
  * none of the cause. `events.ts` is now encoding-adaptive
  * ([[EventsEncodingSpec]]); this spec extends the same fail-loudly
  * property to every table the registry reads, so the NEXT regeneration
  * drift (an int32 widened to int64, an embedding flipped to
  * array<double>, a renamed column) is reported here as
  * "<table>.<column> drifted", not as dozens of downstream
  * AnalysisExceptions.
  *
  * Columns the engine is SENSITIVE to are pinned by exact type (join
  * keys, the float embedding the codegen cosine kernel expects, text
  * columns under regex/tokenize). A pin failing does not necessarily
  * mean the engine is broken — it means a human must LOOK: either the
  * loader grows an adaptive branch (the events precedent) or the pin is
  * consciously updated.
  */
class TestdataSchemaSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def schemaOf(table: String): Map[String, DataType] =
    spark.read.parquet(s"$sfDir/$table.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap

  private def assertPinned(table: String, expected: (String, DataType)*): Unit = {
    val actual = schemaOf(table)
    val drift = expected.flatMap { case (name, dt) =>
      actual.get(name) match {
        case Some(`dt`) => None
        case Some(other) => Some(s"$table.$name drifted: expected $dt, found $other")
        case None        => Some(s"$table.$name missing (present: ${actual.keys.toSeq.sorted.mkString(", ")})")
      }
    }
    assert(drift.isEmpty, drift.mkString("\n"))
  }

  test("dimension tables: keys and names") {
    assertPinned("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertPinned("nation",
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType)
    assertPinned("part",
      "p_partkey" -> LongType, "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
  }

  test("fact tables: join keys, measures, timestamp columns") {
    assertPinned("customer",
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertPinned("supplier",
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    assertPinned("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderpriority" -> StringType)
    assertPinned("lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType)
    // date columns: any timestamp flavor is tolerable to the date-typed
    // predicates, but a string or int encoding is not
    for (t <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
      val dt = schemaOf(t._1)(t._2)
      assert(dt == TimestampType || dt == TimestampNTZType || dt == DateType,
        s"${t._1}.${t._2} drifted to non-temporal $dt")
    }
  }

  test("documents: the text-pipeline contract") {
    assertPinned("documents",
      "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType)
  }

  test("embeddings: float vector exactly — the codegen cosine kernel's input type") {
    assertPinned("embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType))
    // label rides some fixtures; when present it must stay integral
    schemaOf("embeddings").get("label").foreach { dt =>
      assert(dt == IntegerType || dt == LongType, s"embeddings.label drifted to $dt")
    }
  }

  test("events: columns around the adaptive ts") {
    // ts itself is covered (all three encodings) by EventsEncodingSpec
    assertPinned("events",
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
  }
}
