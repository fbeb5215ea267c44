package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: bit-interleave exactness vs a sequential reference,
  * layout row-set fidelity, and the data-skipping effect itself — the
  * z-layout must materialize strictly fewer rows from parquet than the
  * single-column linear layout on a conjunctive 2-D range query.
  */
class ZOrderSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  /** Sequential reference interleave: bit i of coordinate d lands at
    * bit i*n + d. */
  private def refZ(coords: Seq[Long]): Long = {
    val n = coords.size
    val bits = Layout.bitsFor(n)
    var z = 0L
    for (i <- 0 until bits; d <- 0 until n)
      z |= ((coords(d) >> i) & 1L) << (i * n + d)
    z
  }

  test("2-D zValue equals the sequential bit interleave exactly") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)((rnd.nextLong() & 0x7FFFFFFFL, rnd.nextLong() & 0x7FFFFFFFL)) ++
      Seq((0L, 0L), (0x7FFFFFFFL, 0x7FFFFFFFL), (0L, 0x7FFFFFFFL), (1L, 2L))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(Seq(col("x"), col("y"))).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == refZ(Seq(x, y)), s"($x,$y)")
      assert(z >= 0, s"sign bit set for ($x,$y)")
    }
  }

  test("3-D zValue equals the sequential bit interleave exactly") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)(
      (rnd.nextLong() & 0x1FFFFFL, rnd.nextLong() & 0x1FFFFFL, rnd.nextLong() & 0x1FFFFFL)) ++
      Seq((0L, 0L, 0L), (0x1FFFFFL, 0x1FFFFFL, 0x1FFFFFL))
    val got = rows.toDF("x", "y", "z")
      .select(Layout.zValue(Seq(col("x"), col("y"), col("z"))).as("m"),
        col("x"), col("y"), col("z"))
      .collect()
    got.foreach { r =>
      val m = r.getLong(0)
      assert(m == refZ(Seq(r.getLong(1), r.getLong(2), r.getLong(3))))
      assert(m >= 0)
    }
  }

  test("normalizeToBits is monotone, clamped, and degenerate-safe") {
    val df = Seq(-5.0, 0.0, 1.0, 49.5, 99.9, 100.0, 140.0).toDF("v")
    val out = df.select(Layout.normalizeToBits(col("v"), (0.0, 100.0), 8).as("b"))
      .collect().map(_.getLong(0))
    assert(out.head == 0L && out.last == 255L, "out-of-range values clamp")
    assert(out.sameElements(out.sorted), "monotone")
    assert(out(5) == 255L, "max maps to top bin")
    // min == max: everything lands in bin 0, never divides by zero
    val flat = df.select(Layout.normalizeToBits(col("v"), (7.0, 7.0), 8).as("b"))
      .collect().map(_.getLong(0))
    assert(flat.forall(_ == 0L))
  }

  test("z-layout preserves the exact row multiset and schema") {
    val n = 5000
    val src = spark.range(n).select(
      col("id"),
      (col("id") * 2654435761L % 1000).cast("double").as("a"),
      (col("id") * 40503L % 997).cast("double").as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zspec").toString
    Layout.writeZOrdered(src, Seq("a", "b"), s"$dir/z", nFiles = 8)
    val back = spark.read.parquet(s"$dir/z")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == n)
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("z-layout skips more than the linear layout on a 2-D box query") {
    // Two independent uniform dimensions — the layout-choice scenario.
    val n = 200000L
    val src = spark.range(n).select(
      col("id"),
      (col("id") * 2654435761L % 100000L).cast("double").as("a"),
      (col("id") * 40503L % 99991L).cast("double").as("b"))
    // 256 files = a ~16x16 grid in (a, b): the pruning granularity that
    // separates the two layouts. (At 100 TB the grid is row groups, not
    // files; the stats mechanism is identical.)
    val dir = java.nio.file.Files.createTempDirectory("graft_zskip").toString
    Layout.writeZOrdered(src, Seq("a", "b"), s"$dir/z", nFiles = 256)
    Layout.writeLinear(src, "a", s"$dir/lin", nFiles = 256)

    def box(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("a").between(10000, 20000) && col("b").between(40000, 50000))

    val zDf = box(spark.read.parquet(s"$dir/z"))
    val linDf = box(spark.read.parquet(s"$dir/lin"))
    // same answer from both layouts
    assert(zDf.count() == linDf.count())

    val zRows = Layout.scanRowsMaterialized(box(spark.read.parquet(s"$dir/z")))
    val linRows = Layout.scanRowsMaterialized(box(spark.read.parquet(s"$dir/lin")))
    info(s"materialized: z=$zRows linear=$linRows of $n")
    // the 10% x 10% box touches ~a tenth of the linear layout's files
    // (a-range only) but only the z-cells overlapping the box (~3-4% of
    // rows). Generous margins: z must beat linear by >= 2x and
    // materialize under 8% of the table.
    assert(zRows * 2 <= linRows, s"z=$zRows not < linear=$linRows / 2")
    assert(zRows * 100 <= n * 8, s"z=$zRows over 8% of $n")
  }

  test("slab placement: exactly one contiguous z-slab per output file, deterministically") {
    // The deterministic file cut's core property (and what the r15
    // murmur3-preimage repartition must preserve from the old identity
    // partitioner): equal-width z slabs map one-to-one onto output
    // files — no slab split across files, no file holding two slabs —
    // so every file's z min/max span is as tight as the grid allows and
    // pruning quality is reproducible run over run.
    val nFiles = 16
    val src = (0 until 4096).map(i => ((i * 1103515245L + 12345) % 1000, (i * 69069L + 7) % 1000))
      .toDF("a", "b")
    def slabOfFile(dir: String): Map[String, Set[Long]] = {
      val bits = Layout.bitsFor(2)
      val ranges = Layout.colRanges(src, Seq("a", "b"))
      val chunk = (((BigInt(1) << (bits * 2)) + nFiles - 1) / nFiles).toLong
      val laid = spark.read.parquet(dir)
      val z = Layout.zValue(Seq("a", "b").zip(ranges).map { case (c, r) =>
        Layout.normalizeToBits(col(c), r, bits) })
      laid
        .withColumn("_file", input_file_name())
        .withColumn("_zv", z)
        .withColumn("_slab", expr(s"_zv div ${chunk}L"))
        .groupBy("_file").agg(collect_set(col("_slab")).as("slabs"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    }
    val dir1 = java.nio.file.Files.createTempDirectory("graft_zslab1").toString
    Layout.writeZOrdered(src, Seq("a", "b"), dir1, nFiles)
    val m1 = slabOfFile(dir1)
    assert(m1.values.forall(_.size == 1),
      s"a file holds more than one slab: ${m1.filter(_._2.size > 1)}")
    val slabCounts = m1.values.toSeq.map(_.head).groupBy(identity).view.mapValues(_.size)
    assert(slabCounts.values.forall(_ == 1),
      s"a slab split across files: ${slabCounts.filter(_._2 > 1)}")
    // Determinism: a second write produces the same slab -> file-count
    // structure (file names are fresh part-UUIDs; the CUT is what must
    // reproduce).
    val dir2 = java.nio.file.Files.createTempDirectory("graft_zslab2").toString
    Layout.writeZOrdered(src, Seq("a", "b"), dir2, nFiles)
    val m2 = slabOfFile(dir2)
    assert(m1.values.map(_.head).toSeq.sorted == m2.values.map(_.head).toSeq.sorted,
      "the slab set changed between identical writes")
  }

  test("empty or all-null z-input fails with a descriptive error, not an NPE") {
    val empty = spark.range(0).select(col("id").cast("double").as("a"))
    val e1 = intercept[IllegalArgumentException] {
      Layout.colRanges(empty, Seq("a"))
    }
    assert(e1.getMessage.contains("z-order"), e1.getMessage)
    val allNull = spark.range(5).select(lit(null).cast("double").as("a"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.colRanges(allNull, Seq("a"))
    }
    assert(e2.getMessage.contains("a"), e2.getMessage)
  }
}
