package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional third arg: only dump queries whose name starts with the
    // prefix (builder-side single-query iteration; the driver passes 2).
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, p) => (s, o, Some(p))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(name.startsWith) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // ---- ANN recall gate: the two approximate-by-design queries have no
    // DuckDB oracle row, so they get a hard in-driver gate instead of
    // spec-only coverage — Verify FAILS (nonzero exit) on a recall
    // regression vs the exact brute-force top-k over the same queries.
    {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(spark, sfDir)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      val exact = operators.Retrieval.knnJoin(qs, emb, k = 2)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // Thresholds sit under the measured values (LSH 0.7 @sf0.01 /
      // 0.6 @sf0.1, IVF 1.0 at both) with margin for data drift, not so
      // far under that a real regression (a broken probe or band join)
      // slips through.
      Seq("ann_lsh_topk" -> 0.5, "ann_ivf_topk" -> 0.8).foreach { case (name, thr) =>
        val approx = SparkEntry.queries(name)(spark, sfDir)
          .select("query_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = exact.count(approx.contains).toDouble / exact.size
        println(f"[recall] $name = $recall%.3f (gate >= $thr)")
        require(recall >= thr, s"$name recall $recall below gate $thr")
      }
    }
    spark.stop()
  }
}
