package graft
import org.apache.spark.sql.SparkSession

/** Dev profiler for a single registry query: `runMain graft.BenchOne
  * <name> [iters]` times it on SPARK_GRAFT_SF_DIR and prints per-iteration
  * seconds plus the final (adaptive) executed plan — the tool for telling
  * a real plan regression apart from this machine's multi-second stalls
  * (see Bench.scala's median-of-3 note).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[benchone] iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count()
    println("[benchone] final executed plan:")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
