package graft

import org.apache.spark.sql.SparkSession

/** Minimal smoke main mirroring the driver's t1 check: run
  * `SparkEntry.entry` on sf0.001 and print its row count + head.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(6, truncate = false)
    spark.stop()
  }
}
