package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must analyze and execute at sf0.001 — catches a
  * broken query at `sbt test` time instead of at the driver's gate.
  * (Hash correctness is the oracle harness's job; this is liveness.)
  */
class RegistrySmokeSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry runs and returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle SQL without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query runs: $name") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.limit(3).collect() // force execution of a slice
    }
  }
}
