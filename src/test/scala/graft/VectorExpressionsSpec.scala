package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.expressions.VectorExpressions
import graft.functions.VectorOps

/** The codegen'd CosineSimilarity must be bit-identical with the
  * higher-order-function reference form (same accumulation order), since
  * oracle SQL mirrors the latter.
  */
class VectorExpressionsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(64, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)

  test("codegen cosine matches HOF cosine bit-for-bit on random vectors") {
    val pairs = (1 to 50).map { i =>
      (vecGen.pureApply(Gen.Parameters.default, Seed(i.toLong)),
       vecGen.pureApply(Gen.Parameters.default, Seed((i + 1000).toLong)))
    }
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      VectorExpressions.cosineSim($"a", $"b").as("fast"),
      VectorOps.cosineSim($"a", $"b").as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"fast=${r.getDouble(0)} ref=${r.getDouble(1)}")
    }
  }

  test("codegen cosine handles identical, orthogonal and zero vectors") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
    val out = df.select(VectorExpressions.cosineSim($"a", $"b")).as[Double].collect()
    assert(out(0) == 1.0 && out(1) == 0.0 && out(2) == 0.0)
  }

  test("codegen cosine survives interpreted (non-codegen) eval too") {
    // force interpreted path via a filter on the expression in a plan
    // fragment that falls back (collect over local relation with eval)
    val e = graft.expressions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2f, 4f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val v = e.eval(null).asInstanceOf[Double]
    assert(math.abs(v - 1.0) < 1e-12)
  }
}
