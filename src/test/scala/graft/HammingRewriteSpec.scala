package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.HammingJoinRewrite

/** The Hamming theta-join → banded equi-join optimizer rule: fires on
  * the naive spelling, preserves exact semantics (pigeonhole), leaves
  * already-equi joins and unprunable-k joins alone.
  */
class HammingRewriteSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // Fingerprints with controlled pairwise distances, including negative
  // (sign-bit-set) and extreme values.
  private val fps: Seq[(Long, Long)] = Seq(
    (1L, 0x0F0F0F0FL), (2L, 0x0F0F0F0EL), (3L, 0x0F0F0F0CL),
    (4L, 0x70F0F0F0L), (5L, -1L), (6L, 0L), (7L, 0x123456789ABCDEFL),
    (8L, 0x123456789ABCDEEL), (9L, Long.MinValue), (10L, Long.MaxValue))

  private def expectedPairs(maxH: Int): Set[(Long, Long)] =
    (for {
      (i, x) <- fps; (j, y) <- fps
      if i < j && java.lang.Long.bitCount(x ^ y) <= maxH
    } yield (i, j)).toSet

  private def withRule[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ HammingJoinRewrite
    try f finally spark.experimental.extraOptimizations = prev
  }

  private def hammingJoin(maxH: Int) = {
    val df = fps.toDF("id", "fp")
    val a = df.select($"id".as("ida"), $"fp".as("fpa"))
    val b = df.select($"id".as("idb"), $"fp".as("fpb"))
    a.join(b, bit_count($"fpa".bitwiseXOR($"fpb")) <= maxH && $"ida" < $"idb")
      .select("ida", "idb")
  }

  test("rewrite fires: equi-join plan, theta-identical results") {
    withRule {
      for (maxH <- Seq(1, 2, 8)) {
        val joined = hammingJoin(maxH)
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"maxH=$maxH still a nested-loop join:\n${plan.take(600)}")
        val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == expectedPairs(maxH), s"maxH=$maxH wrong result")
      }
    }
  }

  test("strict-inequality and reversed spellings also fire") {
    withRule {
      val df = fps.toDF("id", "fp")
      val a = df.select($"id".as("ida"), $"fp".as("fpa"))
      val b = df.select($"id".as("idb"), $"fp".as("fpb"))
      val lt = a.join(b, bit_count($"fpa".bitwiseXOR($"fpb")) < 3 && $"ida" < $"idb")
        .select("ida", "idb")
      assert(!lt.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(lt.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expectedPairs(2))
      val rev = a.join(b, lit(2) >= bit_count($"fpb".bitwiseXOR($"fpa")) && $"ida" < $"idb")
        .select("ida", "idb")
      assert(!rev.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(rev.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expectedPairs(2))
    }
  }

  test("guards: equi-joins and unprunable k are left untouched") {
    withRule {
      val df = fps.toDF("id", "fp")
      val a = df.select($"id".as("ida"), $"fp".as("fpa"), ($"id" % 2).as("ga"))
      val b = df.select($"id".as("idb"), $"fp".as("fpb"), ($"id" % 2).as("gb"))
      // an equality conjunct → already an equi-join, no banding on top
      val equi = a.join(b, $"ga" === $"gb" &&
        bit_count($"fpa".bitwiseXOR($"fpb")) <= 2 && $"ida" < $"idb")
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      val want = (for {
        (i, x) <- fps; (j, y) <- fps
        if i < j && i % 2 == j % 2 && java.lang.Long.bitCount(x ^ y) <= 2
      } yield (i, j)).toSet
      assert(equi.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == want)
      // k too wide to prune (bands would be ≤ 1 bit) → untouched
      val wide = hammingJoin(40)
      assert(!wide.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      assert(wide.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expectedPairs(40))
    }
  }

  test("null fingerprints drop out, exactly as in the theta join") {
    withRule {
      val df = Seq((1L, java.lang.Long.valueOf(15L)), (2L, java.lang.Long.valueOf(14L)),
        (3L, null.asInstanceOf[java.lang.Long])).toDF("id", "fp")
      val a = df.select($"id".as("ida"), $"fp".as("fpa"))
      val b = df.select($"id".as("idb"), $"fp".as("fpb"))
      val joined = a.join(b, bit_count($"fpa".bitwiseXOR($"fpb")) <= 2 && $"ida" < $"idb")
        .select("ida", "idb")
      assert(joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    }
  }

  test("the engine's own banded operator result is unchanged under the rule") {
    // Defense in depth: registering the rule globally must not perturb
    // the dedup operators (their plans may or may not be rewritten, but
    // results are pinned).
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "completely different content about columnar storage engines"))
      .toDF("doc_id", "text")
    def run() = operators.Dedup.simHashPairsExact(docs, maxHamming = 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val bare = run()
    val ruled = withRule(run())
    assert(bare == ruled && ruled.contains((1L, 2L)))
  }
}
