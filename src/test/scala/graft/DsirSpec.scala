package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Scale

/** DSIR importance resampling (Scale.dsirWeights / dsirSelect): hashed
  * unigram+bigram models of a target vs raw corpus, per-doc log-ratio
  * weights, deterministic Gumbel top-k resampling.
  */
class DsirSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // Two separable "dialects": the raw pool mixes them, the target is
  // pure dialect B — DSIR must weight raw B-docs above raw A-docs.
  private val dialectA = Seq(
    "alpha beta gamma delta epsilon zeta", "beta gamma alpha delta zeta",
    "gamma delta alpha beta epsilon", "delta epsilon beta gamma alpha")
  private val dialectB = Seq(
    "uno dos tres cuatro cinco seis", "dos tres uno cuatro seis",
    "tres cuatro uno dos cinco", "cuatro cinco dos tres uno")

  private def raw = (dialectA ++ dialectB).zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  private def target = Seq(
    (100L, "uno dos tres cuatro"), (101L, "cinco seis uno dos"),
    (102L, "tres uno cuatro cinco"))
    .toDF("doc_id", "text")

  private def weightsOf(portable: Boolean): Map[Long, Double] =
    Scale.dsirWeights(raw, target, nBuckets = 256, portable = portable)
      .as[(Long, Double)].collect().toMap

  test("target-dialect docs outweigh off-target docs (both hash paths)") {
    for (portable <- Seq(false, true)) {
      val w = weightsOf(portable)
      assert(w.size == 8)
      val aMax = (0L to 3L).map(w).max
      val bMin = (4L to 7L).map(w).min
      assert(bMin > aMax, s"portable=$portable: B-docs must all outrank A-docs ($w)")
      assert(aMax < 0,
        s"portable=$portable: docs of terms absent from the target score negative ($w)")
    }
  }

  test("weights are invariant under repartitioning") {
    val once = weightsOf(portable = true)
    val again = Scale.dsirWeights(
      raw.repartition(7), target.repartition(3), nBuckets = 256, portable = true)
      .as[(Long, Double)].collect().toMap
    assert(once == again)
  }

  test("select draws k distinct raw docs, deterministically, mostly on-target") {
    val sel = Scale.dsirSelect(raw, target, k = 4, nBuckets = 256, seed = 7L,
      portable = true)
      .select("doc_id").as[Long].collect()
    assert(sel.length == 4 && sel.distinct.length == 4)
    assert(sel.toSet.subsetOf((0L to 7L).toSet))
    // weights here are strongly separated, so the softmax sample is
    // dominated by dialect B
    assert(sel.count(_ >= 4L) >= 3, s"expected mostly B-docs, got ${sel.toSeq}")
    val again = Scale.dsirSelect(raw, target, k = 4, nBuckets = 256, seed = 7L,
      portable = true).select("doc_id").as[Long].collect()
    assert(sel.toSeq == again.toSeq)
    // a different seed is a different draw of the same distribution —
    // still k rows from the pool
    val other = Scale.dsirSelect(raw, target, k = 4, nBuckets = 256, seed = 99L,
      portable = true).select("doc_id").as[Long].collect()
    assert(other.length == 4 && other.toSet.subsetOf((0L to 7L).toSet))
  }

  test("token-less docs drop from the weight frame; bigrams carry signal") {
    val rawPlus = raw.unionAll(Seq((8L, "   "), (9L, "")).toDF("doc_id", "text"))
    val w = Scale.dsirWeights(rawPlus, target, nBuckets = 256, portable = true)
      .as[(Long, Double)].collect().toMap
    assert(!w.contains(8L) && !w.contains(9L))
    // bigram features: two docs with identical unigram bags but different
    // adjacency differ in weight when the target fixes the adjacency
    val rawBi = Seq((0L, "uno dos uno dos"), (1L, "dos uno dos uno"),
      (2L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val tgtBi = Seq((100L, "uno dos uno dos uno dos")).toDF("doc_id", "text")
    val wb = Scale.dsirWeights(rawBi, tgtBi, nBuckets = 256, portable = true)
      .as[(Long, Double)].collect().toMap
    assert(wb(0L) > wb(1L),
      s"doc matching the target's bigram adjacency must outrank the reversed one ($wb)")
  }
}
