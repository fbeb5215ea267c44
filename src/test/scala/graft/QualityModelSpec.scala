package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityModel

/** In-engine quality classifier (QualityModel): micro-quantized
  * logistic regression over hashed n-gram features, bit-equal to the
  * sequential reference, separating target-like from off-target text.
  */
class QualityModelSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val onTarget = Seq(
    "uno dos tres cuatro cinco seis", "dos tres uno cuatro seis siete",
    "tres cuatro uno dos cinco ocho", "cuatro cinco dos tres uno nueve")
  private val offTarget = Seq(
    "alpha beta gamma delta epsilon zeta", "beta gamma alpha delta zeta eta",
    "gamma delta alpha beta epsilon theta", "delta epsilon beta gamma alpha iota")

  private def df(texts: Seq[String], base: Long) =
    texts.zipWithIndex.map { case (t, i) => (base + i, t) }.toDF("doc_id", "text")

  private val B = 256

  test("distributed trainer equals the sequential reference bit for bit") {
    val tgt = df(onTarget, 100L)
    val raw = df(offTarget, 0L)
    val dist = QualityModel.train(tgt, raw, nBuckets = B, iters = 10, lr = 0.5)
    val ref = QualityModel.trainReference(
      QualityModel.collectExamples(tgt, raw, B), B, iters = 10, lr = 0.5)
    assert(dist == ref)
    // and again under different partitioning — exact integer aggregation
    // makes the result partition-order-free
    val dist2 = QualityModel.train(
      tgt.repartition(5), raw.repartition(3), nBuckets = B, iters = 10, lr = 0.5)
    assert(dist2 == ref)
  }

  test("trained model separates target-like from off-target documents") {
    val tgt = df(onTarget, 100L)
    val raw = df(offTarget, 0L)
    val w = QualityModel.train(tgt, raw, nBuckets = B, iters = 20, lr = 0.5)
    // score UNSEEN docs of each dialect
    val probe = df(Seq("cinco seis uno tres", "epsilon zeta alpha gamma"), 500L)
    val scores = QualityModel.score(probe, w, B)
      .as[(Long, Double)].collect().toMap
    assert(scores(500L) > scores(501L),
      s"target-dialect doc must outscore off-target ($scores)")
    assert(scores(500L) > 0.5 && scores(501L) < 0.5, s"scores: $scores")
  }

  test("scores are floored 6-dp probabilities; token-less docs drop like dsirWeights") {
    val tgt = df(onTarget, 100L)
    val raw = df(offTarget, 0L)
    val w = QualityModel.train(tgt, raw, nBuckets = B, iters = 5, lr = 0.5)
    val scores = QualityModel.score(df(Seq("uno dos", ""), 600L), w, B)
      .as[(Long, Double)].collect().toMap
    scores.values.foreach { s =>
      assert(s >= 0.0 && s <= 1.0)
      assert(s == math.floor(s * 1e6) / 1e6)
    }
    // token-less docs have no feature rows and drop from the score
    // frame — the same population rule dsirWeights documents
    assert(scores.keySet == Set(600L))
  }
}
