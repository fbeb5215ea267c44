package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.TextRetrieval

/** Property cross-check for the distributed bigram-LM perplexity: the
  * plan trains the LM via two hash aggregations and scores through
  * (w1, w2)/(w1) left joins — this spec pins it against a direct
  * in-memory bigram LM on randomized corpora, including LM-corpus ≠
  * scored-corpus splits so the unseen-bigram smoothing path (both join
  * legs null) is exercised, not just the self-scored diagonal.
  */
class PerplexityPropertySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val vocab = Vector("spark", "sort", "merge", "join", "scan",
    "filter", "cache", "row", "zzz", "qqq")

  private def docsGen(lo: Int, hi: Int): Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(lo, hi)
    docs <- Gen.sequence[Seq[Seq[String]], Seq[String]](
      Seq.fill(n)(Gen.chooseNum(0, 15).flatMap(m =>
        Gen.listOfN(m, Gen.oneOf(vocab)).map(_.toSeq))))
  } yield docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }

  private val caseGen: Gen[(Seq[(Long, String)], Seq[(Long, String)])] = for {
    lm <- docsGen(1, 8)
    scored <- docsGen(1, 6)
  } yield (lm, scored.map { case (i, t) => (100L + i, t) })

  private def reference(
      lm: Seq[(Long, String)],
      scored: Seq[(Long, String)],
      addK: Double): Map[Long, (Double, Long)] = {
    def toks(s: String) =
      s.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
    def bigrams(s: String) = { val t = toks(s); t.zip(t.drop(1)) }
    val uni = lm.flatMap(d => toks(d._2)).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val v = uni.size
    // token-less LM corpus: no model, no scores (mirrors the operator)
    if (v == 0) return Map.empty
    val bi = lm.flatMap(d => bigrams(d._2)).groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    scored.flatMap { case (id, t) =>
      val bgs = bigrams(t)
      if (bgs.isEmpty) None
      else {
        val logps = bgs.map { case (w1, w2) =>
          math.log((bi.getOrElse((w1, w2), 0L) + addK) /
            (uni.getOrElse(w1, 0L) + addK * v))
        }
        val ppl = math.exp(-logps.sum / logps.size)
        Some(id -> ((math.floor(ppl * 1e4) / 1e4, bgs.size.toLong)))
      }
    }.toMap
  }

  test("property: distributed perplexity matches a direct in-memory bigram LM") {
    (1 to 40).foreach { seed =>
      val (lm, scored) = caseGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val got = TextRetrieval.lmPerplexity(
        lm.toDF("doc_id", "text"), scored.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Double]("perplexity"), r.getAs[Long]("n_bigrams"))))
        .toMap
      val want = reference(lm, scored, addK = 0.5)
      assert(got.keySet == want.keySet,
        s"seed=$seed lm=$lm scored=$scored\n got=$got\nwant=$want")
      got.foreach { case (id, (p, n)) =>
        assert(n == want(id)._2, s"seed=$seed doc=$id bigram count")
        assert(math.abs(p - want(id)._1) <= 2e-4,
          s"seed=$seed doc=$id perplexity got=$p want=${want(id)._1}")
      }
    }
  }
}
