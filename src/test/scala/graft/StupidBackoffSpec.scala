package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextRetrieval

/** Stupid Backoff trigram scoring against hand-computed values on a tiny
  * LM corpus, one document per backoff tier.
  *
  * LM corpus: "a b c a b d" → C(a)=2 C(b)=2 C(c)=1 C(d)=1, N=6;
  * bigrams ab×2 bc ca bd; trigrams abc bca cab abd.
  */
class StupidBackoffSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def floor4(v: Double): Double = math.floor(v * 10000) / 10000

  private lazy val lm = Seq((1L, "a b c a b d")).toDF("doc_id", "text")

  private def score(text: String): Option[(Double, Long)] = {
    val docs = Seq((10L, text)).toDF("doc_id", "text")
    TextRetrieval.stupidBackoffPerplexity(lm, docs)
      .select("perplexity", "n_trigrams").as[(Double, Long)]
      .collect().headOption
  }

  test("tier 1: seen trigram scores C(w1w2w3)/C(w1w2)") {
    // S(c|a b) = 1/2 -> perplexity exp(-ln 0.5) = 2.0
    assert(score("a b c").contains((2.0, 1L)))
  }

  test("tier 2: unseen trigram, seen bigram backs off with alpha") {
    // (c,b,d): C(c b)=0 -> alpha * C(b d)/C(b) = 0.4 * 1/2 = 0.2 -> 5.0
    assert(score("c b d").contains((5.0, 1L)))
  }

  test("tier 3: unseen bigram backs off to alpha^2 * C(w3)/N") {
    // (b,d,a): C(d a)=0 -> 0.4*0.4 * C(a)/N = 0.16 * 2/6
    val expected = floor4(math.exp(-math.log(0.4 * 0.4 * 2.0 / 6.0)))
    assert(score("b d a").contains((expected, 1L)))
  }

  test("tier 3 floor: unseen final word counts as 1, log stays finite") {
    // (d,c,q): q never seen -> 0.16 * 1/6
    val expected = floor4(math.exp(-math.log(0.4 * 0.4 * 1.0 / 6.0)))
    assert(score("d c q").contains((expected, 1L)))
  }

  test("documents with fewer than three tokens are absent") {
    assert(score("a b").isEmpty)
  }

  test("multi-trigram doc averages log scores") {
    // "a b c a": trigrams (a,b,c)=1/2 and (b,c,a)=C(bca)/C(bc)=1/1=1.0
    val expected = floor4(math.exp(-(math.log(0.5) + math.log(1.0)) / 2))
    assert(score("a b c a").contains((expected, 2L)))
  }
}
