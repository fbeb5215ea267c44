package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Distributed BPE tokenizer training (Bpe.learnMerges) against the
  * sequential reference rule, plus the greedy encode path.
  */
class BpeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("merge application is greedy left-to-right on overlapping runs") {
    assert(Bpe.mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergeOnce(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.mergeOnce(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(Bpe.mergeOnce(Seq("x"), "a", "b") == Seq("x"))
  }

  test("distributed learner equals the sequential reference, merge for merge") {
    val docs = corpus(
      "low lower lowest low low",
      "new newer newest new newer",
      "wide wider widest low new",
      "aaaa aaaa aa b aaaa")
    val dist = Bpe.learnMerges(docs, nMerges = 12)
    val wc = Bpe.wordCounts(docs).as[(String, Long)].collect().toSeq
    val ref = Bpe.learnMergesReference(wc, nMerges = 12)
    assert(dist == ref, s"\ndist=$dist\nref =$ref")
    assert(dist.nonEmpty)
  }

  test("count ties break lexicographically, same as the reference") {
    // "xy" and "pq" pairs appear with identical weighted counts; the
    // winner must be the lexicographically smaller pair on both paths
    val docs = corpus("xy xy pq pq")
    val dist = Bpe.learnMerges(docs, nMerges = 2)
    val wc = Bpe.wordCounts(docs).as[(String, Long)].collect().toSeq
    val ref = Bpe.learnMergesReference(wc, nMerges = 2)
    assert(dist == ref)
    assert(dist.head._1 == "p" && dist.head._2 == "q")
  }

  test("learner stops early when no pairs remain") {
    val docs = corpus("a b c d")
    val dist = Bpe.learnMerges(docs, nMerges = 5)
    assert(dist.isEmpty) // all words are single symbols
  }

  test("greedy encode replays merge ranks; stats match per-word reference") {
    val docs = corpus(
      "low lower lowest low low",
      "new newer newest new newer")
    val merges = Bpe.learnMerges(docs, nMerges = 10)
    val ranks = merges.map(m => (m._1, m._2)).zipWithIndex.toMap
    // encode of a training word is consistent with replaying training
    // merges on that word
    val wc = Bpe.wordCounts(docs).as[(String, Long)].collect().toSeq
    wc.foreach { case (w, _) =>
      var syms: Seq[String] = w.map(_.toString)
      merges.foreach { case (a, b, _) => syms = Bpe.mergeOnce(syms, a, b) }
      assert(Bpe.encodeWord(w, ranks) == syms,
        s"encode($w) != training replay: ${Bpe.encodeWord(w, ranks)} vs $syms")
      // subwords reassemble the word exactly
      assert(Bpe.encodeWord(w, ranks).mkString == w)
    }
    val stats = Bpe.encodeStats(docs, merges.map(m => (m._1, m._2)))
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(stats.length == 2)
    stats.foreach { case (_, nWords, nSub) =>
      assert(nWords == 5 && nSub >= nWords)
    }
    // doc 0's exact subword count from the reference encoder
    val doc0Words = "low lower lowest low low".split(" ").toSeq
    val expected0 = doc0Words.map(w => Bpe.encodeWord(w, ranks).length.toLong).sum
    assert(stats(0)._3 == expected0)
  }

  test("unseen words encode through learned subwords without loss") {
    val docs = corpus("low lower lowest", "new newer newest")
    val merges = Bpe.learnMerges(docs, nMerges = 8)
    val ranks = merges.map(m => (m._1, m._2)).zipWithIndex.toMap
    val enc = Bpe.encodeWord("lowend", ranks) // unseen word, shared prefix
    assert(enc.mkString == "lowend")
    assert(enc.length < "lowend".length || merges.isEmpty)
  }
}
