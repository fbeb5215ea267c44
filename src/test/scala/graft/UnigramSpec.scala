package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Unigram

/** Unigram-LM (SentencePiece-style) trainer: per-word lattice math,
  * EM behavior, pruning invariants, the distributed == sequential
  * reference equality, and the Viterbi encode round trip.
  */
class UnigramSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def fixtureDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown cat naps under the warm sun"),
    (3L, "a lazy dog and a quick fox walk the long road"),
    (4L, "suns warm the brown road where the dogs nap"),
    (5L, "quickly the foxes jump over lazy brown dogs")
  ).toDF("doc_id", "text")

  test("viterbi is the max over all enumerated segmentations") {
    // brute-force enumerate every segmentation of short words and check
    // the lattice picks the argmax score
    val logp = Map("a" -> -2.0, "b" -> -2.5, "ab" -> -1.2, "ba" -> -3.0,
      "aba" -> -2.9, "bab" -> -5.0)
    def allSegs(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to s.length).flatMap { k =>
        val (h, t) = s.splitAt(k)
        if (logp.contains(h)) allSegs(t).map(h +: _) else Nil
      }
    Seq("ab", "aba", "abab", "babab", "aaabbb").foreach { w =>
      val segs = allSegs(w)
      val got = Unigram.viterbi(w, logp, maxLen = 3)
      if (segs.isEmpty) assert(got.isEmpty, w)
      else {
        val bestScore = segs.map(_.map(logp).sum).max
        assert(got.nonEmpty && math.abs(got.map(logp).sum - bestScore) < 1e-12,
          s"$w: viterbi ${got.mkString("+")} not optimal")
      }
    }
  }

  test("wordExpectations posteriors sum to the word count per position") {
    // expected counts weighted by symbol span must cover each symbol
    // exactly once in expectation: sum over pieces of count*len == n*len(word)
    val logp = Map("a" -> -1.0, "b" -> -1.5, "ab" -> -1.1, "bb" -> -2.0)
    val (micros, ll) = Unigram.wordExpectations("abb", 1000L, logp, maxLen = 2)
    assert(ll < 0L)
    val weighted = micros.iterator.map { case (p, c) => c * Unigram.symbols(p).length }.sum
    // 3 symbols * 1000 * 1e6 micro, within rounding of one micro per edge
    assert(math.abs(weighted - 3L * 1000L * 1000000L) < 100L, s"weighted=$weighted")
  }

  test("distributed trainer equals the sequential reference exactly") {
    val docs = fixtureDocs
    val (dist, llDist) = Unigram.train(docs, targetVocab = 40, seedSize = 80,
      maxPieceLen = 3, emIters = 2, shrink = 0.75)
    val wcLocal = operators.Bpe.wordCounts(docs)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val (ref, llRef) = Unigram.trainReference(wcLocal, targetVocab = 40, seedSize = 80,
      maxPieceLen = 3, emIters = 2, shrink = 0.75)
    assert(dist.scoreMicros == ref.scoreMicros)
    assert(llDist == llRef)
    assert(dist.pieces.length <= 40)
  }

  test("EM log-likelihood trace is non-decreasing within each vocab round") {
    // likelihood may drop when pruning removes pieces between rounds;
    // within a round (fixed vocab) EM must not decrease it beyond
    // micro-quantization noise
    val (_, ll) = Unigram.train(fixtureDocs, targetVocab = 40, seedSize = 80,
      maxPieceLen = 3, emIters = 3, shrink = 0.75)
    ll.grouped(3).foreach { round =>
      round.sliding(2).foreach {
        case Seq(a, b) => assert(b >= a - 1000L, s"EM decreased: $a -> $b in $ll")
        case _         =>
      }
    }
  }

  test("model retains every corpus code point and encode has zero UNK") {
    val docs = fixtureDocs
    val (model, _) = Unigram.train(docs, targetVocab = 30, seedSize = 60,
      maxPieceLen = 3, emIters = 2)
    val alphabet = operators.Bpe.alphabet(docs).toSet
    val pieceSet = model.pieces.iterator.map(_._1).toSet
    assert(alphabet.subsetOf(pieceSet),
      s"missing code points: ${alphabet -- pieceSet}")
    val enc = Unigram.encodeCorpus(docs, model)
    val unk = enc.select(sum(size(filter(col("token_ids"), i => i < 0))))
      .head().getLong(0)
    assert(unk == 0L)
  }

  test("viterbi encode round-trips: pieces concatenate back to the words") {
    val docs = fixtureDocs
    val (model, _) = Unigram.train(docs, targetVocab = 30, seedSize = 60,
      maxPieceLen = 3, emIters = 2)
    val words = operators.Bpe.wordCounts(docs).collect().map(_.getString(0))
    words.foreach { w =>
      val segs = Unigram.viterbi(w, model.logp, model.maxLen)
      assert(segs.mkString == w, s"round trip failed for $w: $segs")
    }
  }

  test("pruning keeps singles and ranks multis by loss") {
    val model = Unigram.Model(IndexedSeq(
      ("a", -1.0), ("ab", -1.5), ("b", -1.2), ("ba", -1.4), ("bb", -2.0)))
    val losses = Map("ab" -> 500L, "ba" -> 900L, "bb" -> 100L)
    val pruned = Unigram.pruneSelect(model, losses, keep = 3)
    assert(pruned.pieces.map(_._1) == IndexedSeq("a", "b", "ba"))
  }

  test("vocab ids are score-ordered and deterministic") {
    val model = Unigram.Model(IndexedSeq(
      ("a", -1.0), ("ab", -0.5), ("b", -1.0)))
    val ids = Unigram.vocabIds(model)
    assert(ids("ab") == 0) // highest score
    assert(ids("a") == 1 && ids("b") == 2) // tie broken by piece asc
  }

  test("viterbiMicros: integer DP matches brute force; ties pick the longest edge") {
    // The SHIPPED encode semantics (and the generated DuckDB oracle's
    // recursive CTE) run on integer micro scores — brute-force
    // enumerate segmentations and check the DP picks the argmax, with
    // the documented tie-break: among equal-scoring segmentations the
    // first maximizer scanning start positions ascending wins, i.e. the
    // LONGEST piece into each position.
    val micros = Map("a" -> -2000000L, "b" -> -2500000L,
      "ab" -> -4500000L, // exact tie with a+b on "ab"
      "ba" -> -3000000L, "aba" -> -2900000L)
    def allSegs(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to s.length).flatMap { k =>
        val (h, t) = s.splitAt(k)
        if (micros.contains(h)) allSegs(t).map(h +: _) else Nil
      }
    Seq("ab", "aba", "abab", "babab", "aabba", "c").foreach { w =>
      val got = Unigram.viterbiMicros(w, micros, maxLen = 3)
      val segs = allSegs(w)
      if (segs.isEmpty) assert(got.isEmpty, w)
      else {
        val bestScore = segs.map(_.map(micros).sum).max
        assert(got.nonEmpty && got.map(micros).sum == bestScore,
          s"$w: viterbiMicros ${got.mkString("+")} not optimal")
      }
    }
    // the engineered tie: ["ab"] and ["a","b"] both score -4_500_000
    assert(Unigram.viterbiMicros("ab", micros, maxLen = 3) == Seq("ab"),
      "tie must resolve to the longest piece (first maximizer, start asc)")
  }

  test("encodeCorpus ids replay through viterbiMicros under the shipped micro table") {
    val docs = fixtureDocs
    val (model, _) = Unigram.train(docs, targetVocab = 30, seedSize = 60,
      maxPieceLen = 3, emIters = 2)
    val microMap = model.scoreMicros.toMap
    val ids = Unigram.vocabIds(model)
    val got = Unigram.encodeCorpus(docs, model)
      .select("doc_id", "token_ids").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val docWords = docs.select(col("doc_id"),
        operators.TextRetrieval.tokensCol(col("text")).as("toks"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    docWords.foreach { case (d, toks) =>
      val replay = toks.flatMap(w =>
        Unigram.viterbiMicros(w, microMap, model.maxLen).map(ids))
      assert(got(d) == replay, s"doc $d diverged from the micro-Viterbi replay")
    }
  }
}
