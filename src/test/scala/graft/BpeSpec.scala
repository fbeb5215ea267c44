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

  test("supplementary-plane text: reference and encoder split by code point") {
    // U+2070E (CJK Ext-B) is one code point = two UTF-16 chars and
    // matches \p{L}, so it survives tokensCol. The sequential reference
    // and the greedy encoder must see it as ONE symbol, agreeing with
    // Spark's code-point split — a UTF-16 map(_.toString) would halve
    // the surrogate pair and learn a phantom extra merge.
    val cjk = new String(Character.toChars(0x2070E))
    assert(Bpe.codePointSymbols(cjk + "ab") == Seq(cjk, "a", "b"))
    // three cjk in a row: (cjk,cjk) counts 2 per word vs (cjk,a) 1 —
    // strictly more frequent, so the first merge is unambiguous
    val word = cjk + cjk + cjk + "a"
    val docs = corpus(s"$word $word $word")
    val dist = Bpe.learnMerges(docs, nMerges = 4)
    val wc = Bpe.wordCounts(docs).as[(String, Long)].collect().toSeq
    val ref = Bpe.learnMergesReference(wc, nMerges = 4)
    assert(dist == ref, s"\ndist=$dist\nref =$ref")
    // first merge is the doubled code point, seen as a 2-symbol pair
    assert(dist.head._1 == cjk && dist.head._2 == cjk)
    val ranks = dist.map(m => (m._1, m._2)).zipWithIndex.toMap
    assert(Bpe.encodeWord(word, ranks).mkString == word)
  }

  test("incremental learner equals the reference across compaction boundaries") {
    // maxOverlayRows=10 forces an overlay→base compaction every few
    // merges over this vocab; the maintained pair table must stay
    // exactly equal to the reference's per-round recount through all of
    // them, including the resurrection case (a pair dropping to count 0,
    // then re-minted by a later merge).
    val docs = corpus(
      "the cat sat on the mat and the dog sat on the log",
      "lower lowest lowly low low lower slower slowest",
      "newer newest new news newer renew sinew",
      "aaaa aaab aabb abbb bbbb aaaa aaab",
      "mississippi mississippi missive permission omission")
    val dist = Bpe.learnMergesIncremental(docs, nMerges = 60, maxOverlayRows = 10)
    val wc = Bpe.wordCounts(docs).as[(String, Long)].collect().toSeq
    val ref = Bpe.learnMergesReference(wc, nMerges = 60)
    assert(dist.length == ref.length)
    dist.zip(ref).zipWithIndex.foreach { case ((d, r), i) =>
      assert(d == r, s"merge $i diverged: dist=$d ref=$r")
    }
    // and the recount fast path (what learnMerges dispatches to at this
    // vocab size) agrees with both
    assert(Bpe.learnMerges(docs, nMerges = 60) == ref)
  }

  test("learnMergesWithStats: touched-word counts are per-merge, not full-vocab") {
    val docs = corpus(
      "alpha beta gamma delta alpha beta",
      "epsilon zeta eta theta iota kappa",
      "alphabet alphabetical betting better")
    val (merges, stats) = Bpe.learnMergesWithStats(docs, nMerges = 8)
    assert(stats.length == merges.length)
    val vocabSize = Bpe.wordCounts(docs).count()
    // every merge touches at least one word, and merges quickly touch
    // strict subsets of the vocab — the property the incremental design
    // exists for
    assert(stats.forall(_.touchedWords >= 1))
    assert(stats.exists(_.touchedWords < vocabSize))
  }

  test("encodeCorpus emits token ids that decode back to the text's tokens") {
    val docs = corpus(
      "low lower lowest low low",
      "new newer newest new newer",
      "wide wider widest low new")
    val merges3 = Bpe.learnMerges(docs, nMerges = 10)
    val merges = merges3.map(m => (m._1, m._2))
    val ids = Bpe.vocabIds(Bpe.alphabet(docs), merges)
    val rev = ids.map(_.swap) // first-learned-wins keeps this invertible
    val ranks = merges.zipWithIndex.toMap
    val rows = Bpe.encodeCorpus(docs, merges, ids)
      .orderBy("doc_id")
      .select("doc_id", "token_ids", "n_tokens")
      .collect()
    assert(rows.length == 3)
    val texts = docs.orderBy("doc_id").select("text").as[String].collect()
    rows.zip(texts).foreach { case (r, text) =>
      val tokenIds = r.getSeq[Int](1)
      assert(r.getLong(2) == tokenIds.length.toLong)
      assert(tokenIds.forall(_ >= 0), s"UNK id in training-corpus encode: $tokenIds")
      // decoding the id stream reassembles exactly the tokenized text
      val decoded = tokenIds.map(rev).mkString
      val expected = text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).mkString
      assert(decoded == expected, s"decoded=$decoded expected=$expected")
      // and matches the per-word sequential encode, id for id
      val seqIds = text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
        .flatMap(w => Bpe.encodeWord(w, ranks).map(ids))
      assert(tokenIds == seqIds.toSeq)
    }
  }

  test("n_tokens of encodeCorpus equals encodeStats' n_subwords") {
    val docs = corpus(
      "low lower lowest low low",
      "new newer newest new newer")
    val merges3 = Bpe.learnMerges(docs, nMerges = 10)
    val merges = merges3.map(m => (m._1, m._2))
    val ids = Bpe.vocabIds(Bpe.alphabet(docs), merges)
    val nTok = Bpe.encodeCorpus(docs, merges, ids)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    val nSub = Bpe.encodeStats(docs, merges)
      .select("doc_id", "n_subwords").as[(Long, Long)].collect().toMap
    assert(nTok == nSub)
  }

  test("vocabIds: colliding merge products keep the first-learned id") {
    val ids = Bpe.vocabIds(Seq("a", "b", "c"),
      Seq(("a", "b"), ("ab", "c"), ("a", "bc"))) // both later merges → "abc"
    assert(ids("ab") == 3)
    assert(ids("abc") == 4) // from merge 1; merge 2's duplicate doesn't override
    assert(ids.size == 5)
  }

  test("writePackedTokens: shard files are loader-sequential and lossless") {
    val docs = corpus(
      "low lower lowest low low",
      "new newer newest new newer",
      "wide wider widest low new",
      "the cat sat on the mat",
      "aaaa aaab aabb abbb bbbb",
      "mississippi missive permission")
    val merges = Bpe.learnMerges(docs, nMerges = 8).map(m => (m._1, m._2))
    val ids = Bpe.vocabIds(Bpe.alphabet(docs), merges)
    val encoded = Bpe.encodeCorpus(docs, merges, ids).localCheckpoint()
    val budget = 12L
    val path = java.nio.file.Files.createTempDirectory("graft_packed").toString
    operators.Scale.writePackedTokens(encoded, budgetTokens = budget, shards = 2, path)
    // one data file per shard: the loader mounts one sequential stream
    for (sh <- 0 to 1) {
      val dir = new java.io.File(s"$path/shard=$sh")
      assert(dir.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"shard $sh not a single file")
      // file order IS loader order: replaying the rows as read must
      // reproduce each document's (bin, offset) from the running token
      // sum alone — the property that lets a loader assemble bins by
      // concatenation without any index
      val rows = spark.read.parquet(s"$path/shard=$sh")
        .select("bin_id", "offset", "doc_id", "n_tokens", "token_ids").collect()
      var cum = 0L
      rows.foreach { r =>
        assert(r.getLong(0) == cum / budget, s"bin mismatch at doc ${r.getLong(2)}")
        assert(r.getLong(1) == cum % budget, s"offset mismatch at doc ${r.getLong(2)}")
        assert(r.getLong(3) == r.getSeq[Int](4).length.toLong)
        cum += r.getLong(3)
      }
    }
    // lossless: the packed corpus carries exactly the encoded corpus
    val back = spark.read.parquet(path)
      .select("doc_id", "token_ids").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val orig = encoded.select("doc_id", "token_ids").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(back == orig)
  }

  test("pack by BPE token counts matches a sequential packing replay") {
    val docs = corpus(
      "low lower lowest low low",
      "new newer newest new newer",
      "wide wider widest low new",
      "the cat sat on the mat",
      "aaaa aaab aabb abbb bbbb")
    val merges3 = Bpe.learnMerges(docs, nMerges = 8)
    val merges = merges3.map(m => (m._1, m._2))
    val ids = Bpe.vocabIds(Bpe.alphabet(docs), merges)
    val encoded = Bpe.encodeCorpus(docs, merges, ids)
    val budget = 12L
    val got = operators.Scale
      .packSequencesBy(encoded, col("n_tokens"), budgetTokens = budget, shards = 2)
      .orderBy("shard", "bin_id")
      .select("shard", "bin_id", "n_docs", "total_tokens", "first_doc", "last_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // sequential replay: per shard in doc_id order, exclusive running sum
    val counts = encoded.select("doc_id", "n_tokens").as[(Long, Long)]
      .collect().sortBy(_._1)
    val bins = scala.collection.mutable.Map.empty[(Long, Long),
      (Long, Long, Long, Long)] // (shard,bin) -> (nDocs, total, first, last)
    val cum = scala.collection.mutable.Map.empty[Long, Long]
    counts.foreach { case (docId, n) =>
      val shard = docId % 2
      val before = cum.getOrElse(shard, 0L)
      val bin = before / budget
      val cur = bins.getOrElse((shard, bin), (0L, 0L, Long.MaxValue, Long.MinValue))
      bins((shard, bin)) =
        (cur._1 + 1, cur._2 + n, math.min(cur._3, docId), math.max(cur._4, docId))
      cum(shard) = before + n
    }
    val expected = bins.toSeq
      .map { case ((s, b), (nd, tt, f, l)) => (s, b, nd, tt, f, l) }
      .sortBy(t => (t._1, t._2))
    assert(got == expected)
  }
}
