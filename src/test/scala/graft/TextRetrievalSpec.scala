package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextRetrieval

class TextRetrievalSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark shuffles data across executors and spark caches data"),
    (1L, "ducks paddle across calm ponds at dawn"),
    (2L, "the catalyst optimizer rewrites spark plans"),
    (3L, "")).toDF("doc_id", "text")

  test("bm25: query terms retrieve the documents containing them, ranked") {
    val queries = Seq((10L, "spark data"), (11L, "ponds"), (12L, "zzz-no-hit"))
      .toDF("query_id", "qtext")
    val out = TextRetrieval.bm25TopK(docs, queries, k = 2).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    // doc 0 mentions spark twice + data twice -> must outrank doc 2
    val q10 = byQuery(10L).sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id")).toSeq
    assert(q10 == Seq(0L, 2L))
    assert(byQuery(11L).map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(!byQuery.contains(12L)) // no matching term -> no rows
    assert(out.forall(_.getAs[Double]("score") > 0.0))
  }

  test("bm25 length normalization: same tf, shorter doc scores higher") {
    val d = Seq(
      (0L, "needle haystack"),
      (1L, "needle " + Seq.fill(40)("filler").mkString(" "))).toDF("doc_id", "text")
    val q = Seq((0L, "needle")).toDF("query_id", "qtext")
    val out = TextRetrieval.bm25TopK(d, q, k = 2).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 1L))
  }

  test("tfidf: corpus-wide terms rank below distinctive terms") {
    val out = TextRetrieval.tfidfTopTerms(docs, k = 3)
      .filter(col("doc_id") === 1L).orderBy("rank").collect()
    // every doc-1 token is unique to doc 1 except "across" (also in doc 0):
    // the top-3 must all be unique terms, never "across"
    assert(out.length == 3)
    assert(!out.map(_.getAs[String]("term")).contains("across"))
  }

  test("top n-grams: counts and deterministic tie-break") {
    val out = TextRetrieval.topNgrams(docs, n = 2, k = 3).collect()
    // "spark" bigrams: doc0 has "and spark", "spark shuffles", "spark caches",
    // "data across", ... all count 1 except none repeat; tie-break is
    // alphabetical on the gram
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("n_occurrences")).toSeq.sorted.reverse ==
      out.map(_.getAs[Long]("n_occurrences")).toSeq)
    val grams = out.map(_.getAs[String]("gram")).toSeq
    assert(grams == grams.sortBy(g => (-out(grams.indexOf(g)).getAs[Long]("n_occurrences"), g)))
  }

  test("tfidf from a materialized tf table equals the convenience form") {
    import org.apache.spark.sql.functions.{count, lit}
    val tf = TextRetrieval.termFrequencies(docs)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val direct = TextRetrieval.tfidfTopTerms(docs, k = 3)
      .orderBy("doc_id", "rank").collect().toSeq
    val fromStats = TextRetrieval.tfidfTopTermsFromStats(tf, n, k = 3)
      .orderBy("doc_id", "rank").collect().toSeq
    assert(fromStats == direct)
  }

  test("lm perplexity: in-distribution text scores lower than rare-word text") {
    // LM corpus repeats "the cat sat" heavily; a doc made of those bigrams
    // must score lower perplexity than one of corpus-rare words.
    val lm = Seq.tabulate(8)(i => (100L + i, "the cat sat on the mat")).toDF("doc_id", "text")
      .union(Seq((200L, "zebra quark bassoon glacier")).toDF("doc_id", "text"))
    val scoreMe = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "zebra glacier bassoon quark"),
      (2L, "solo")).toDF("doc_id", "text") // 1 token -> no bigrams -> no row
    val out = TextRetrieval.lmPerplexity(lm, scoreMe).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("perplexity")).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L) < out(1L),
      s"in-distribution doc must score lower perplexity: $out")
    assert(out.values.forall(_ > 0.0))
  }

  test("lm perplexity: unseen bigrams smooth instead of dropping, counts are per-occurrence") {
    val lm = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    // "beta alpha" never occurs in the LM corpus; the doc must still score.
    val out = TextRetrieval.lmPerplexity(lm, Seq((7L, "beta alpha beta alpha"))
      .toDF("doc_id", "text")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_bigrams") == 3L) // occurrences, not distinct
    assert(out.head.getAs[Double]("perplexity") > 0.0)
  }

  test("empty and null-safe") {
    val out = TextRetrieval.termFrequencies(Seq((0L, ""), (1L, "a a")).toDF("doc_id", "text"))
      .collect()
    assert(out.length == 1 && out.head.getAs[Long]("tf") == 2L)
  }

  test("hybrid RRF: both-channel docs outrank one-channel, exact contributions") {
    // doc 10: rank 1 in both channels; doc 20: lex-only rank 2;
    // doc 30: sem-only rank 2; doc 40: lex-only rank 3
    val lex = Seq((0L, 10L, 1), (0L, 20L, 2), (0L, 40L, 3))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq((0L, 10L, 1), (0L, 30L, 2))
      .toDF("query_id", "doc_id", "rank")
    val out = TextRetrieval.hybridTopK(lex, sem, k = 10, rrfK = 60)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 20L, 30L, 40L))
    // doc 10: 2/61; docs 20 and 30: both 1/62 — tie broken by doc_id
    assert(math.abs(out(0).getAs[Double]("rrf") - 2.0 / 61.0) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("rrf") - 1.0 / 62.0) < 1e-12)
    assert(out(1).getAs[Double]("rrf") == out(2).getAs[Double]("rrf"))
    // one-channel docs carry a null rank for the missing channel
    assert(out(2).isNullAt(out(2).fieldIndex("lex_rank")))
    assert(out(1).isNullAt(out(1).fieldIndex("sem_rank")))
  }
}
