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

  test("empty and null-safe") {
    val out = TextRetrieval.termFrequencies(Seq((0L, ""), (1L, "a a")).toDF("doc_id", "text"))
      .collect()
    assert(out.length == 1 && out.head.getAs[Long]("tf") == 2L)
  }
}
