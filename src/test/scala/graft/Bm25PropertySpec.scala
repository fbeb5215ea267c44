package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.TextRetrieval

/** Property cross-check for the distributed BM25: the plan computes df
  * via a window over query-filtered postings and dl via a map-only token
  * count (TextRetrieval.bm25TopK's scale shape) — this spec pins that
  * against an independent, direct in-memory BM25 on randomized corpora.
  * Small vocabularies force heavy term sharing (df > 1, repeated terms,
  * duplicate docs) and queries mix present and absent terms, covering
  * the joins' edge semantics (OOV terms drop, token-less docs never
  * score, distinct query terms score once).
  */
class Bm25PropertySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val vocab = Vector("spark", "sort", "merge", "join", "scan",
    "filter", "cache", "row", "batch", "shuffle", "key", "value")

  private case class Case(
      docs: Seq[(Long, String)], queries: Seq[(Long, String)], k: Int)

  private val caseGen: Gen[Case] = for {
    nDocs <- Gen.chooseNum(2, 10)
    docs <- Gen.sequence[Seq[Seq[String]], Seq[String]](
      Seq.fill(nDocs)(Gen.chooseNum(0, 20).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)).map(_.toSeq))))
    nQ <- Gen.chooseNum(1, 3)
    qs <- Gen.sequence[Seq[Seq[String]], Seq[String]](
      Seq.fill(nQ)(Gen.chooseNum(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.frequency(
          8 -> Gen.oneOf(vocab), 2 -> Gen.const("zzz-absent"))).map(_.toSeq))))
    k <- Gen.chooseNum(1, 4)
  } yield Case(
    docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) },
    qs.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) },
    k)

  /** Direct single-machine BM25 with the same published formula —
    * shares no code with the Spark path.
    */
  private def reference(c: Case): Seq[(Long, Int, Long)] = {
    def toks(s: String) =
      s.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
    val tf = c.docs
      .flatMap { case (id, t) => toks(t).map(id -> _) }
      .groupBy(identity).map { case ((id, w), xs) => (id, w, xs.size.toLong) }
      .toSeq
    val dl = tf.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._3).sum }
    if (dl.isEmpty) return Seq.empty
    val n = dl.size
    val avgdl = dl.values.sum.toDouble / n
    val df = tf.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val (k1, b) = (1.25, 0.75)
    c.queries.flatMap { case (qid, qt) =>
      val terms = toks(qt).distinct.toSet
      tf.filter(r => terms(r._2))
        .groupBy(_._1)
        .map { case (docId, rows) =>
          val s = rows.map { case (_, w, f) =>
            val idf = math.log(1.0 + (n - df(w) + 0.5) / (df(w) + 0.5))
            idf * (f * (k1 + 1)) / (f + k1 * (1 - b + b * dl(docId) / avgdl))
          }.sum
          docId -> math.floor(s * 1e6) / 1e6
        }
        .toSeq.sortBy { case (d, s) => (-s, d) }
        .take(c.k).zipWithIndex
        .map { case ((d, _), i) => (qid, i + 1, d) }
    }
  }

  test("property: distributed BM25 matches a direct in-memory reference") {
    (1 to 60).foreach { seed =>
      val c = caseGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val got = TextRetrieval.bm25TopK(
        c.docs.toDF("doc_id", "text"), c.queries.toDF("query_id", "qtext"), c.k)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("doc_id")))
        .sortBy(t => (t._1, t._2))
      val want = reference(c).sortBy(t => (t._1, t._2))
      assert(got.toSeq == want,
        s"seed=$seed docs=${c.docs} queries=${c.queries} k=${c.k}\n got=${got.toSeq}\nwant=$want")
    }
  }
}
