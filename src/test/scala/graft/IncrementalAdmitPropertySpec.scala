package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Property cross-check for incremental admission: the distributed band
  * equi-joins (batch↔corpus, batch↔lower-id siblings) must produce
  * exactly the verdicts of a direct quadratic reference that compares
  * every batch doc against every possible blocker — randomized corpora
  * with deliberate duplicate injection so both blocking legs fire.
  */
class IncrementalAdmitPropertySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val vocab = Vector("spark", "sort", "merge", "join", "scan",
    "filter", "cache", "row", "batch", "key")

  private def textGen: Gen[String] = Gen.chooseNum(0, 12).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))

  private val caseGen: Gen[(Seq[(Long, String)], Seq[(Long, String)])] = for {
    nC <- Gen.chooseNum(1, 6)
    corpus <- Gen.sequence[Seq[String], String](Seq.fill(nC)(textGen))
    nB <- Gen.chooseNum(2, 6)
    fresh <- Gen.sequence[Seq[String], String](Seq.fill(nB)(textGen))
    // inject duplicates: copy a corpus text and an earlier batch text
    copyCorpus <- Gen.oneOf(corpus)
    batch = (fresh :+ copyCorpus) :+ fresh.head
  } yield (
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) },
    batch.zipWithIndex.map { case (t, i) => (100L + i, t) })

  private def reference(
      corpus: Seq[(Long, String)],
      batch: Seq[(Long, String)]): Map[Long, (Boolean, Long)] = {
    def sig(t: String) =
      TextAnalysis.minHashSignaturePortable(TextAnalysis.wordShingles(t, 3), 16)
    def bandsOf(s: Array[Long]) = (0 until 4).map(b => s.slice(4 * b, 4 * b + 4).toSeq)
    def blocks(a: Array[Long], b: Array[Long]): Boolean = {
      // same-position band equality (the LSH candidate condition), then
      // signature agreement >= threshold
      val shareBand = bandsOf(a).zip(bandsOf(b)).exists { case (x, y) => x == y }
      val agree = a.zip(b).count { case (x, y) => x == y }.toDouble / 16
      shareBand && agree >= 0.5
    }
    val cs = corpus.map { case (id, t) => (id, sig(t)) }
    val bs = batch.map { case (id, t) => (id, sig(t)) }
    bs.map { case (id, s) =>
      val blockers =
        cs.filter { case (_, o) => blocks(s, o) }.map(_._1) ++
          bs.filter { case (oid, o) => oid < id && blocks(s, o) }.map(_._1)
      id -> (if (blockers.isEmpty) (true, -1L) else (false, blockers.min))
    }.toMap
  }

  test("property: distributed admission matches the quadratic reference") {
    (1 to 40).foreach { seed =>
      val (corpus, batch) = caseGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val got = Dedup.incrementalAdmit(
        corpus.toDF("doc_id", "text"), batch.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("admitted"), r.getAs[Long]("blocked_by"))))
        .toMap
      val want = reference(corpus, batch)
      assert(got == want, s"seed=$seed corpus=$corpus batch=$batch\n got=$got\nwant=$want")
    }
  }
}
