package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RetrievalEval

/** Hand-computed fixtures for the retrieval-evaluation metrics, plus the
  * discrimination property on the real fixture queries (a real retriever
  * must beat the static null baseline — an eval harness that cannot
  * separate them measures nothing).
  */
class RetrievalEvalSpec extends AnyFunSuite with SparkTestSession {

  private def floor6(x: Double): Double = math.floor(x * 1e6) / 1e6

  test("evaluate: hand-computed metrics, missing-query row, rank>k ignored") {
    import spark.implicits._
    // q0: two relevant docs (1 graded 2, 2 graded 1); retrieved misses at
    // rank 1, hits doc1 at rank 2, and has a rank-3 row that k=2 must
    // ignore. q1 is labeled but the retriever returned nothing for it.
    val labels = Seq((0L, 1L, 2), (0L, 2L, 1), (1L, 5L, 1))
      .toDF("query_id", "doc_id", "rel")
    val retrieved = Seq((0L, 3L, 1), (0L, 1L, 2), (0L, 2L, 3))
      .toDF("query_id", "doc_id", "rank")
    val out = RetrievalEval.evaluate(retrieved, labels, k = 2)
      .orderBy("query_id").collect()
    assert(out.length === 2)
    val q0 = out(0)
    assert(q0.getAs[Long]("n_rel") === 2L)
    assert(q0.getAs[Long]("n_hits") === 1L)
    assert(q0.getAs[Double]("recall_at_k") === floor6(0.5))
    assert(q0.getAs[Double]("precision_at_k") === floor6(0.5))
    assert(q0.getAs[Double]("mrr") === floor6(0.5))
    // dcg = (2^2-1)/ln(2+1); idcg = (2^2-1)/ln(1+1) + (2^1-1)/ln(2+1)
    val dcg = 3.0 / math.log(3.0)
    val idcg = 3.0 / math.log(2.0) + 1.0 / math.log(3.0)
    assert(q0.getAs[Double]("ndcg_at_k") === floor6(dcg / idcg + 1e-9))
    val q1 = out(1)
    assert(q1.getAs[Long]("n_rel") === 1L)
    assert(q1.getAs[Long]("n_hits") === 0L)
    assert(q1.getAs[Double]("recall_at_k") === 0.0)
    assert(q1.getAs[Double]("mrr") === 0.0)
    assert(q1.getAs[Double]("ndcg_at_k") === 0.0)
  }

  test("evaluate: perfect retrieval scores 1.0 on every ratio metric") {
    import spark.implicits._
    val labels = Seq((0L, 1L, 3), (0L, 2L, 1)).toDF("query_id", "doc_id", "rel")
    val retrieved = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("query_id", "doc_id", "rank")
    val r = RetrievalEval.evaluate(retrieved, labels, k = 2).collect()(0)
    assert(r.getAs[Double]("recall_at_k") === 1.0)
    assert(r.getAs[Double]("precision_at_k") === 1.0)
    assert(r.getAs[Double]("mrr") === 1.0)
    // the +1e-9 guard must round the structural dcg==idcg case UP to 1,
    // never past it
    assert(r.getAs[Double]("ndcg_at_k") === 1.0)
  }

  test("evaluateWithMacro: macro row sums counts and averages metrics") {
    import spark.implicits._
    val labels = Seq((0L, 1L, 1), (1L, 1L, 1)).toDF("query_id", "doc_id", "rel")
    // q0 hits at rank 1 (all metrics 1), q1 misses (all metrics 0)
    val retrieved = Seq((0L, 1L, 1), (1L, 9L, 1)).toDF("query_id", "doc_id", "rank")
    val rows = RetrievalEval.evaluateWithMacro(retrieved, labels, k = 1)
      .orderBy("query_id").collect()
    assert(rows.length === 3)
    val m = rows(0) // query_id = -1
    assert(m.getAs[Long]("query_id") === -1L)
    assert(m.getAs[Long]("n_rel") === 2L)
    assert(m.getAs[Long]("n_hits") === 1L)
    assert(m.getAs[Double]("recall_at_k") === floor6(0.5 + 1e-9))
    assert(m.getAs[Double]("ndcg_at_k") === floor6(0.5 + 1e-9))
  }

  test("gradedTermOverlapLabels: rel counts DISTINCT overlapping terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark streams data"), // 2 distinct query terms (spark, data)
      (2L, "nothing relevant here"),
      (3L, "data")                      // 1 term
    ).toDF("doc_id", "text")
    val queries = Seq((0L, "spark data")).toDF("query_id", "qtext")
    val lbl = RetrievalEval.gradedTermOverlapLabels(docs, queries)
      .orderBy("doc_id").collect()
    assert(lbl.map(r => (r.getLong(1), r.getInt(2))).toSeq === Seq((1L, 2), (3L, 1)))
  }

  test("melted multi-retriever evaluation equals per-retriever evaluateWithMacro") {
    // The r19 single-pass path must reproduce the composed per-retriever
    // output row for row — including the GROUPING SETS macro rows and
    // the per-retriever cutoffs.
    import spark.implicits._
    val labels = Seq(
      (0L, 1L, 2), (0L, 2L, 1), (0L, 7L, 3),
      (1L, 5L, 1), (1L, 6L, 2),
      (2L, 9L, 1)).toDF("query_id", "doc_id", "rel")
    val sysA = Seq( // k = 2
      (0L, 1L, 1), (0L, 3L, 2),
      (1L, 6L, 1), (1L, 5L, 2),
      (2L, 4L, 1), (2L, 9L, 2)).toDF("query_id", "doc_id", "rank")
    val sysB = Seq( // k = 3, misses q2 entirely
      (0L, 7L, 1), (0L, 2L, 2), (0L, 1L, 3),
      (1L, 8L, 1), (1L, 9L, 2), (1L, 5L, 3)).toDF("query_id", "doc_id", "rank")
    val expected = Seq(
      ("a_k2", RetrievalEval.evaluateWithMacro(sysA, labels, 2)),
      ("b_k3", RetrievalEval.evaluateWithMacro(sysB, labels, 3)))
      .map { case (nm, df) => df.withColumn("retriever", lit(nm)) }
      .reduce(_ unionByName _)
      .select("retriever", "query_id", "n_rel", "n_hits",
        "recall_at_k", "precision_at_k", "mrr", "ndcg_at_k")
      .orderBy("retriever", "query_id")
      .collect().toSeq
    val melted = Seq(("a_k2", sysA), ("b_k3", sysB))
      .map { case (nm, df) =>
        df.select(lit(nm).as("retriever"), col("query_id"), col("doc_id"), col("rank"))
      }
      .reduce(_ unionByName _)
    val got = RetrievalEval
      .evaluateMeltedWithMacro(melted, labels, Seq("a_k2" -> 2, "b_k3" -> 3))
      .orderBy("retriever", "query_id")
      .collect().toSeq
    assert(got === expected)
  }

  test("fixture discrimination: bm25 macro beats the static baseline") {
    val name = "retrieval_eval"
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    val rows = df.filter(col("query_id") === -1L).collect()
      .map(r => r.getAs[String]("retriever") ->
        (r.getAs[Double]("ndcg_at_k"), r.getAs[Double]("recall_at_k")))
      .toMap
    assert(rows("bm25_k5")._1 > rows("static_k5")._1,
      s"bm25 ndcg must beat static baseline: $rows")
    assert(rows("bm25_k5")._2 >= rows("static_k5")._2)
  }
}
