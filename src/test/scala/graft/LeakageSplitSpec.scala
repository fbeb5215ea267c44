package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Leakage-safe split: duplicate twins always co-travel, singletons split
  * by their own id, transitive chains follow one label, and weights shape
  * the assignment.
  */
class LeakageSplitSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("all members of a duplicate chain land in one split") {
    val docs = spark.range(100).select(col("id").as("doc_id"))
    // chain 1-2-3 (transitive via shared middle), pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Scale.leakageSafeSplit(docs, pairs,
      Seq("train" -> 0.5, "test" -> 0.5))
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(Set(out(1L), out(2L), out(3L)).size == 1, "chain split apart")
    assert(out(1L)._1 == 1L)
    assert(out(10L) == out(11L))
    // singleton defaults to its own id
    assert(out(50L)._1 == 50L)
    // no cluster straddles
    val bySplit = out.values.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(bySplit.values.forall(_.size == 1))
  }

  test("weights move mass between splits deterministically") {
    val docs = spark.range(1000).select(col("id").as("doc_id"))
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    def sizes(w: Seq[(String, Double)]): Map[String, Long] =
      Scale.leakageSafeSplit(docs, pairs, w)
        .groupBy("split").count()
        .as[(String, Long)].collect().toMap
    val s1 = sizes(Seq("train" -> 0.8, "test" -> 0.2))
    assert(s1("train") + s1("test") == 1000)
    assert(s1("train") > 700 && s1("train") < 900, s1.toString)
    // same seed, same weights -> identical assignment (determinism)
    assert(sizes(Seq("train" -> 0.8, "test" -> 0.2)) == s1)
    val s2 = sizes(Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2))
    assert(s2.values.sum == 1000 && s2.keySet == Set("train", "val", "test"))
    assert(s2("train") < s1("train"))
  }
}
