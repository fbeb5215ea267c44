package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Attributes

/** Attribute sidecar: first-failed attribution follows policy order, the
  * dup tagger keeps exactly the first doc_id per content, and a policy
  * change is a pure projection (same tagged frame, different decision).
  */
class AttributesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("first_failed names the FIRST failing rule in declaration order") {
    val attrs = Seq(
      (1L, true, true), // passes all
      (2L, false, false), // fails both -> attributed to the first
      (3L, true, false) // fails only the second
    ).toDF("doc_id", "a_ok", "b_ok")
    val out = Attributes.decide(attrs, Seq("a" -> col("a_ok"), "b" -> col("b_ok")))
      .orderBy("doc_id")
      .select("doc_id", "first_failed", "keep")
      .as[(Long, String, Boolean)].collect()
    assert(out.toSeq == Seq((1L, "none", true), (2L, "a", false), (3L, "b", false)))
  }

  test("re-deciding with a reordered policy re-attributes without retagging") {
    val attrs = Seq((2L, false, false)).toDF("doc_id", "a_ok", "b_ok")
    val ba = Attributes.decide(attrs, Seq("b" -> col("b_ok"), "a" -> col("a_ok")))
    assert(ba.select("first_failed").as[String].head() == "b")
  }

  test("tag flags every copy after the first doc_id as exact dup") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and it is fine", "en"),
      (11L, "the quick brown fox jumps over the lazy dog and it is fine", "en"),
      (12L, "an entirely different document that is about other things", "en"))
      .toDF("doc_id", "text", "lang")
    val t = Attributes.tag(docs, minTokens = 3)
    val dups = t.filter(col("is_exact_dup")).select("doc_id").as[Long].collect()
    assert(dups.toSeq == Seq(11L))
    assert(t.count() == 3)
  }
}
