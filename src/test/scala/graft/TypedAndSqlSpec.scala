package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.{Doc, LogRow}
import graft.operators.{Ingest, Typed}
import java.sql.Timestamp

class TypedSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("typed splitAndEmbed matches the DataFrame splitter") {
    val docs = Seq(
      Doc(1L, ("alpha beta " * 30).trim, "en", "s1", 300L),
      Doc(2L, "short", "en", "s2", 5L))
    val typed = Typed.splitAndEmbed(docs.toDS(), chunkSize = 100, overlap = 20)
      .collect().sortBy(c => (c.file_id, c.chunk_index))
    val untyped = Ingest.splitIntoChunks(
      docs.toDF(), chunkSize = 100, overlap = 20)
      .orderBy("file_id", "chunk_index").collect()
    assert(typed.length == untyped.length)
    typed.zip(untyped).foreach { case (t, u) =>
      assert(t.chunk_text == u.getAs[String]("chunk_text"))
      assert(t.total_chunks == u.getAs[Int]("total_chunks"))
    }
    assert(typed.forall(_.embedding.length == graft.functions.HashEmbedder.Dim))
  }

  test("typed messages and session stats") {
    val logs = Seq(
      LogRow(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "q1", 1.0, "a1"),
      LogRow(2L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "q2", 2.0, "a2")).toDS()
    val msgs = Typed.toMessages(logs).collect()
    assert(msgs.length == 4)
    assert(msgs.count(_.role == "human") == 2)
    val stats = Typed.sessionStats(logs).collect().head
    assert(stats.message_count == 2L)
    assert(stats.first_at == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(stats.last_at == Timestamp.valueOf("2024-01-01 11:00:00"))
  }
}

class SplitChunksSqlSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("split_chunks generator works in SQL LATERAL VIEW") {
    GraftExtensions.register(spark)
    Seq((1L, ("word " * 60).trim), (2L, "tiny")).toDF("doc_id", "text")
      .createOrReplaceTempView("split_input")
    val out = spark.sql(
      """SELECT doc_id, c.chunk_index, c.chunk_text
        |FROM split_input
        |LATERAL VIEW split_chunks(text, 100, 20) c AS chunk_index, chunk_text
        |ORDER BY doc_id, chunk_index""".stripMargin).collect()
    val doc1 = out.filter(_.getLong(0) == 1L)
    assert(doc1.length > 1)
    assert(doc1.map(_.getInt(1)).toSeq == doc1.indices.toSeq)
    assert(doc1.forall(_.getString(2).length <= 100))
    assert(out.count(_.getLong(0) == 2L) == 1)
    // generator output equals the library function
    val expected = graft.functions.TextSplit.splitText(("word " * 60).trim, 100, 20)
    assert(doc1.map(_.getString(2)).toSeq == expected)
  }
}
