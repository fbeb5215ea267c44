package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine's SQL surface: the flagship §3.1 read path and the custom
  * functions expressed entirely in `spark.sql`, proving a SQL-only user
  * of the engine gets the same results as the DataFrame API.
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  test("flagship history window in pure SQL equals the DataFrame form") {
    GraftExtensions.register(spark)
    Tables.events(spark, sfDir).createOrReplaceTempView("events_v")
    val sql = spark.sql(
      """SELECT user_id, event_id, role, content FROM (
        |  SELECT user_id, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |    event_type, props
        |  FROM events_v) t
        |LATERAL VIEW inline(array(
        |  named_struct('role', 'human', 'content', event_type),
        |  named_struct('role', 'ai', 'content', props))) m AS role, content
        |WHERE rn <= 10
        |ORDER BY user_id, ts, event_id, role DESC""".stripMargin).collect()
    val df = SparkEntry.entry(spark)
      .select("user_id", "event_id", "role", "content").collect()
    assert(sql.length == df.length)
    assert(sql.map(_.toSeq).toSeq == df.map(_.toSeq).toSeq)
  }

  test("retrieval top-k in pure SQL via cosine_sim matches knnJoin") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_v")
    val sql = spark.sql(
      """SELECT query_id, rank, vec_id FROM (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY cosine_sim(q.embedding, e.embedding) DESC, e.vec_id) AS rank
        |  FROM emb_v q CROSS JOIN emb_v e
        |  WHERE q.vec_id < 3) t
        |WHERE rank <= 2 ORDER BY query_id, rank""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
      .select(
        org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("q_embedding"))
    val df = operators.Retrieval.knnJoin(queries, emb, 2)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("vec_id"))).toSeq
    assert(sql == df)
  }

  test("text-analysis scalar functions are registered on the SQL surface") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_langid('the cat and the dog went to the market and the house') AS lang,
        |  graft_fingerprint_mod('hello world') AS fp,
        |  graft_simhash_mod('hello world hello') AS sh,
        |  size(graft_embed('spark engine')) AS dim""".stripMargin).collect().head
    assert(row.getAs[String]("lang") == "en")
    assert(row.getAs[Long]("fp") ==
      graft.functions.TextAnalysis.fingerprintMod("hello world"))
    assert(row.getAs[Long]("sh") ==
      graft.functions.TextAnalysis.simHashMod("hello world hello"))
    assert(row.getAs[Int]("dim") == graft.functions.HashEmbedder.Dim)
  }

  test("LSH signature is SQL-callable and matches the Scala kernel") {
    GraftExtensions.register(spark)
    val sig = spark.sql(
      "SELECT graft_lsh_signature(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 16) AS s")
      .collect().head.getAs[Int]("s")
    assert(sig == graft.operators.Dedup.portableSignature(Seq(0.5f, -0.25f), 16))
  }

  test("char_shingles is SQL-callable and matches the column form") {
    GraftExtensions.register(spark)
    val sql = spark.sql("SELECT char_shingles('abcab', 3) AS sh")
      .collect().head.getSeq[String](0)
    assert(sql == Seq("abc", "bca", "cab"))
    val viaCol = {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      Seq("abcab").toDF("t")
        .select(graft.functions.TextAnalysis.charShingles(col("t"), 3))
        .head().getSeq[String](0)
    }
    assert(sql == viaCol)
  }

  test("SQL builder misuse raises clean AnalysisExceptions, never opaque errors") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.AnalysisException
    // non-foldable width
    val e1 = intercept[AnalysisException] {
      spark.sql("SELECT char_shingles(text, doc_id) FROM VALUES (1, 'ab') t(doc_id, text)").collect()
    }
    assert(e1.getMessage.contains("char_shingles"))
    // BIGINT width outside Int range must NOT silently truncate
    // (4294967297.intValue == 1 would run with shingle width 1)
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT char_shingles('abc', 4294967297)").collect()
    }
    assert(e2.getMessage.contains("char_shingles"))
    // wrong arity
    val e3 = intercept[AnalysisException] {
      spark.sql("SELECT char_shingles('abc')").collect()
    }
    assert(e3.getMessage.contains("char_shingles"))
    // split_chunks: a string size argument
    val e4 = intercept[AnalysisException] {
      spark.sql("SELECT split_chunks('abc', 'big')").collect()
    }
    assert(e4.getMessage.contains("split_chunks"))
  }
}
