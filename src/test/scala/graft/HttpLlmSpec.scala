package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{HttpLlm, Rag, Retrieval}

/** Everything around the socket: payload construction, response
  * extraction, and fail-open degradation. The transport itself cannot be
  * exercised here (zero-egress sandbox — see README); the unroutable
  * endpoint below fails with immediate connection refusal, which is
  * exactly the path a production outage takes.
  */
class HttpLlmSpec extends AnyFunSuite {

  test("generateContent body escapes quotes, newlines and control chars") {
    val body = HttpLlm.generateBody("line1\nhe said \"hi\"\t\u0001", 0.7)
    assert(body.contains("""line1\nhe said \"hi\"\t""" + "\\u0001"))
    assert(body.contains(""""temperature": 0.7"""))
    // the body itself must be parseable JSON
    assert(HttpLlm.extractText(body).isEmpty) // wrong shape, but must not throw
  }

  test("extractText pulls candidates[0].content.parts[0].text and only that") {
    val ok =
      """{"candidates": [{"content": {"parts": [{"text": "hello"}], "role": "model"},
        |  "finishReason": "STOP"}], "usageMetadata": {"totalTokenCount": 5}}""".stripMargin
    assert(HttpLlm.extractText(ok).contains("hello"))
    assert(HttpLlm.extractText("""{"candidates": []}""").isEmpty)
    assert(HttpLlm.extractText("""{"error": {"code": 429}}""").isEmpty)
    assert(HttpLlm.extractText("not json at all").isEmpty)
    assert(HttpLlm.extractText("""{"candidates": [{"content": {"parts": [{"text": 42}]}}]}""").isEmpty)
  }

  test("extractEmbeddings pulls per-request value arrays, rejects shape drift") {
    val ok = """{"embeddings": [{"values": [0.5, -1.0]}, {"values": [0.25]}]}"""
    val out = HttpLlm.extractEmbeddings(ok).get
    assert(out.length == 2)
    assert(out(0).toSeq == Seq(0.5f, -1.0f) && out(1).toSeq == Seq(0.25f))
    assert(HttpLlm.extractEmbeddings("""{"embeddings": "nope"}""").isEmpty)
    assert(HttpLlm.extractEmbeddings("""{"embeddings": [{"values": 3}]}""").isEmpty)
  }

  test("prompts carry the T-8/T-9 contracts") {
    val r = HttpLlm.reformulatePrompt(Seq("signup", "click"), "what about it?")
    assert(r.contains("standalone") && r.contains("Do not answer"))
    assert(r.contains("signup\nclick") && r.contains("what about it?"))
    val a = HttpLlm.answerPrompt("ctx here", "q here")
    assert(a.contains("\"answer\"") && a.contains("\"emotion\""))
    assert(a.contains("ctx here") && a.contains("q here"))
  }

  test("unreachable endpoint fails open: question passthrough + parseable fallback") {
    // port 9 (discard) on localhost refuses immediately — no egress needed.
    val llm = HttpLlm("http://127.0.0.1:9", "test-model", "k", timeoutSeconds = 2)
    assert(llm.reformulate(Seq("h"), "original question") == "original question")
    val ans = llm.answer("some context", "q")
    assert(ans == HttpLlm.fallbackAnswer)
    assert(llm.embed(Seq("a", "b")).isEmpty)
  }

  test("fallback answer parses cleanly through the T-10 ladder") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val row = Seq(HttpLlm.fallbackAnswer).toDF("raw")
      .select(Retrieval.parseLlmResponse(col("raw")).as("p"))
      .select("p.answer", "p.emotion").collect().head
    assert(row.getString(0).contains("trouble processing"))
    assert(row.getString(1) == "neutral")
  }

  test("HttpLlm is serializable (ships to executors inside the pipeline UDFs)") {
    val llm: Rag.LlmClient = HttpLlm("http://example.invalid", "m", "k")
    val bytes = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bytes).writeObject(llm)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray)).readObject()
    assert(back.asInstanceOf[HttpLlm].model == "m")
  }
}
