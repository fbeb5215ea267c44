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

  // ------------------------------------------------------------ loopback
  // An in-process com.sun.net.httpserver stub gives the transport a REAL
  // socket with zero egress: request method/path/headers/bodies are
  // captured and asserted, responses are canned. This closes the
  // reference's live-LLM boundary (langchain_utils.py:224-230) as far as
  // this sandbox allows — only the remote endpoint itself stays untested.

  /** Runs `f` against a loopback server whose handler is `respond`
    * (status, body) per request; returns all captured (method, uri, body).
    */
  private def withLoopback(respond: Int => (Int, String))(
      f: String => Unit): Seq[(String, String, String)] = {
    val captured = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/", { exchange =>
      val body = new String(
        exchange.getRequestBody.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      val n = captured.synchronized {
        captured += ((exchange.getRequestMethod, exchange.getRequestURI.toString, body))
        captured.size
      }
      val (status, resp) = respond(n)
      val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      exchange.sendResponseHeaders(status, bytes.length.toLong)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
    captured.toSeq
  }

  test("loopback: reformulate POSTs the generateContent shape and extracts the reply") {
    val reply = """{"candidates": [{"content": {"parts": [{"text": "standalone q"}]}}]}"""
    val reqs = withLoopback(_ => (200, reply)) { ep =>
      val llm = HttpLlm(ep, "test-model", "secret-key", timeoutSeconds = 5)
      assert(llm.reformulate(Seq("hist1", "hist2"), "what about it?") == "standalone q")
    }
    assert(reqs.size == 1)
    val (method, uri, body) = reqs.head
    assert(method == "POST")
    assert(uri == "/v1beta/models/test-model:generateContent?key=secret-key")
    // the wire body is exactly the audited builder output for this prompt
    assert(body == HttpLlm.generateBody(
      HttpLlm.reformulatePrompt(Seq("hist1", "hist2"), "what about it?"), 0.7))
  }

  test("loopback: answer extracts text; non-200 then 200 retries to success") {
    val reply = """{"candidates": [{"content": {"parts": [{"text": "{\"answer\": \"A\", \"emotion\": \"happy\"}"}]}}]}"""
    val reqs = withLoopback(n => if (n == 1) (500, """{"error": {"code": 500}}""") else (200, reply)) { ep =>
      val llm = HttpLlm(ep, "m", "k", timeoutSeconds = 5, maxRetries = 1)
      assert(llm.answer("ctx", "q") == """{"answer": "A", "emotion": "happy"}""")
    }
    assert(reqs.size == 2, "a 500 must consume exactly one retry")
    assert(reqs.forall(_._3 == HttpLlm.generateBody(HttpLlm.answerPrompt("ctx", "q"), 0.7)))
  }

  test("loopback: embed round-trips batch bodies; a short response row fails closed") {
    val good = """{"embeddings": [{"values": [1.0, 2.0]}, {"values": [3.0, 4.0]}]}"""
    val reqs = withLoopback(_ => (200, good)) { ep =>
      val llm = HttpLlm(ep, "embed-model", "k", timeoutSeconds = 5)
      val out = llm.embed(Seq("alpha", "beta")).get
      assert(out.map(_.toSeq) == Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)))
      // 2 inputs but server returns 2 vectors for a 3-input call → None
      // (the _.length == texts.length gate, not an exception)
      assert(llm.embed(Seq("a", "b", "c")).isEmpty)
    }
    assert(reqs.head._2 == "/v1beta/models/embed-model:batchEmbedContents?key=k")
    assert(reqs.head._3 == HttpLlm.embedBody("embed-model", Seq("alpha", "beta")))
  }

  test("loopback: a server slower than the timeout fails open, not hangs") {
    val t0 = System.nanoTime()
    withLoopback { _ => Thread.sleep(4000); (200, "{}") } { ep =>
      val llm = HttpLlm(ep, "m", "k", timeoutSeconds = 1, maxRetries = 0)
      assert(llm.reformulate(Nil, "orig") == "orig")
      assert(llm.answer("c", "q") == HttpLlm.fallbackAnswer)
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed < 8, s"timeout fail-open took ${elapsed}s — request timeout not honored")
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
