package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import scala.util.control.NonFatal

/** Production HTTP implementation of [[Rag.LlmClient]] plus a remote
  * embedding call — the network analog of the reference's
  * ChatGoogleGenerativeAI / GoogleGenerativeAIEmbeddings construction
  * (langchain_utils.py:224-230, chroma_utils.py:24-32), speaking the
  * public generateContent / batchEmbedContents JSON shapes.
  *
  * Defaults mirror the reference's operating envelope: 30 s timeout,
  * 1 retry, temperature 0.7 (config.py:38-40).
  *
  * TRANSPORT IS UNTESTED in this repo: the build/test sandbox has zero
  * network egress, so no spec exercises a live endpoint. Everything
  * around the socket IS tested ([[graft.HttpLlmSpec]]): request-body
  * construction (escaping), response extraction (pure functions on
  * canned payloads), and the fail-open behavior on connection failure
  * (reformulate degrades to the original question; answer degrades to a
  * valid JSON envelope so the T-10 parse ladder downstream never sees
  * malformed input — mirroring the reference's fallback-on-error paths,
  * main.py:280-300).
  *
  * Serialization: the case class ships plain config to executors; the
  * HttpClient itself is `@transient lazy`, rebuilt per executor JVM.
  * Used inside [[Rag.chatPipeline]]'s per-partition UDF boundary, calls
  * batch naturally per partition — request amortization and rate
  * limiting live executor-side, and the plan shape is identical to the
  * deterministic stub's.
  */
final case class HttpLlm(
    endpoint: String,
    model: String,
    apiKey: String,
    timeoutSeconds: Int = 30,
    maxRetries: Int = 1,
    temperature: Double = 0.7) extends Rag.LlmClient {

  import HttpLlm._

  @transient private lazy val http: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds.toLong))
      .build()

  override def reformulate(history: Seq[String], question: String): String =
    call(s"$endpoint/v1beta/models/$model:generateContent?key=$apiKey",
      generateBody(reformulatePrompt(history, question), temperature))
      .flatMap(extractText)
      .getOrElse(question) // fail-open: an unreformulated question still answers

  override def answer(context: String, question: String): String =
    call(s"$endpoint/v1beta/models/$model:generateContent?key=$apiKey",
      generateBody(answerPrompt(context, question), temperature))
      .flatMap(extractText)
      .getOrElse(fallbackAnswer)

  /** Remote batch embedding (chroma_utils.py:24-32 analog). Returns one
    * vector per input on success, None on any transport/shape failure —
    * callers choose their own degradation (the pipeline default is the
    * local [[graft.functions.HashEmbedder]]).
    */
  def embed(texts: Seq[String]): Option[Seq[Array[Float]]] =
    call(s"$endpoint/v1beta/models/$model:batchEmbedContents?key=$apiKey",
      embedBody(model, texts))
      .flatMap(extractEmbeddings)
      .filter(_.length == texts.length)

  private def call(uri: String, body: String): Option[String] = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri))
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds.toLong))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        body, java.nio.charset.StandardCharsets.UTF_8))
      .build()
    (0 to maxRetries).iterator.map { _ =>
      try {
        val resp = http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) Option(resp.body()) else None
      } catch { case NonFatal(_) => None }
    }.collectFirst { case Some(b) => b }
  }
}

object HttpLlm {
  // Shared read-only mapper: ObjectMapper is thread-safe after config.
  private val mapper = new ObjectMapper()

  /** Valid envelope for the downstream parse ladder when the model is
    * unreachable (reference degrades with an apology rather than a 500
    * on partial failures).
    */
  val fallbackAnswer: String =
    """{"answer": "I'm having trouble processing your request right now. Please try again.", "emotion": "neutral"}"""

  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** History-aware reformulation instruction (the T-8 contract:
    * standalone question out, never an answer — langchain_utils.py:16-27).
    */
  def reformulatePrompt(history: Seq[String], question: String): String = {
    val h = if (history.isEmpty) "(none)" else history.mkString("\n")
    "Rewrite the latest user question as a standalone question that needs " +
      "no chat history to understand. Do not answer it; if it is already " +
      s"standalone, return it unchanged.\n\nChat history:\n$h\n\nLatest question: $question"
  }

  /** Context-stuffed answering instruction demanding the JSON envelope
    * the T-10 ladder parses (langchain_utils.py:29-103 contract).
    */
  def answerPrompt(context: String, question: String): String =
    "You are a tutoring assistant. Answer ONLY from the context below. " +
      "Respond with a JSON object of exactly two keys: \"answer\" (your " +
      "explanation) and \"emotion\" (one of: happy, explaining, thinking, " +
      s"encouraging, neutral).\n\nContext:\n$context\n\nQuestion: $question"

  /** generateContent request body (public API shape; hand-rolled so the
    * escaping is the same audited code path as the rest of the repo).
    */
  def generateBody(prompt: String, temperature: Double): String =
    s"""{"contents": [{"parts": [{"text": "${jsonEscape(prompt)}"}]}], """ +
      s""""generationConfig": {"temperature": $temperature}}"""

  /** batchEmbedContents request body. */
  def embedBody(model: String, texts: Seq[String]): String =
    s"""{"requests": [""" + texts.map(t =>
      s"""{"model": "models/${jsonEscape(model)}", "content": {"parts": [{"text": "${jsonEscape(t)}"}]}}""")
      .mkString(", ") + "]}"

  /** candidates[0].content.parts[0].text, or None on any shape mismatch. */
  def extractText(json: String): Option[String] =
    try {
      val t = mapper.readTree(json)
        .path("candidates").path(0)
        .path("content").path("parts").path(0).path("text")
      if (t.isTextual) Some(t.asText()) else None
    } catch { case NonFatal(_) => None }

  /** embeddings[*].values as float arrays, or None on shape mismatch. */
  def extractEmbeddings(json: String): Option[Seq[Array[Float]]] =
    try {
      val arr = mapper.readTree(json).path("embeddings")
      if (!arr.isArray) None
      else {
        val out = (0 until arr.size()).map { i =>
          val values = arr.path(i).path("values")
          if (!values.isArray) return None
          Array.tabulate(values.size())(j => values.path(j).floatValue())
        }
        Some(out)
      }
    } catch { case NonFatal(_) => None }
}
