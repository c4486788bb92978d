package graft.llm

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Production Llm implementation: OpenAI-compatible chat-completions
  * endpoint (the reference's vLLM client, `ingest/src/app/llm_init.py:99-143`
  * and `rag_worker/.../qwen_llm.py:104-148`):
  *
  *  - system message pinning "final answer only" behavior (llm_init.py:27-33)
  *  - temperature / max_tokens / 60 s timeout from the reference envelope
  *    (rag_shared/config.py:28-32, BASELINE.md)
  *  - bounded in-flight concurrency ≈ vLLM `max_num_seqs=4` via a semaphore,
  *    so an executor's mapPartitions batch cannot flood the server
  *  - response text routed through [[LlmSanitize.sanitizeResponse]] (P8)
  *
  * One instance per executor (constructed inside mapPartitions via a
  * transient lazy client); the class carries only plain config so it
  * serializes with the task closure.
  */
class HttpLlm(
    endpoint: String,
    model: String,
    temperature: Double = 0.4,
    maxTokens: Int = 2048,
    timeoutSeconds: Long = 60,
    maxInFlight: Int = 4,
    apiKey: Option[String] = None) extends Llm {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  @transient private lazy val gate = new java.util.concurrent.Semaphore(maxInFlight)

  private val SystemMessage =
    "You are a precise assistant. Reply with the final answer only - no " +
      "reasoning traces, no role prefixes, no markdown fences."

  override def complete(prompt: String): String = {
    val body = HttpLlm.chatRequestJson(model, SystemMessage, prompt, temperature, maxTokens)
    val builder = HttpRequest.newBuilder()
      .uri(URI.create(s"${endpoint.stripSuffix("/")}/v1/chat/completions"))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .header("Content-Type", "application/json")
    apiKey.foreach(k => builder.header("Authorization", s"Bearer $k"))
    val request = builder
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    gate.acquire()
    try {
      val response = client.send(request, HttpResponse.BodyHandlers.ofString())
      if (response.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"LLM endpoint returned ${response.statusCode()}: ${response.body().take(500)}")
      LlmSanitize.sanitizeResponse(
        HttpLlm.extractContent(response.body())
          .getOrElse(throw new java.io.IOException(
            s"no choices[0].message.content in: ${response.body().take(500)}")))
    } finally gate.release()
  }
}

/** Production Embedder: OpenAI-compatible `/v1/embeddings` endpoint
  * (TEI / vLLM / OpenAI all speak it). Batched — one request per
  * mapPartitions batch — with the same bounded-concurrency gate as
  * [[HttpLlm]]. Dimension is validated against the configured width so a
  * model/table mismatch (the reference's 384-vector tables) fails fast. */
class HttpEmbedder(
    endpoint: String,
    model: String,
    override val dim: Int = 384,
    timeoutSeconds: Long = 60,
    maxInFlight: Int = 4,
    apiKey: Option[String] = None) extends Embedder {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
  @transient private lazy val gate = new java.util.concurrent.Semaphore(maxInFlight)

  override def embed(text: String): Array[Float] = embedBatch(Seq(text)).head

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val body = HttpLlm.embeddingRequestJson(model, texts)
    val builder = HttpRequest.newBuilder()
      .uri(URI.create(s"${endpoint.stripSuffix("/")}/v1/embeddings"))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .header("Content-Type", "application/json")
    apiKey.foreach(k => builder.header("Authorization", s"Bearer $k"))
    val request = builder.POST(HttpRequest.BodyPublishers.ofString(body)).build()
    gate.acquire()
    try {
      val response = client.send(request, HttpResponse.BodyHandlers.ofString())
      if (response.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"embeddings endpoint returned ${response.statusCode()}: ${response.body().take(500)}")
      val vecs = HttpLlm.extractEmbeddings(response.body())
      if (vecs.length != texts.length)
        throw new java.io.IOException(
          s"expected ${texts.length} embeddings, got ${vecs.length}")
      vecs.foreach { v =>
        if (v.length != dim)
          throw new java.io.IOException(s"embedding dim ${v.length} != configured $dim")
      }
      vecs
    } finally gate.release()
  }
}

object HttpLlm {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private[graft] def chatRequestJson(
      model: String,
      system: String,
      user: String,
      temperature: Double,
      maxTokens: Int): String =
    s"""{"model":"${esc(model)}","temperature":$temperature,"max_tokens":$maxTokens,""" +
      s""""messages":[{"role":"system","content":"${esc(system)}"},""" +
      s"""{"role":"user","content":"${esc(user)}"}]}"""

  private[graft] def embeddingRequestJson(model: String, texts: Seq[String]): String =
    s"""{"model":"${esc(model)}","input":[${texts.map(t => "\"" + esc(t) + "\"").mkString(",")}]}"""

  /** Extract every `"embedding": [floats...]` array from a /v1/embeddings
    * response, in order (the API returns data[] sorted by index). */
  private[graft] def extractEmbeddings(body: String): Seq[Array[Float]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    var idx = body.indexOf("\"embedding\"")
    while (idx >= 0) {
      val open = body.indexOf('[', idx)
      val close = body.indexOf(']', open)
      if (open < 0 || close < 0) return out.toSeq
      val nums = body.substring(open + 1, close).split(",")
        .iterator.map(_.trim).filter(_.nonEmpty).map(_.toFloat).toArray
      out += nums
      idx = body.indexOf("\"embedding\"", close)
    }
    out.toSeq
  }

  /** Minimal choices[0].message.content extraction without a JSON dep:
    * find the "content" field inside the first "message" object and decode
    * the JSON string escapes. */
  private[graft] def extractContent(body: String): Option[String] = {
    val mIdx = body.indexOf("\"message\"")
    if (mIdx < 0) return None
    val cIdx = body.indexOf("\"content\"", mIdx)
    if (cIdx < 0) return None
    val colon = body.indexOf(':', cIdx + 9)
    val firstQuote = body.indexOf('"', colon + 1)
    if (colon < 0 || firstQuote < 0) return None
    val sb = new StringBuilder
    var i = firstQuote + 1
    var done = false
    while (i < body.length && !done) {
      body.charAt(i) match {
        case '\\' if i + 1 < body.length =>
          body.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '/' => sb.append('/'); i += 2
            case 'u' if i + 5 < body.length =>
              sb.append(Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case other => sb.append(other); i += 2
          }
        case '"' => done = true
        case c => sb.append(c); i += 1
      }
    }
    if (done) Some(sb.toString) else None
  }
}
