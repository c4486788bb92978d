package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import graft.llm.HttpLlm
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Production LLM client against a local in-process OpenAI-compatible
  * stub server (JDK HttpServer — fully offline). */
class HttpLlmSpec extends AnyFunSuite with BeforeAndAfterAll {

  var server: HttpServer = _
  var port: Int = _
  @volatile var lastBody: String = ""

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort
    server.createContext("/v1/chat/completions", exchange => {
      lastBody = new String(exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val reply =
        if (lastBody.contains("FAIL-ME")) {
          exchange.sendResponseHeaders(500, -1); exchange.close(); null
        } else {
          """{"id":"x","choices":[{"index":0,"message":{"role":"assistant",
            |"content":"<think>internal</think>Assistant: line one\nline two é"},
            |"finish_reason":"stop"}]}""".stripMargin
        }
      if (reply != null) {
        val bytes = reply.getBytes(StandardCharsets.UTF_8)
        exchange.getResponseHeaders.add("Content-Type", "application/json")
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      }
    })
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  test("complete: request shape, content extraction, P8 sanitize applied") {
    val llm = new HttpLlm(s"http://127.0.0.1:$port", "test-model",
      temperature = 0.4, maxTokens = 123)
    val out = llm.complete("Summarize: def f(): pass \"quoted\"")
    // sanitize stripped think block + role marker; unicode + newline decoded
    assert(out == "line one\nline two é")
    assert(lastBody.contains("\"model\":\"test-model\""))
    assert(lastBody.contains("\"max_tokens\":123"))
    assert(lastBody.contains("final answer only"), "system message present")
    assert(lastBody.contains("\\\"quoted\\\""), "user prompt JSON-escaped")
  }

  test("non-2xx surfaces as IOException") {
    val llm = new HttpLlm(s"http://127.0.0.1:$port", "m")
    intercept[java.io.IOException] { llm.complete("FAIL-ME please") }
  }

  test("HttpEmbedder: batch request, dim validation, ordered extraction") {
    server.createContext("/v1/embeddings", exchange => {
      val req = new String(exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val n = "\"input\":\\[".r.findFirstIn(req).map(_ =>
        req.count(_ == ',') + 1).getOrElse(1)
      // two inputs -> two 4-dim vectors
      val reply =
        """{"data":[{"index":0,"embedding":[0.1, 0.2, 0.3, 0.4]},""" +
          """{"index":1,"embedding":[1.0,2.0,3.0,4.0]}]}"""
      val bytes = reply.getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    val e = new graft.llm.HttpEmbedder(s"http://127.0.0.1:$port", "emb-model", dim = 4)
    val vecs = e.embedBatch(Seq("alpha", "beta"))
    assert(vecs.map(_.toSeq) == Seq(Seq(0.1f, 0.2f, 0.3f, 0.4f), Seq(1f, 2f, 3f, 4f)))
    // dim mismatch fails fast
    val bad = new graft.llm.HttpEmbedder(s"http://127.0.0.1:$port", "emb-model", dim = 8)
    intercept[java.io.IOException] { bad.embedBatch(Seq("x", "y")) }
  }

  test("content extraction handles escapes standalone") {
    val body = """{"choices":[{"message":{"content":"a\n\"b\"A"}}]}"""
    assert(HttpLlm.extractContent(body).contains("a\n\"b\"A"))
    assert(HttpLlm.extractContent("""{"nope": 1}""").isEmpty)
  }
}
