package graft

import graft.model.{JobEvent, QueryRequest}
import graft.serving.ServingShim
import graft.sources.Health
import graft.streaming.JobStream

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The JDK-only HTTP/SSE front door: endpoint behavior plus frame-format
  * parity with the engine's [[JobStream.sseFrames]] rendering. */
class ServingShimSpec extends SparkSpec {

  val healthyStatus = Health.Status(
    corpusUp = true, scopeCounts = Map("chunk" -> 7L, "repo" -> 2L),
    llmUp = true, embedderUp = true, detail = "all up")

  def trailFor(id: String, query: String): Seq[JobEvent] = Seq(
    JobStream.event(id, "started", s"""{"query":${ServingShim.quote(query)}}"""),
    JobStream.event(id, "retrieval", """{"attempts":1,"hits":3}"""),
    JobStream.event(id, "final", """{"answer":"done","sources":3}"""))

  def runner(id: String, req: QueryRequest): Seq[JobEvent] =
    trailFor(id, req.query)

  def withShim(health: () => Health.Status = () => healthyStatus)(
      body: (Int, HttpClient) => Unit): Unit = {
    val shim = new ServingShim(health, runner, sseTimeoutMs = 5000)
    val port = shim.start()
    try body(port, HttpClient.newHttpClient())
    finally shim.stop()
  }

  def get(c: HttpClient, port: Int, path: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET.build(),
      HttpResponse.BodyHandlers.ofString())

  def post(c: HttpClient, port: Int, path: String, body: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET /health: 200 when all probes pass, 503 when degraded") {
    withShim() { (port, c) =>
      val ok = get(c, port, "/health")
      assert(ok.statusCode() == 200)
      assert(ok.body().contains(""""status": "ok""""))
      assert(ok.body().contains(""""chunk": 7"""))
    }
    withShim(() => healthyStatus.copy(llmUp = false)) { (port, c) =>
      val bad = get(c, port, "/health")
      assert(bad.statusCode() == 503)
      assert(bad.body().contains(""""llm_up": false"""))
    }
  }

  test("POST /jobs → SSE events replay; frames match JobStream.sseFrames") {
    import spark.implicits._
    withShim() { (port, c) =>
      val r = post(c, port, "/jobs",
        """{"job_id": "sse-1", "query": "how does retry work?", "top_k": 3}""")
      assert(r.statusCode() == 202 && r.body().contains("\"sse-1\""))
      val ev = get(c, port, "/jobs/sse-1/events")
      assert(ev.statusCode() == 200)
      assert(ev.headers().firstValue("Content-Type").orElse("")
        .startsWith("text/event-stream"))
      // parity: rendering the same trail through the engine's batch
      // sseFrames must produce byte-identical frames
      val expected = JobStream.sseFrames(
        trailFor("sse-1", "how does retry work?").toDF(), "sse-1")
        .collect().map(_.getString(1)).mkString
      assert(ev.body() == expected, "HTTP frames diverge from sseFrames")
      assert(ev.body().linesIterator.count(_.startsWith("data: ")) == 3)
      assert(ev.body().contains(""""event": "final""""))
    }
  }

  test("POST /jobs without query → 400; unknown job events → 404") {
    withShim() { (port, c) =>
      assert(post(c, port, "/jobs", """{"top_k": 3}""").statusCode() == 400)
      assert(get(c, port, "/jobs/nope/events").statusCode() == 404)
    }
  }

  test("POST /jobs assigns ids when absent; DELETE marks cancelled") {
    withShim() { (port, c) =>
      val r = post(c, port, "/jobs", """{"query": "q"}""")
      assert(r.statusCode() == 202)
      val id = """"job_id": "([^"]+)"""".r.findFirstMatchIn(r.body()).get.group(1)
      assert(id.startsWith("job-"))
      try {
        val del = c.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/jobs/doomed"))
          .DELETE().build(), HttpResponse.BodyHandlers.ofString())
        assert(del.statusCode() == 202)
        assert(JobStream.isCancelled("doomed"), "DELETE must mark the job cancelled")
      } finally JobStream.clearCancel("doomed")
    }
  }

  test("request-body JSON readers handle escapes and reject absent keys") {
    assert(ServingShim.jsonString("""{"query": "a \"b\" \n c"}""", "query")
      .contains("a \"b\" \n c"))
    assert(ServingShim.jsonString("""{"q": "x"}""", "query").isEmpty)
    assert(ServingShim.jsonInt("""{"top_k": 12}""", "top_k").contains(12))
    assert(ServingShim.jsonInt("""{"top_k": "12"}""", "top_k").isEmpty)
  }
}
