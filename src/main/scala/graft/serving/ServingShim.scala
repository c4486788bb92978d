package graft.serving

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.model.{JobEvent, QueryRequest}
import graft.sources.Health
import graft.streaming.JobStream

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{Executors, TimeUnit}
import scala.collection.concurrent.TrieMap

/** Thin serving shim (NOTES round-5 candidate 2; VERDICT r3 "missing" #2):
  * the HTTP/SSE surface of the reference's REST layer, implemented with
  * the JDK's built-in `com.sun.net.httpserver` so the engine library
  * stays dependency-free. This is deliberately a SHIM, not a web
  * framework: request handling delegates to the engine's existing
  * surfaces — [[Health.check]]-shaped probes, a pluggable job runner
  * (normally [[JobStream.runJob]] / `runJobsBatched`), and
  * [[JobStream.cancel]] — and renders exactly the frames
  * [[JobStream.sseFrames]] renders from the events sink.
  *
  * Endpoints (reference: `jobs_controller.py:15-27`, `bus.py:17-30`,
  * `health.py:32-142`):
  *  - `GET  /health`            → 200/503 + status JSON;
  *  - `POST /jobs`              → 202 + `{"job_id": …}`; body is JSON
  *    with `query` (required), optional `job_id`, `top_k`, `repo_name`;
  *  - `GET  /jobs/<id>/events`  → `text/event-stream` replay of the
  *    job's trail (`data: {"event": …, "data": …}` frames), 404 when the
  *    job id was never submitted;
  *  - `DELETE /jobs/<id>`       → 202, marks the job cancelled
  *    (cooperative — [[JobStream]] short-circuits it).
  *
  * Scale posture: the shim is a front door, not a data path. Job
  * execution runs on a bounded pool sized like the reference worker's
  * `max_jobs` envelope (`worker.py:185`); SSE replay reads the
  * driver-side trail map, never Spark. A production deployment would put
  * N shims in front of the same events sink and serve `tailFrames` from
  * the parquet stream instead of memory — the frame format is identical
  * by construction (asserted in ServingShimSpec).
  */
class ServingShim(
    health: () => Health.Status,
    runJob: (String, QueryRequest) => Seq[JobEvent],
    port: Int = 0,
    maxJobs: Int = 10,
    sseTimeoutMs: Long = 10000) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool = Executors.newFixedThreadPool(maxJobs)
  /** jobId → completed event trail; present only once the job finished. */
  private val trails = TrieMap.empty[String, Seq[JobEvent]]
  /** every submitted job id (distinguishes "pending" from "unknown"). */
  private val submitted = TrieMap.empty[String, Boolean]
  private val seq = new java.util.concurrent.atomic.AtomicLong

  server.createContext("/health", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = guard(ex) {
      val st = health()
      val up = st.corpusUp && st.llmUp && st.embedderUp
      val counts = st.scopeCounts.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${ServingShim.quote(k)}: $v" }
        .mkString("{", ", ", "}")
      respond(ex, if (up) 200 else 503,
        s"""{"status": ${ServingShim.quote(if (up) "ok" else "degraded")}, """ +
          s""""corpus_up": ${st.corpusUp}, "llm_up": ${st.llmUp}, """ +
          s""""embedder_up": ${st.embedderUp}, "scope_counts": $counts, """ +
          s""""detail": ${ServingShim.quote(st.detail)}}""",
        "application/json")
    }
  })

  server.createContext("/jobs", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = guard(ex) {
      val path = ex.getRequestURI.getPath.stripSuffix("/")
      (ex.getRequestMethod, path) match {
        case ("POST", "/jobs") => submit(ex)
        case ("GET", ServingShim.EventsPath(id)) => streamEvents(ex, id)
        case ("DELETE", ServingShim.JobPath(id)) =>
          JobStream.cancel(id)
          respond(ex, 202, s"""{"job_id": ${ServingShim.quote(id)}, "cancelled": true}""",
            "application/json")
        case _ => respond(ex, 404, """{"error": "not found"}""", "application/json")
      }
    }
  })

  private def submit(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    ServingShim.jsonString(body, "query") match {
      case None =>
        respond(ex, 400, """{"error": "missing required field: query"}""",
          "application/json")
      case Some(q) =>
        val id = ServingShim.jsonString(body, "job_id")
          .getOrElse(s"job-${seq.incrementAndGet()}")
        val req = QueryRequest(q,
          topK = ServingShim.jsonInt(body, "top_k").getOrElse(5),
          repoName = ServingShim.jsonString(body, "repo_name"))
        submitted.put(id, true)
        pool.submit(new Runnable {
          override def run(): Unit =
            trails.put(id,
              try runJob(id, req)
              catch {
                case scala.util.control.NonFatal(e) => Seq(JobStream.event(
                  id, "error",
                  s"""{"message":${ServingShim.quote(String.valueOf(e.getMessage))}}"""))
              })
        })
        respond(ex, 202, s"""{"job_id": ${ServingShim.quote(id)}}""", "application/json")
    }
  }

  /** SSE replay: wait (bounded) for the trail, then emit one
    * [[JobStream.sseFrames]]-format frame per event and close. */
  private def streamEvents(ex: HttpExchange, id: String): Unit = {
    if (!submitted.contains(id)) {
      respond(ex, 404, """{"error": "unknown job"}""", "application/json")
      return
    }
    val deadline = System.nanoTime() + TimeUnit.MILLISECONDS.toNanos(sseTimeoutMs)
    while (!trails.contains(id) && System.nanoTime() < deadline)
      Thread.sleep(20)
    trails.get(id) match {
      case None =>
        respond(ex, 504, """{"error": "job still running"}""", "application/json")
      case Some(events) =>
        val frames = events.map(e =>
          s"""data: {"event": "${e.event}", "data": ${e.data}}\n\n""").mkString
        respond(ex, 200, frames, "text/event-stream")
    }
  }

  private def guard(ex: HttpExchange)(body: => Unit): Unit =
    try body
    catch {
      case scala.util.control.NonFatal(e) =>
        try respond(ex, 500,
          s"""{"error": ${ServingShim.quote(String.valueOf(e.getMessage))}}""",
          "application/json")
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ex.close()

  private def respond(ex: HttpExchange, code: Int, body: String,
      contentType: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", s"$contentType; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.getResponseBody.flush()
  }

  /** Start serving; returns the bound port (useful with port=0). */
  def start(): Int = {
    server.setExecutor(Executors.newFixedThreadPool(4))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow()
  }
}

object ServingShim {

  private val EventsPath = "/jobs/([^/]+)/events".r
  private val JobPath = "/jobs/([^/]+)".r

  /** JSON string escape — same recipe as [[JobStream]]'s `quote`. */
  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Minimal JSON field readers for the shim's flat request bodies — the
    * engine takes no JSON dependency, and the accepted documents are the
    * reference's flat `{"query": …, "top_k": …}` shapes. Nested objects
    * with a colliding key would confuse these; the request contract has
    * none. */
  def jsonString(body: String, key: String): Option[String] = {
    val m = ("\"" + java.util.regex.Pattern.quote(key) +
      "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r.findFirstMatchIn(body)
    m.map(g => unescape(g.group(1)))
  }

  def jsonInt(body: String, key: String): Option[Int] = {
    val m = ("\"" + java.util.regex.Pattern.quote(key) +
      "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(body)
    m.map(_.group(1).toInt)
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' if i + 5 < s.length + 1 && i + 6 <= s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
