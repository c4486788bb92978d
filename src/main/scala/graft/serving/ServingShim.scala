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
  *  - `GET  /jobs/<id>/events`  → `text/event-stream` PUSH stream of the
  *    job's trail (`data: {"event": …, "data": …}` frames, chunked
  *    transfer): frames are written as the runner emits them — `started`
  *    arrives while the job is still executing — and the stream closes
  *    once the trail completes. 404 when the job id was never submitted;
  *  - `DELETE /jobs/<id>`       → 202, marks the job cancelled
  *    (cooperative — [[JobStream]] short-circuits it).
  *
  * Scale posture: the shim is a front door, not a data path. Job
  * execution runs on a bounded pool sized like the reference worker's
  * `max_jobs` envelope (`worker.py:185`); the SSE stream reads the
  * driver-side trail queue, never Spark. A production deployment would
  * put N shims in front of the same events sink and serve `tailFrames`
  * from the parquet stream instead of memory — the frame format is
  * identical by construction (asserted in ServingShimSpec).
  */
class ServingShim(
    health: () => Health.Status,
    runJob: (String, QueryRequest, JobEvent => Unit) => Unit,
    port: Int = 0,
    maxJobs: Int = 10,
    sseTimeoutMs: Long = 10000,
    metrics: () => Seq[graft.ingest.StageMetric] = () => Nil,
    search: Option[(String, Int) => Seq[ServingShim.SearchHit]] = None,
    page: Option[(String, Int) => ServingShim.SearchPage] = None,
    neardup: Option[String => Seq[(Long, Double)]] = None,
    fingerprintMatch: Option[String => Seq[(Long, Long, Double)]] = None,
    vsearch: Option[(Either[String, Array[Float]], Int) => Seq[(Long, Double)]] = None,
    audiomatch: Option[Array[Byte] => Seq[(Long, Long)]] = None) {

  /** One job's live trail: events append as the runner emits them;
    * `done` flips after the last one. Append-only so any number of
    * subscribers — including ones attaching after completion — replay
    * the full trail (each keeps its own cursor). */
  private final class Trail {
    val events = new java.util.concurrent.CopyOnWriteArrayList[JobEvent]
    @volatile var done = false
  }

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool = Executors.newFixedThreadPool(maxJobs)
  private val trails = TrieMap.empty[String, Trail]
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

  // GET /metrics — Prometheus text exposition (version 0.0.4) of the
  // ingest stage gauges: the PULL half of the reference's pushgateway
  // metrics (ingest_controller.py:82-152); a scraper pointed here sees
  // the same per-stage series the reference pushes.
  server.createContext("/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = guard(ex) {
      if (ex.getRequestMethod != "GET")
        respond(ex, 405, """{"error": "method not allowed"}""", "application/json")
      else respond(ex, 200, ServingShim.prometheusText(metrics()),
        "text/plain; version=0.0.4")
    }
  })

  // GET /search?q=<terms>&k=<n> — synchronous keyword retrieval, the
  // query-service front of the stored-index path
  // (SearchQueries.searchStored wired in by the deployment). Absent
  // wiring → 404, so job-only shims don't grow a dead endpoint.
  server.createContext("/search", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = guard(ex) {
      (ex.getRequestMethod, search) match {
        case ("GET", Some(fn)) =>
          val params = ServingShim.queryParams(ex.getRequestURI.getRawQuery)
          params.get("q").filter(_.trim.nonEmpty) match {
            case None =>
              respond(ex, 400, """{"error": "missing q"}""", "application/json")
            case Some(q) =>
              val k = params.get("k").flatMap(_.toIntOption)
                .filter(x => x > 0 && x <= 100).getOrElse(5)
              // full=1 + a wired page fn → the assembled SERP (snippeted
              // hits + facets); otherwise the plain ranked-hit list
              (params.get("full").contains("1"), page) match {
                case (true, Some(pfn)) =>
                  val p = pfn(q, k)
                  val hits = p.hits.map { h =>
                    s"""{"rank": ${h.rank}, "doc_id": ${h.docId}, "score": ${ServingShim.jsonNum(h.score)}, "snippet": ${ServingShim.quote(h.snippet)}}"""
                  }.mkString("[", ", ", "]")
                  val facets = p.facets.map { f =>
                    s"""{"facet": ${ServingShim.quote(f.facet)}, "value": ${ServingShim.quote(f.value)}, "n_docs": ${f.nDocs}}"""
                  }.mkString("[", ", ", "]")
                  respond(ex, 200,
                    s"""{"query": ${ServingShim.quote(q)}, "k": $k, "hits": $hits, "facets": $facets}""",
                    "application/json")
                case _ =>
                  val hits = fn(q, k).map { h =>
                    s"""{"rank": ${h.rank}, "doc_id": ${h.docId}, "score": ${ServingShim.jsonNum(h.score)}}"""
                  }.mkString("[", ", ", "]")
                  respond(ex, 200,
                    s"""{"query": ${ServingShim.quote(q)}, "k": $k, "hits": $hits}""",
                    "application/json")
              }
          }
        case ("GET", None) =>
          respond(ex, 404, """{"error": "search not configured"}""", "application/json")
        case _ =>
          respond(ex, 405, """{"error": "method not allowed"}""", "application/json")
      }
    }
  })

  // POST /neardup {"text": ...} — the ingest-edge admission check: is
  // this document a near-duplicate of anything already admitted? Wired
  // by the deployment to the streaming MinHash index's single-doc probe
  // (MinhashStream.probeText); absent wiring → 404, like /search.
  server.createContext("/neardup", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = guard(ex) {
      (ex.getRequestMethod, neardup) match {
        case ("POST", Some(fn)) =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          ServingShim.jsonString(body, "text").filter(_.trim.nonEmpty) match {
            case None =>
              respond(ex, 400, """{"error": "missing text"}""", "application/json")
            case Some(text) =>
              val hits = fn(text)
              val hitsJson = hits.map { case (id, j) =>
                s"""{"doc_id": $id, "jaccard": $j}"""
              }.mkString("[", ", ", "]")
              respond(ex, 200,
                s"""{"duplicate": ${hits.nonEmpty}, "hits": $hitsJson}""",
                "application/json")
          }
        case ("POST", None) =>
          respond(ex, 404, """{"error": "neardup not configured"}""", "application/json")
        case _ =>
          respond(ex, 405, """{"error": "method not allowed"}""", "application/json")
      }
    }
  })

  // POST /fingerprint {"text": ...} — MOSS-style match check against
  // the streaming winnowing index (WinnowStream.probeText wired in by
  // the deployment): which stored docs share verbatim runs with this
  // one, and how much of it is already covered? The /neardup companion
  // for ORDERED overlap (winnowing guarantees any ≥ K+W−1-char shared
  // run is caught; MinHash-Jaccard is bag-of-shingles). Absent → 404.
  server.createContext("/fingerprint", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = guard(ex) {
      (ex.getRequestMethod, fingerprintMatch) match {
        case ("POST", Some(fn)) =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          ServingShim.jsonString(body, "text").filter(_.trim.nonEmpty) match {
            case None =>
              respond(ex, 400, """{"error": "missing text"}""", "application/json")
            case Some(text) =>
              val hits = fn(text)
              val hitsJson = hits.map { case (id, n, o) =>
                s"""{"doc_id": $id, "n_shared": $n, "overlap": ${ServingShim.jsonNum(o)}}"""
              }.mkString("[", ", ", "]")
              respond(ex, 200,
                s"""{"match": ${hits.nonEmpty}, "hits": $hitsJson}""",
                "application/json")
          }
        case ("POST", None) =>
          respond(ex, 404, """{"error": "fingerprint not configured"}""",
            "application/json")
        case _ =>
          respond(ex, 405, """{"error": "method not allowed"}""",
            "application/json")
      }
    }
  })

  // POST /vsearch {"vector": [...], "k": n} | {"text": ..., "k": n} —
  // the dense-retrieval front door: a single-query probe of the streamed
  // IVF store (EmbedStream.probeVector wired in by the deployment; the
  // text form additionally routes through the deployment's Embedder
  // inside the wired closure). Absent wiring → 404, like /search.
  server.createContext("/vsearch", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = guard(ex) {
      (ex.getRequestMethod, vsearch) match {
        case ("POST", Some(fn)) =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val k = ServingShim.jsonInt(body, "k")
            .filter(x => x > 0 && x <= 100).getOrElse(5)
          val query: Option[Either[String, Array[Float]]] =
            ServingShim.jsonFloatArray(body, "vector").map(Right(_))
              .orElse(ServingShim.jsonString(body, "text")
                .filter(_.trim.nonEmpty).map(Left(_)))
          query match {
            case None =>
              respond(ex, 400, """{"error": "missing vector or text"}""",
                "application/json")
            case Some(q) =>
              val hits = fn(q, k).zipWithIndex.map { case ((id, sc), i) =>
                s"""{"rank": ${i + 1}, "doc_id": $id, "score": ${ServingShim.jsonNum(sc)}}"""
              }.mkString("[", ", ", "]")
              respond(ex, 200, s"""{"k": $k, "hits": $hits}""",
                "application/json")
          }
        case ("POST", None) =>
          respond(ex, 404, """{"error": "vsearch not configured"}""",
            "application/json")
        case _ =>
          respond(ex, 405, """{"error": "method not allowed"}""",
            "application/json")
      }
    }
  })

  // POST /audiomatch {"blob_b64": ...} — identify ONE audio clip against
  // the streamed fingerprint store (MediaStream.probeAudio wired in by
  // the deployment): the Shazam-style front door. Absent wiring → 404.
  server.createContext("/audiomatch", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = guard(ex) {
      (ex.getRequestMethod, audiomatch) match {
        case ("POST", Some(fn)) =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val blob = ServingShim.jsonString(body, "blob_b64")
            .filter(_.trim.nonEmpty)
            .flatMap { b64 =>
              try Some(java.util.Base64.getDecoder.decode(b64.trim))
              catch { case _: IllegalArgumentException => None }
            }
          blob match {
            case None =>
              respond(ex, 400, """{"error": "missing or invalid blob_b64"}""",
                "application/json")
            case Some(bytes) =>
              val matches = fn(bytes)
              val hits = matches.map { case (id, n) =>
                s"""{"media_id": $id, "n_shared": $n}"""
              }.mkString("[", ", ", "]")
              respond(ex, 200,
                s"""{"match": ${matches.nonEmpty}, "hits": $hits}""",
                "application/json")
          }
        case ("POST", None) =>
          respond(ex, 404, """{"error": "audiomatch not configured"}""",
            "application/json")
        case _ =>
          respond(ex, 405, """{"error": "method not allowed"}""",
            "application/json")
      }
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
        val trail = new Trail
        // first submission wins: a duplicate id must not reset a live
        // trail out from under its subscribers
        if (trails.putIfAbsent(id, trail).isDefined) {
          respond(ex, 409,
            s"""{"error": "duplicate job id", "job_id": ${ServingShim.quote(id)}}""",
            "application/json")
          return
        }
        pool.submit(new Runnable {
          override def run(): Unit =
            try runJob(id, req, e => trail.events.add(e))
            catch {
              case scala.util.control.NonFatal(e) =>
                trail.events.add(JobStream.event(id, "error",
                  s"""{"message":${ServingShim.quote(String.valueOf(e.getMessage))}}"""))
            } finally trail.done = true
        })
        respond(ex, 202, s"""{"job_id": ${ServingShim.quote(id)}}""", "application/json")
    }
  }

  /** Push SSE: chunked transfer, one [[JobStream.sseFrames]]-format frame
    * per event, written and flushed AS the runner emits it; the stream
    * ends when the trail completes (or the bounded wait elapses — the
    * client keeps whatever frames arrived). */
  private def streamEvents(ex: HttpExchange, id: String): Unit = {
    trails.get(id) match {
      case None =>
        respond(ex, 404, """{"error": "unknown job"}""", "application/json")
      case Some(trail) =>
        ex.getResponseHeaders.set("Content-Type", "text/event-stream; charset=utf-8")
        ex.sendResponseHeaders(200, 0) // length 0 → chunked
        val out = ex.getResponseBody
        val deadline = System.nanoTime() + TimeUnit.MILLISECONDS.toNanos(sseTimeoutMs)
        var cursor = 0
        var finished = false
        while (!finished && System.nanoTime() < deadline) {
          var wrote = false
          while (cursor < trail.events.size()) {
            val e = trail.events.get(cursor)
            out.write(
              s"""data: {"event": "${e.event}", "data": ${e.data}}\n\n"""
                .getBytes(UTF_8))
            cursor += 1
            wrote = true
          }
          if (wrote) out.flush()
          if (trail.done && cursor == trail.events.size()) finished = true
          else if (!wrote) Thread.sleep(10)
        }
        out.flush()
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

  /** One search result row as served by `GET /search`. */
  case class SearchHit(rank: Int, docId: Long, score: Double)

  /** A rich hit (with its KWIC snippet) on the full result page. */
  case class RichHit(rank: Int, docId: Long, score: Double, snippet: String)

  /** One facet count row: (facet dimension, value, matching docs). */
  case class FacetCount(facet: String, value: String, nDocs: Long)

  /** The assembled result page `GET /search?full=1` serves: ranked
    * snippeted hits plus facet counts over the full match set. */
  case class SearchPage(hits: Seq[RichHit], facets: Seq[FacetCount])

  /** Parse a raw query string (`a=1&b=x%20y`) — last value wins,
    * URL-decoded as UTF-8. A pair with a malformed percent-escape is
    * DROPPED rather than thrown: the handlers then see the parameter as
    * absent and answer 400 "missing q" — a client error — instead of
    * the guard converting URLDecoder's IllegalArgumentException into a
    * 500 server fault. */
  def queryParams(raw: String): Map[String, String] =
    Option(raw).toSeq.flatMap(_.split("&"))
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.nonEmpty =>
            try Some(java.net.URLDecoder.decode(k, "UTF-8") ->
              java.net.URLDecoder.decode(v, "UTF-8"))
            catch { case _: IllegalArgumentException => None }
          case _ => None
        }
      }.toMap

  /** Prometheus text exposition (format 0.0.4) of the per-stage ingest
    * gauges — one series per metric with (run_id, stage) labels, the
    * same shape the reference pushes to its gateway. */
  def prometheusText(rows: Seq[graft.ingest.StageMetric]): String = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    def series(name: String, help: String, value: graft.ingest.StageMetric => Double): String =
      s"# HELP $name $help\n# TYPE $name gauge\n" + rows.map { m =>
        s"""$name{run_id="${esc(m.runId)}",stage="${esc(m.stage)}"} ${value(m)}"""
      }.mkString("", "\n", "\n")
    series("graft_ingest_stage_wall_seconds",
      "Driver wall clock per pipeline stage.", _.wallMs / 1000.0) +
      series("graft_ingest_stage_task_seconds",
        "Executor task time attributed to the stage.", _.taskTimeMs / 1000.0) +
      series("graft_ingest_stage_records_read",
        "Input records read by the stage's tasks.", _.recordsRead.toDouble) +
      series("graft_ingest_stage_tasks",
        "Tasks run for the stage.", _.tasks.toDouble)
  }

  /** JSON number for a score field: JSON has no NaN/Infinity literal,
    * so a non-finite cosine (zero vector in the store) must not reach
    * the interpolation — it would emit invalid JSON and break clients.
    * Non-finite maps to 0.0 (the "no similarity" score). */
  def jsonNum(d: Double): String =
    if (java.lang.Double.isFinite(d)) d.toString else "0.0"

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
    // unrolled-loop possessive form: the naive ((?:[^"\\]|\\.)*) pushes
    // one regex stack frame per matched character, which overflows the
    // handler thread on multi-KB values (a base64 /audiomatch blob);
    // this shape matches the same language in one linear pass
    val m = ("\"" + java.util.regex.Pattern.quote(key) +
      "\"\\s*:\\s*\"([^\"\\\\]*+(?:\\\\.[^\"\\\\]*+)*+)\"").r
      .findFirstMatchIn(body)
    m.map(g => unescape(g.group(1)))
  }

  /** Parse a flat JSON number-array field (`"key": [0.1, -2, 3e-1]`).
    * Nested arrays/objects are out of contract (the request bodies are
    * the shim's flat shapes); a malformed element drops the field, so
    * the handler answers 400 rather than 500. */
  def jsonFloatArray(body: String, key: String): Option[Array[Float]] = {
    val m = ("\"" + java.util.regex.Pattern.quote(key) +
      "\"\\s*:\\s*\\[([^\\]]*)\\]").r.findFirstMatchIn(body)
    m.flatMap { g =>
      val parts = g.group(1).split(",").map(_.trim).filter(_.nonEmpty)
      if (parts.isEmpty) None
      else try Some(parts.map(_.toFloat))
      catch { case _: NumberFormatException => None }
    }
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
