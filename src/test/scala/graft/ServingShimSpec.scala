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

  def runner(id: String, req: QueryRequest, emit: JobEvent => Unit): Unit =
    trailFor(id, req.query).foreach(emit)

  def withShim(health: () => Health.Status = () => healthyStatus,
      run: (String, QueryRequest, JobEvent => Unit) => Unit = runner)(
      body: (Int, HttpClient) => Unit): Unit = {
    val shim = new ServingShim(health, run, sseTimeoutMs = 5000)
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

  test("GET /metrics: Prometheus exposition of the ingest stage gauges") {
    import graft.ingest.StageMetric
    val rows = Seq(
      StageMetric("run-1", "chunk", wallMs = 1500, taskTimeMs = 4000,
        recordsRead = 123, tasks = 8),
      StageMetric("run-1", "embed", wallMs = 250, taskTimeMs = 900,
        recordsRead = 45, tasks = 2))
    val shim = new ServingShim(() => healthyStatus, runner,
      sseTimeoutMs = 5000, metrics = () => rows)
    val port = shim.start()
    try {
      val r = get(HttpClient.newHttpClient(), port, "/metrics")
      assert(r.statusCode() == 200)
      assert(r.headers().firstValue("Content-Type").get.startsWith("text/plain"))
      val b = r.body()
      assert(b.contains("# TYPE graft_ingest_stage_wall_seconds gauge"))
      assert(b.contains(
        """graft_ingest_stage_wall_seconds{run_id="run-1",stage="chunk"} 1.5"""))
      assert(b.contains(
        """graft_ingest_stage_task_seconds{run_id="run-1",stage="embed"} 0.9"""))
      assert(b.contains(
        """graft_ingest_stage_records_read{run_id="run-1",stage="chunk"} 123.0"""))
      assert(b.contains(
        """graft_ingest_stage_tasks{run_id="run-1",stage="embed"} 2.0"""))
      // all four families present, each with both stages
      assert(b.linesIterator.count(_.startsWith("graft_ingest_stage")) == 8)
    } finally shim.stop()
  }

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

  test("SSE is push-true: started arrives while the job is still running") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    def slowRunner(id: String, req: QueryRequest, emit: JobEvent => Unit): Unit = {
      emit(JobStream.event(id, "started", """{"query":"q"}"""))
      gate.await(5, java.util.concurrent.TimeUnit.SECONDS)
      emit(JobStream.event(id, "final", """{"answer":"late"}"""))
    }
    withShim(run = slowRunner) { (port, c) =>
      post(c, port, "/jobs", """{"job_id": "push-1", "query": "q"}""")
      val resp = c.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/jobs/push-1/events")).GET.build(),
        HttpResponse.BodyHandlers.ofInputStream())
      val in = resp.body()
      // read the first frame byte-by-byte: it must arrive BEFORE the
      // runner is released, i.e. while the job is still running
      val first = new StringBuilder
      var ch = in.read()
      while (ch >= 0 && !first.toString.endsWith("\n\n")) {
        first.append(ch.toChar)
        if (!first.toString.endsWith("\n\n")) ch = in.read()
      }
      assert(first.toString.contains(""""event": "started""""))
      assert(gate.getCount == 1, "first frame must precede job completion")
      gate.countDown()
      val rest = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      assert(rest.contains(""""event": "final""""))
      in.close()
    }
  }

  test("late subscribers replay the full trail after completion") {
    withShim() { (port, c) =>
      post(c, port, "/jobs", """{"job_id": "replay-1", "query": "q"}""")
      // first subscriber drains the stream to completion
      val a = get(c, port, "/jobs/replay-1/events")
      // a second, post-completion subscriber must see the SAME frames
      val b = get(c, port, "/jobs/replay-1/events")
      assert(a.body().nonEmpty && b.body() == a.body(),
        "append-only trail must replay identically for every subscriber")
    }
  }

  test("POST /jobs without query → 400; unknown job events → 404; duplicate id → 409") {
    withShim() { (port, c) =>
      assert(post(c, port, "/jobs", """{"top_k": 3}""").statusCode() == 400)
      assert(get(c, port, "/jobs/nope/events").statusCode() == 404)
      assert(post(c, port, "/jobs",
        """{"job_id": "dup-1", "query": "q"}""").statusCode() == 202)
      val dup = post(c, port, "/jobs", """{"job_id": "dup-1", "query": "other"}""")
      assert(dup.statusCode() == 409, "resubmitting a live job id must conflict")
      // the original trail is intact: events still replay
      assert(get(c, port, "/jobs/dup-1/events").statusCode() == 200)
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

  test("GET /search: stored-index retrieval over real sockets; 400/404 edges") {
    // wired to the REAL stored-index path over the sf0.001 corpus — the
    // deployment shape, not a stub
    val sf = "/root/testdata/sf0.001"
    val engineSearch = (q: String, k: Int) =>
      graft.queries.SearchQueries.searchStored(spark, sf, q, k).collect()
        .map(r => ServingShim.SearchHit(r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    val shim = new ServingShim(() => healthyStatus, runner,
      search = Some(engineSearch))
    val port = shim.start()
    try {
      val c = java.net.http.HttpClient.newHttpClient()
      val r = get(c, port, "/search?q=hash%20join&k=3")
      assert(r.statusCode() == 200, r.body())
      // served hits ≡ the engine's own ranking for the same query
      val want = engineSearch("hash join", 3)
      val got = """\{"rank": (\d+), "doc_id": (\d+), "score": ([-0-9.E]+)\}""".r
        .findAllMatchIn(r.body())
        .map(m => ServingShim.SearchHit(m.group(1).toInt, m.group(2).toLong,
          m.group(3).toDouble)).toSeq
      assert(got == want, s"served $got != engine $want")
      assert(want.nonEmpty && want.map(_.rank) == (1 to want.size))
      assert(get(c, port, "/search?k=3").statusCode() == 400, "missing q")
      assert(get(c, port, "/search?q=").statusCode() == 400, "empty q")
      // a malformed percent-escape is a CLIENT error: the undecodable
      // pair drops out and the handler answers 400, never a 500 (raw
      // socket: the JDK URI client would reject the escape before send)
      val sock = new java.net.Socket("127.0.0.1", port)
      try {
        val out = sock.getOutputStream
        out.write(("GET /search?q=%zz HTTP/1.1\r\nHost: x\r\n" +
          "Connection: close\r\n\r\n").getBytes("US-ASCII"))
        out.flush()
        val status = new String(sock.getInputStream.readAllBytes, "US-ASCII")
          .linesIterator.next()
        assert(status.contains("400"), s"bad escape should 400: $status")
      } finally sock.close()
    } finally shim.stop()
    // a shim without search wiring 404s rather than growing a dead endpoint
    withShim() { (port2, c2) =>
      assert(get(c2, port2, "/search?q=x").statusCode() == 404)
    }
  }

  test("GET /search?full=1: the assembled SERP with snippets and facets") {
    val sf = "/root/testdata/sf0.001"
    val engineSearch = (q: String, k: Int) =>
      graft.queries.SearchQueries.searchStored(spark, sf, q, k).collect()
        .map(r => ServingShim.SearchHit(r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    val enginePage = (q: String, k: Int) => {
      val (hits, facets) = graft.queries.SearchQueries.searchPage(spark, sf, q, k)
      ServingShim.SearchPage(
        hits.collect().map(r => ServingShim.RichHit(
          r.getInt(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSeq,
        facets.collect().map(r => ServingShim.FacetCount(
          r.getString(1), r.getString(2), r.getLong(3))).toSeq)
    }
    val shim = new ServingShim(() => healthyStatus, runner,
      search = Some(engineSearch), page = Some(enginePage))
    val port = shim.start()
    try {
      val c = java.net.http.HttpClient.newHttpClient()
      val r = get(c, port, "/search?q=hash%20join&k=3&full=1")
      assert(r.statusCode() == 200, r.body())
      // ranks + doc ids agree with the plain stored-index ranking
      val plain = engineSearch("hash join", 3)
      val served = """"rank": (\d+), "doc_id": (\d+)""".r
        .findAllMatchIn(r.body()).map(m => (m.group(1).toInt, m.group(2).toLong)).toSeq
      assert(served == plain.map(h => (h.rank, h.docId)), r.body())
      // every hit carries a snippet containing a query term; facets present
      val snips = """"snippet": "([^"]*)"""".r
        .findAllMatchIn(r.body()).map(_.group(1)).toSeq
      assert(snips.size == plain.size && snips.forall(s =>
        s.contains("hash") || s.contains("join")), r.body())
      assert(r.body().contains(""""facet": "lang""""), r.body())
      assert(r.body().contains(""""facet": "source""""), r.body())
      // without full=1 the plain shape is unchanged (no snippet key)
      val r2 = get(c, port, "/search?q=hash%20join&k=3")
      assert(r2.statusCode() == 200 && !r2.body().contains("snippet"))
    } finally shim.stop()
  }

  test("request-body JSON readers handle escapes and reject absent keys") {
    assert(ServingShim.jsonString("""{"query": "a \"b\" \n c"}""", "query")
      .contains("a \"b\" \n c"))
    assert(ServingShim.jsonString("""{"q": "x"}""", "query").isEmpty)
    assert(ServingShim.jsonInt("""{"top_k": 12}""", "top_k").contains(12))
    assert(ServingShim.jsonInt("""{"top_k": "12"}""", "top_k").isEmpty)
  }

  test("POST /neardup: admission check against the streaming MinHash index") {
    import graft.streaming.MinhashStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shim-neardup").toString
    val admitted = "the quick brown fox jumps over the lazy dog tonight"
    MinhashStream.writeDelta(
      Seq((7L, admitted), (8L, "an unrelated admitted document body"))
        .toDF("doc_id", "text"),
      s"$dir/idx", 0L)
    val shim = new ServingShim(() => healthyStatus, runner,
      neardup = Some(t => MinhashStream.probeText(spark, s"$dir/idx", t)))
    val port = shim.start()
    val c = HttpClient.newHttpClient()
    try {
      // exact duplicate of an admitted doc → rejected with jaccard 1.0
      val dup = post(c, port, "/neardup",
        s"""{"text": ${ServingShim.quote(admitted)}}""")
      assert(dup.statusCode() == 200)
      assert(dup.body().contains(""""duplicate": true"""), dup.body())
      assert(dup.body().contains(""""doc_id": 7"""), dup.body())
      assert(dup.body().contains(""""jaccard": 1.0"""), dup.body())
      // novel document → admitted
      val novel = post(c, port, "/neardup",
        """{"text": "completely fresh never before seen writing"}""")
      assert(novel.statusCode() == 200)
      assert(novel.body().contains(""""duplicate": false"""), novel.body())
      // edges: missing text → 400; GET → 405
      assert(post(c, port, "/neardup", """{"nope": 1}""").statusCode() == 400)
      assert(get(c, port, "/neardup").statusCode() == 405)
    } finally { shim.stop(); () }
    // unwired shim → 404 (job-only deployments don't grow the endpoint)
    withShim() { (p2, c2) =>
      assert(post(c2, p2, "/neardup", """{"text": "x"}""").statusCode() == 404)
    }
  }

  test("POST /fingerprint: MOSS match check against the streaming winnowing index") {
    import graft.streaming.WinnowStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shim-winnow").toString
    val run = "the quick brown fox jumps over the lazy dog again tonight"
    val admitted = TestHash.filler(1, 300) + " " + run + " " + TestHash.filler(2, 300)
    WinnowStream.writeDelta(
      Seq((7L, admitted), (8L, TestHash.filler(3, 400))).toDF("doc_id", "text"),
      s"$dir/idx", 0L)
    val shim = new ServingShim(() => healthyStatus, runner,
      fingerprintMatch = Some(t => WinnowStream.probeText(spark, s"$dir/idx", t)))
    val port = shim.start()
    val c = HttpClient.newHttpClient()
    try {
      // a doc sharing the 58-char run → matched (guarantee: ≥ K+W−1)
      val probe = TestHash.filler(9, 250) + " " + run + " " + TestHash.filler(10, 250)
      val hit = post(c, port, "/fingerprint",
        s"""{"text": ${ServingShim.quote(probe)}}""")
      assert(hit.statusCode() == 200)
      assert(hit.body().contains(""""match": true"""), hit.body())
      assert(hit.body().contains(""""doc_id": 7"""), hit.body())
      assert(!hit.body().contains(""""doc_id": 8"""), hit.body())
      // novel text → no match
      val novel = post(c, port, "/fingerprint",
        s"""{"text": ${ServingShim.quote(TestHash.filler(20, 400))}}""")
      assert(novel.statusCode() == 200)
      assert(novel.body().contains(""""match": false"""), novel.body())
      // edges: missing text → 400; GET → 405
      assert(post(c, port, "/fingerprint", """{"nope": 1}""").statusCode() == 400)
      assert(get(c, port, "/fingerprint").statusCode() == 405)
    } finally { shim.stop(); () }
    withShim() { (p2, c2) =>
      assert(post(c2, p2, "/fingerprint", """{"text": "x"}""").statusCode() == 404)
    }
  }

  test("POST /vsearch: dense retrieval against the streamed IVF store") {
    import graft.retrieval.IvfIndex
    import graft.streaming.EmbedStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dim = 8
    def vec(seed: Long): Array[Float] = {
      val rnd = new java.util.Random(seed)
      Array.fill(dim)(rnd.nextGaussian().toFloat)
    }
    val corpus = (0 until 10).map(i => (i.toLong, vec(i * 7919L + 3).toSeq))
    val dir = java.nio.file.Files.createTempDirectory("shim-vsearch").toString
    val corpusDf = corpus.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val cents = IvfIndex.buildCentroids(corpusDf, "vec_id", "embedding", 4)
    IvfIndex.writeCentroids(spark, cents, dir)
    // the startIvf lists layout: batch=<id>/centroid_id=<c> with q8 codes
    IvfIndex.withQ8(IvfIndex.assign(corpusDf, "vec_id", "embedding", cents),
        "embedding")
      .write.partitionBy("centroid_id").parquet(s"$dir/lists/batch=0")
    // the text form routes through the deployment's embedder; the toy
    // one here maps a text deterministically onto a corpus vector
    def toyEmbed(t: String): Array[Float] = vec((t.length % 10) * 7919L + 3)
    val shim = new ServingShim(() => healthyStatus, runner,
      vsearch = Some((q, k) => q match {
        case Right(v) => EmbedStream.probeVector(spark, dir, v, k, nprobe = 4)
        case Left(t) => EmbedStream.probeVector(spark, dir, toyEmbed(t), k, nprobe = 4)
      }))
    val port = shim.start()
    val c = HttpClient.newHttpClient()
    try {
      // exact stored vector → itself at rank 1, cosine 1
      val body = corpus(3)._2.mkString("[", ", ", "]")
      val r = post(c, port, "/vsearch", s"""{"vector": $body, "k": 3}""")
      assert(r.statusCode() == 200, r.body())
      assert(r.body().contains(""""rank": 1, "doc_id": 3, "score": 1.0"""), r.body())
      // the probe agrees with the search kernel run directly
      val direct = IvfIndex.searchQ8Lists(
        spark.read.option("basePath", s"$dir/lists").parquet(s"$dir/lists/batch=0"),
        "vec_id", "embedding", Seq((-1L, corpus(3)._2.toArray)), cents, 4, 3)
        .orderBy(col("rank")).collect().map(r => (r.getLong(1), r.getDouble(2)))
      val served = """"doc_id": (-?\d+), "score": ([-0-9.E]+)""".r
        .findAllMatchIn(r.body())
        .map(m => (m.group(1).toLong, m.group(2).toDouble)).toSeq
      assert(served == direct.toSeq, s"served $served vs direct ${direct.toSeq}")
      // text form: the wired embedder maps length%10 → corpus id 7
      val t = post(c, port, "/vsearch", s"""{"text": ${ServingShim.quote("x" * 7)}, "k": 1}""")
      assert(t.statusCode() == 200, t.body())
      assert(t.body().contains(""""doc_id": 7, "score": 1.0"""), t.body())
      // edges: no vector/text → 400; GET → 405
      assert(post(c, port, "/vsearch", """{"k": 2}""").statusCode() == 400)
      assert(get(c, port, "/vsearch").statusCode() == 405)
    } finally { shim.stop(); () }
    // empty store → empty hits (serving before the first commit)
    val emptyDir = java.nio.file.Files.createTempDirectory("shim-vsearch-empty").toString
    assert(EmbedStream.probeVector(spark, emptyDir, vec(1L)).isEmpty)
    // unwired shim → 404
    withShim() { (p2, c2) =>
      assert(post(c2, p2, "/vsearch", """{"vector": [1, 0]}""").statusCode() == 404)
    }
  }

  test("non-finite scores serialize as valid JSON (0.0), never NaN/Infinity") {
    // JSON has no NaN literal — a zero vector in the store yields a
    // NaN cosine, and interpolating it raw breaks every client parser
    assert(ServingShim.jsonNum(Double.NaN) == "0.0")
    assert(ServingShim.jsonNum(Double.PositiveInfinity) == "0.0")
    assert(ServingShim.jsonNum(Double.NegativeInfinity) == "0.0")
    assert(ServingShim.jsonNum(0.731) == "0.731")
    // end to end: a vsearch hit carrying a NaN score still returns
    // parseable JSON with score 0.0
    val shim = new ServingShim(() => healthyStatus, runner,
      vsearch = Some((_, _) => Seq((42L, Double.NaN))))
    val port = shim.start()
    val c = HttpClient.newHttpClient()
    try {
      val r = post(c, port, "/vsearch", """{"vector": [1, 0], "k": 1}""")
      assert(r.statusCode() == 200, r.body())
      assert(r.body().contains(""""doc_id": 42, "score": 0.0"""), r.body())
      assert(!r.body().contains("NaN"), r.body())
    } finally { shim.stop(); () }
  }

  test("POST /audiomatch: clip identification against the landmark store") {
    import graft.multimodal.AudioProbe
    import graft.streaming.MediaStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shim-audio").toString
    MediaStream.writeLandmarkDelta(
      Seq(21L -> AudioProbe.wavBytes(8000, 1, 2000, seed = 5L),
        22L -> AudioProbe.wavBytes(16000, 2, 1500, seed = 6L))
        .toDF("media_id", "blob"), s"$dir/idx", 0L)
    val shim = new ServingShim(() => healthyStatus, runner,
      audiomatch = Some(b => MediaStream.probeAudio(spark, s"$dir/idx", b)))
    val port = shim.start()
    val c = HttpClient.newHttpClient()
    try {
      val clip = java.util.Base64.getEncoder.encodeToString(
        AudioProbe.wavBytes(44100, 1, 900, seed = 6L)) // re-encoded crop of 22
      val r = post(c, port, "/audiomatch", s"""{"blob_b64": "$clip"}""")
      assert(r.statusCode() == 200, r.body())
      assert(r.body().contains(""""match": true"""), r.body())
      assert(r.body().contains(""""media_id": 22"""), r.body())
      assert(!r.body().contains(""""media_id": 21"""), r.body())
      // an unknown recording answers match: false with no hits
      val miss = java.util.Base64.getEncoder.encodeToString(
        AudioProbe.wavBytes(8000, 1, 900, seed = 999L))
      val m = post(c, port, "/audiomatch", s"""{"blob_b64": "$miss"}""")
      assert(m.statusCode() == 200 && m.body().contains(""""match": false"""))
      // edges: missing/invalid base64 → 400; GET → 405
      assert(post(c, port, "/audiomatch", """{}""").statusCode() == 400)
      assert(post(c, port, "/audiomatch",
        """{"blob_b64": "@@not-base64@@"}""").statusCode() == 400)
      assert(get(c, port, "/audiomatch").statusCode() == 405)
    } finally { shim.stop(); () }
    // unwired shim → 404
    withShim() { (p2, c2) =>
      assert(post(c2, p2, "/audiomatch", """{"blob_b64": "AAAA"}""").statusCode() == 404)
    }
  }
}
