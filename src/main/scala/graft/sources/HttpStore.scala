package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.Base64
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** A concrete [[ScopeBatchWriter]] + [[TokenLedger]] pair against a real
  * external store process (VERDICT r4 item 4): the reference's write
  * service is an HTTP/CQL endpoint doing idempotent per-id upserts in
  * batches ≤128 with receipts (vector_write_service.py:100-161,201-210);
  * this is that contract over a JDK-only wire so the retry + idempotency
  * stack can be proven against a store that actually dies mid-batch.
  *
  * [[HttpScopeStore]] is the store side: a standalone process (or
  * embedded server) that applies docs ONE AT A TIME to an append-only
  * durable log — so a crash mid-batch leaves a genuine partial write on
  * disk, visible after restart, exactly the failure a Cassandra
  * coordinator loss produces. Chaos injection (`failAfterDocs`) halts the
  * whole process from inside the write loop, the deterministic twin of
  * `kill -9` during a batch. Swapping [[HttpScopeBatchWriter]] for a CQL
  * driver changes the wire, not the semantics — the engine-side stack
  * (Deduping ∘ Retrying ∘ driver) is identical.
  */
object HttpScopeStore {

  /** Wire format for one doc: 4 base64 fields, tab-separated, one doc per
    * line. Base64 makes the frame safe for any text/embedding bytes. */
  def encodeDoc(d: SinkDoc): String = {
    val b64 = Base64.getEncoder
    def enc(s: String) = b64.encodeToString(s.getBytes(UTF_8))
    val emb = java.nio.ByteBuffer.allocate(4 * d.embedding.length)
    d.embedding.foreach(emb.putFloat)
    val meta = d.meta.toSeq.sorted
      .map { case (k, v) => enc(k) + ":" + enc(v) }.mkString(";")
    Seq(enc(d.id), enc(d.text), b64.encodeToString(emb.array()), meta)
      .mkString("\t")
  }

  /** Content fingerprint the store records per id (last write wins). */
  def fingerprint(encodedDoc: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(encodedDoc.getBytes(UTF_8))
    md.digest().map("%02x".format(_)).mkString
  }

  /** `java -cp … graft.sources.HttpScopeStore <port> <dataFile>` — the
    * separate-process entry the exactly-once spec launches and kills. */
  def main(args: Array[String]): Unit = {
    val store = new HttpScopeStore(args(0).toInt, Paths.get(args(1)))
    store.start()
    Thread.currentThread.join()
  }
}

class HttpScopeStore(port: Int, dataFile: Path) {
  import HttpScopeStore._

  // state rebuilt from the log on start: (table, id) → fingerprint,
  // committed receipt tokens, and the all-time count of applied doc
  // writes (survives restarts — the spec's proof that a partial batch
  // really landed and was re-written)
  private val rows = scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private val ledger = scala.collection.concurrent.TrieMap.empty[String, Boolean]
  private val appliedWrites = new AtomicLong(0)
  private val failAfterDocs = new AtomicInteger(-1) // -1 = chaos off
  private val delayPerDocMs = new AtomicInteger(0)
  private var server: HttpServer = _

  private def replayLog(): Unit = {
    if (!Files.exists(dataFile)) return
    Files.readAllLines(dataFile).forEach { line =>
      line.split("\t", 4) match {
        case Array("D", table, id, fp) =>
          rows.put((table, id), fp); appliedWrites.incrementAndGet()
        case Array("L", token) => ledger.put(token, true)
        case _ => () // torn tail line from a crash: ignore
      }
    }
  }

  private def appendLog(line: String): Unit = synchronized {
    Files.write(dataFile, (line + "\n").getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    x.sendResponseHeaders(code, b.length)
    x.getResponseBody.write(b)
    x.close()
  }

  private def query(x: HttpExchange): Map[String, String] =
    Option(x.getRequestURI.getQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap

  def start(): HttpScopeStore = {
    replayLog()
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/health", (x: HttpExchange) => respond(x, 200, "ok"))
    server.createContext("/config", (x: HttpExchange) => {
      val q = query(x)
      q.get("failAfterDocs").foreach(v => failAfterDocs.set(v.toInt))
      q.get("delayPerDocMs").foreach(v => delayPerDocMs.set(v.toInt))
      respond(x, 200, "ok")
    })
    server.createContext("/upsert", (x: HttpExchange) => {
      val table = query(x).getOrElse("table", "embeddings")
      val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
      body.split("\n").filter(_.nonEmpty).foreach { line =>
        if (delayPerDocMs.get > 0) Thread.sleep(delayPerDocMs.get.toLong)
        // apply one doc durably, THEN check the chaos trigger — so a
        // configured crash leaves exactly `failAfterDocs` docs of the
        // batch on disk, a true mid-batch kill
        val id = new String(Base64.getDecoder.decode(line.split("\t")(0)), UTF_8)
        appendLog(s"D\t$table\t$id\t${fingerprint(line)}")
        rows.put((table, id), fingerprint(line))
        appliedWrites.incrementAndGet()
        if (failAfterDocs.get > 0 && failAfterDocs.decrementAndGet() == 0) {
          Runtime.getRuntime.halt(137) // die like kill -9, mid-batch
        }
      }
      respond(x, 200, "ok")
    })
    server.createContext("/rows", (x: HttpExchange) => {
      val table = query(x).getOrElse("table", "embeddings")
      val out = rows.toSeq.collect { case ((t, id), fp) if t == table =>
        s"$id\t$fp"
      }.sorted.mkString("\n")
      respond(x, 200, out)
    })
    server.createContext("/stats", (x: HttpExchange) =>
      respond(x, 200, appliedWrites.get.toString))
    server.createContext("/ledger", (x: HttpExchange) => {
      val token = x.getRequestURI.getPath.stripPrefix("/ledger/")
      x.getRequestMethod match {
        case "PUT" =>
          // conditional insert: first writer wins, like a store LWT —
          // the receipt commits in the same durability domain as the data
          val fresh = ledger.putIfAbsent(token, true).isEmpty
          if (fresh) appendLog(s"L\t$token")
          respond(x, 200, if (fresh) "committed" else "duplicate")
        case _ =>
          respond(x, if (ledger.contains(token)) 200 else 404, "")
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    this
  }

  def stop(): Unit = if (server != null) server.stop(0)
  def boundPort: Int = server.getAddress.getPort
}

/** The engine-side connector driver: ships batches to an
  * [[HttpScopeStore]] (or anything speaking its wire). Runs on the
  * executors — the client is @transient lazy so the writer serializes
  * into tasks like any connector. Any non-200 or transport failure throws,
  * which is what [[RetryingScopeBatchWriter]] (transient faults) and
  * Spark's task retry (lost executors) are stacked on top of. */
class HttpScopeBatchWriter(baseUrl: String, timeoutMs: Long = 10000)
    extends ScopeBatchWriter {
  @transient private lazy val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

  override def upsert(scope: String, table: String, batch: Seq[SinkDoc]): Unit = {
    val body = batch.map(HttpScopeStore.encodeDoc).mkString("\n")
    val req = HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"$baseUrl/upsert?scope=$scope&table=$table"))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"store upsert failed: ${resp.statusCode()}")
  }
}

/** [[TokenLedger]] backed by the store's own receipts endpoint — commit is
  * a conditional insert in the store's durability domain, closing the
  * concurrent-duplicate window [[DedupingScopeBatchWriter]] documents. */
class HttpTokenLedger(baseUrl: String, timeoutMs: Long = 10000)
    extends TokenLedger {
  @transient private lazy val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

  private def req(method: String, token: String) = {
    val b = HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"$baseUrl/ledger/$token"))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
    (if (method == "PUT") b.PUT(HttpRequest.BodyPublishers.noBody()) else b.GET())
      .build()
  }

  override def committed(token: String): Boolean =
    client.send(req("GET", token),
      HttpResponse.BodyHandlers.discarding()).statusCode() == 200

  override def commit(token: String): Unit = {
    val resp = client.send(req("PUT", token),
      HttpResponse.BodyHandlers.discarding())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"receipt commit failed: ${resp.statusCode()}")
  }
}
