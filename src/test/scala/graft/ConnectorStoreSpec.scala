package graft

import graft.model.Node
import graft.sources._
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.TimeUnit
import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

/** VERDICT r4 item 4: the connector stack (Deduping ∘ Retrying ∘
  * HttpScopeBatchWriter) proven against a REAL external store process
  * that is killed mid-batch — the vector_write_service semantics
  * (batch ≤128, idempotent per-id upsert, retry, receipts,
  * vector_write_service.py:100-161,201-210) under an actual process
  * death, not a mock. The store halts itself (kill -9 twin) after
  * persisting a configured number of docs of a batch; the spec restarts
  * it on the same durable log and asserts every doc ends up visible
  * exactly once, the partial write really landed (and was absorbed by
  * the idempotent upsert), and a replay of the same logical batch is
  * short-circuited by the store-side receipt.
  */
class ConnectorStoreSpec extends SparkSpec {

  private val http = HttpClient.newHttpClient()

  private def get(url: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder().uri(java.net.URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(url: String): Int =
    http.send(HttpRequest.newBuilder().uri(java.net.URI.create(url))
      .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.discarding()).statusCode()

  private def freePort(): Int = {
    val ss = new java.net.ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }

  /** Launch the store as a separate OS process and wait for /health. */
  private def launchStore(port: Int, dataFile: String): Process = {
    val java = System.getProperty("java.home") + "/bin/java"
    val p = new ProcessBuilder(java, "-cp", System.getProperty("java.class.path"),
      "graft.sources.HttpScopeStore", port.toString, dataFile)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .redirectError(ProcessBuilder.Redirect.DISCARD)
      .start()
    val deadline = System.nanoTime() + 15_000_000_000L
    var up = false
    while (!up && System.nanoTime() < deadline) {
      up = try get(s"http://localhost:$port/health")._1 == 200
      catch { case _: Exception => Thread.sleep(100); false }
    }
    assert(up, "store process did not come up")
    p
  }

  test("exactly-once visible rows through a store process killed mid-batch") {
    val port = freePort()
    val dataFile = java.nio.file.Files.createTempFile("store", ".log").toString
    val base = s"http://localhost:$port"
    val p1 = launchStore(port, dataFile)
    // chaos: the store will halt (exit 137) after durably applying
    // exactly 3 docs of the next upsert — a mid-batch kill
    assert(post(s"$base/config?failAfterDocs=3") == 200)

    val docs = (0 until 10).map { i =>
      SinkDoc(f"doc$i%02d", s"text $i", Array(i.toFloat, 1f),
        Map("repo" -> "r1", s"topics:t$i" -> "1"))
    }
    val stack = new DedupingScopeBatchWriter(
      new RetryingScopeBatchWriter(new HttpScopeBatchWriter(base, timeoutMs = 3000),
        maxAttempts = 12, baseBackoffMs = 250, maxBackoffMs = 500),
      new HttpTokenLedger(base))
    val write = Future { stack.upsert("chunk", "embeddings", docs) }

    // the store dies mid-batch like kill -9
    assert(p1.waitFor(15, TimeUnit.SECONDS), "store should have halted")
    assert(p1.exitValue() == 137)

    // restart on the same durable log; the retrying writer finishes
    val p2 = launchStore(port, dataFile)
    try {
      Await.result(write, 60.seconds)

      // every doc visible exactly once, with the right content
      val rows = get(s"$base/rows?table=embeddings")._2
        .split("\n").filter(_.nonEmpty).toSeq
      assert(rows.length == docs.length, s"visible rows:\n${rows.mkString("\n")}")
      assert(rows.map(_.split("\t")(0)) == docs.map(_.id).sorted)
      rows.foreach { r =>
        val Array(id, fp) = r.split("\t")
        val d = docs.find(_.id == id).get
        assert(fp == HttpScopeStore.fingerprint(HttpScopeStore.encodeDoc(d)),
          s"content mismatch for $id")
      }

      // the kill really landed a partial write: 3 docs before the crash
      // + the full 10-doc retry = 13 applied writes, 10 visible rows —
      // at-least-once delivery absorbed by the idempotent upsert
      assert(get(s"$base/stats")._2.toLong == 13)

      // replaying the same logical batch is receipt-short-circuited:
      // no new writes reach the store at all
      stack.upsert("chunk", "embeddings", docs)
      assert(get(s"$base/stats")._2.toLong == 13)
    } finally {
      p2.destroyForcibly()
      p2.waitFor(5, TimeUnit.SECONDS)
    }
  }

  test("ingest pipeline writes through the HTTP connector from executors") {
    import spark.implicits._
    val port = freePort()
    val dataFile = java.nio.file.Files.createTempFile("store2", ".log").toString
    val base = s"http://localhost:$port"
    val p = launchStore(port, dataFile)
    try {
      val nodes = (0 until 7).map { i =>
        Node.empty.copy(rowId = s"n$i", scope = "chunk", text = s"chunk $i",
          namespace = "ns", repo = "r1", filePath = s"f$i.py",
          language = "python", topics = Seq(s"t${i % 3}"),
          embedding = Array(i.toFloat))
      } :+ Node.empty.copy(rowId = "repo1", scope = "repo", text = "r",
        namespace = "ns", repo = "r1", embedding = Array(1f))
      val sink = new ConnectorCorpusSink(
        new DedupingScopeBatchWriter(
          new RetryingScopeBatchWriter(new HttpScopeBatchWriter(base)),
          new HttpTokenLedger(base)),
        batchSize = 3)
      sink.write(spark.createDataset(nodes), "run-http")

      val chunkRows = get(s"$base/rows?table=embeddings")._2
        .split("\n").filter(_.nonEmpty)
      assert(chunkRows.map(_.split("\t")(0)).sorted.toSeq ==
        (0 until 7).map(i => s"n$i"))
      val repoRows = get(s"$base/rows?table=embeddings_repo")._2
        .split("\n").filter(_.nonEmpty)
      assert(repoRows.map(_.split("\t")(0)).toSeq == Seq("repo1"))

      // idempotent re-run: receipts absorb the whole replay
      val before = get(s"$base/stats")._2.toLong
      sink.write(spark.createDataset(nodes), "run-http")
      assert(get(s"$base/stats")._2.toLong == before)
    } finally {
      p.destroyForcibly()
      p.waitFor(5, TimeUnit.SECONDS)
    }
  }
}
