package graft

import java.nio.file.Files

import graft.agent.AgentLoop
import graft.ingest.IngestPipeline
import graft.llm.{HashEmbedder, StubLlm}
import graft.model.QueryRequest
import graft.sources.{CorpusStore, Health}
import graft.streaming.JobStream
import org.apache.spark.sql.SparkSession

/** End-to-end walkthrough of the reference workflow on this engine:
  * enumerate → read a repo checkout → ingest to the five-scope corpus
  * store → health check → agentic query with citations → job events.
  *
  * Run: sbt "runMain graft.Demo"   (deterministic stub LLM/embedder; swap
  * HttpLlm/HttpEmbedder for live services.)
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // a tiny repo checkout
    val repoDir = Files.createTempDirectory("demo-repo")
    Files.createDirectories(repoDir.resolve("api"))
    Files.createDirectories(repoDir.resolve("core"))
    Files.writeString(repoDir.resolve("README.md"),
      "# payments\nA payments service with retry handling and a ledger. " +
        "It exposes a REST API and posts entries to the ledger store.")
    Files.writeString(repoDir.resolve("api/client.py"),
      "import requests\n\nclass PaymentsClient:\n    def charge(self, amount):\n        return requests.post('/charge', json={'amount': amount})\n")
    Files.writeString(repoDir.resolve("api/retry.py"),
      "import time\n\ndef retry_with_backoff(attempts):\n    for i in range(attempts):\n        time.sleep(2 ** i)\n")
    Files.writeString(repoDir.resolve("core/ledger.py"),
      "def post_ledger_entry(tx):\n    validate(tx)\n    store.append(tx)\n")

    val llm = new StubLlm
    val embedder = new HashEmbedder(384)
    val pipeline = new IngestPipeline(llm, embedder)

    // ingest → corpus store
    val raw = CorpusStore.readRepoDir(spark, repoDir.toString, "demo", "payments")
    val corpus = pipeline.buildCorpus(raw, "demo-run-1")
    val storeDir = Files.createTempDirectory("demo-corpus").toString
    val run = pipeline.write(corpus, s"$storeDir/corpus", "demo-run-1")
    println(s"[demo] ingested: ${run.nodeCount} chunk nodes")

    val health = Health.check(spark, s"$storeDir/corpus", llm, embedder)
    println(s"[demo] health: ${health.detail}")

    // query path over the stored corpus
    val stored = CorpusStore.read(spark, s"$storeDir/corpus").cache()
    val agent = new AgentLoop(llm, embedder)
    val events = JobStream.runJob(stored, agent, "job-demo",
      QueryRequest("how does retry with backoff work in the payments code?"))
    events.foreach(e => println(s"[demo] event ${e.event}: ${e.data.take(160)}"))

    val answer = events.find(_.event == "final").map(_.data).getOrElse("")
    require(answer.contains("answer"), "demo must produce an answer")
    println("[demo] OK")
    spark.stop()
  }
}
