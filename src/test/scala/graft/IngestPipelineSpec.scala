package graft

import graft.ingest.IngestPipeline
import graft.llm.{HashEmbedder, StubLlm}
import graft.model.{Node, RawDoc}
import graft.operators.FileFilters
import org.apache.spark.sql.functions._

/** FIXTURES §1: fixture repo through the full ingest pipeline — all five
  * scopes, rollup lineage, filters, determinism. */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  val fixtureRepo: Seq[RawDoc] = {
    def d(path: String, text: String) = RawDoc("ns", "fixrepo", "main", path, text)
    Seq(
      d("src/main.py", "import os\nfrom collections import defaultdict\n\ndef main():\n    print('hello')\n" + ("x = 1\n" * 800)),
      d("src/util/helpers.py", "import json\n\ndef helper(a, b):\n    return a + b\n"),
      d("Main.java", "import java.util.List;\npublic class Main { }\n"),
      d("app.scala", "import scala.collection.mutable\nobject App { def run(): Unit = () }\n"),
      d("script.sh", "#!/bin/bash\necho hi\n"),
      d("README.md", "# FixRepo\n\nThis is a long readme describing the project architecture in detail. " * 5),
      d("Dockerfile", "FROM python:3.11\nRUN pip install -e .\n"),
      d("docker-compose.yml", "services:\n  app:\n    build: .\n"),
      d("data.csv", "a,b\n1,2\n"),
      d("img.png", "\u0000PNG"),
      d("LICENSE", "MIT License"),
      d(".gitignore", "*.pyc"),
      d("fixtures.json", "{\"rows\": []}"),
      d("config.json", "{\"name\": \"fixrepo\"}"),
      d("pyproject.toml", "[project]\nname = \"fixrepo\"\n"),
      d("unknown.xyz", "Some free-form prose content. " * 200))
  }

  lazy val pipeline = new IngestPipeline(new StubLlm, new HashEmbedder(64))
  lazy val corpus = pipeline.buildCorpus(spark.createDataset(fixtureRepo), "run-1").cache()

  test("F1: skip filters drop data/binary/junk but keep code + config.json") {
    val pre = pipeline.preprocess(spark.createDataset(fixtureRepo))
    val paths = pre.select("filePath").as[String].collect().toSet
    assert(!paths.contains("data.csv"))
    assert(!paths.contains("img.png"))
    assert(!paths.contains("LICENSE"))
    assert(!paths.contains(".gitignore"))
    assert(!paths.contains("fixtures.json"))
    assert(paths.contains("config.json")) // kept-JSON
    assert(paths.contains("src/main.py"))
    assert(paths.contains("Dockerfile"))
  }

  test("P1: language tagging incl. special cases") {
    val pre = pipeline.preprocess(spark.createDataset(fixtureRepo))
    val langs = pre.select("filePath", "language").as[(String, String)].collect().toMap
    assert(langs("src/main.py") == "python")
    assert(langs("Main.java") == "java")
    assert(langs("app.scala") == "scala")
    assert(langs("script.sh") == "bash")
    assert(langs("Dockerfile") == "dockerfile")
    assert(langs("docker-compose.yml") == "docker-compose")
    assert(langs("unknown.xyz") == "xyz") // fallback = ext
  }

  test("A4: manifest → component_kind=service") {
    val pre = pipeline.preprocess(spark.createDataset(fixtureRepo))
    assert(pre.select("componentKind").distinct().as[String].collect().toSeq == Seq("service"))
  }

  test("all five scopes populated with lineage") {
    val counts = corpus.groupBy("scope").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Node.Scopes.forall(s => counts.getOrElse(s, 0L) > 0), s"scopes: $counts")
    // long python file (>4000 chars, 806 lines) chunks into >1 chunk
    // under BOTH splitters (structural cap 4000 chars; windows 200 lines)
    val mainChunks = corpus.filter(col("scope") === "chunk" &&
      col("filePath") === "src/main.py").count()
    assert(mainChunks >= 2)
    // file rollup lineage points at real chunk ids
    val chunkIds = corpus.filter(col("scope") === "chunk")
      .select("rowId").as[String].collect().toSet
    val fileNode = corpus.filter(col("scope") === "file" &&
      col("filePath") === "src/main.py").as[Node].head()
    assert(fileNode.rollupOf.nonEmpty && fileNode.rollupOf.forall(chunkIds.contains))
    assert(fileNode.rollupCount == fileNode.rollupOf.size)
  }

  test("catalog node carries zero run id; chunks carry the real one") {
    val cat = corpus.filter(col("scope") === "catalog").as[Node].head()
    assert(cat.ingestRunId == IngestPipeline.ZeroRunId)
    val chunk = corpus.filter(col("scope") === "chunk").as[Node].head()
    assert(chunk.ingestRunId == "run-1")
  }

  test("L5: BAD readme + key files → catalog from entry-point samples") {
    def d(path: String, text: String) = RawDoc("ns", "badrepo", "main", path, text)
    val repo = Seq(
      d("README.md", "# TODO\ntodo: write me"),
      d("src/main.py", "def main_entry(): pass"),
      d("src/zz_util.py", "def zz_helper(): pass"))
    val c = pipeline.buildCorpus(spark.createDataset(repo), "run-l5")
    val cat = c.filter(col("scope") === "catalog").as[Node].head()
    assert(cat.text.contains("main_entry"), cat.text)
    assert(!cat.text.contains("zz_helper"), cat.text)
  }

  test("L5 fallback: BAD readme, no key files → catalog from code summaries") {
    def d(path: String, text: String) = RawDoc("ns", "plainrepo", "main", path, text)
    val repo = Seq(
      d("README.md", "# TODO\ntodo: write me"),
      d("src/zz_util.py", "def zz_helper(): pass"))
    val c = pipeline.buildCorpus(spark.createDataset(repo), "run-l5b")
    val cat = c.filter(col("scope") === "catalog").as[Node].head()
    assert(cat.text.contains("zz_helper"), cat.text)
  }

  test("metered ingest records wall + task metrics per stage") {
    val out = java.nio.file.Files.createTempDirectory("metered").toString
    val (run, metrics) = pipeline.runWithMetrics(
      spark.createDataset(fixtureRepo), s"$out/corpus", "run-metrics")
    assert(run.nodeCount > 0)
    val byStage = metrics.map(m => m.stage -> m).toMap
    assert(byStage.keySet == Set("preprocess", "chunk_enrich_embed",
      "file_rollup", "module_rollup", "repo_rollup", "catalog", "write",
      "audit"),
      byStage.keySet.toString)
    assert(metrics.forall(_.wallMs >= 0))
    assert(metrics.forall(_.runId == "run-metrics"))
    // every stage forces at least one Spark job → tasks attributed
    assert(metrics.map(_.tasks).sum > 0, metrics.toString)
    assert(byStage("chunk_enrich_embed").tasks > 0)
    // the corpus written by the metered run is complete (all five scopes)
    val scopes = spark.read.parquet(s"$out/corpus")
      .select("scope").distinct().as[String].collect().toSet
    assert(scopes == Set("chunk", "file", "module", "repo", "catalog"))
  }

  test("metrics export: gauge artifact carries the reference's 8 stage levels") {
    import graft.ingest.IngestMetrics
    val out = java.nio.file.Files.createTempDirectory("gauges").toString
    val (_, metrics) = pipeline.runWithMetrics(
      spark.createDataset(fixtureRepo), s"$out/corpus", "run-gauges")
    IngestMetrics.exportGauges(spark, metrics, s"$out/metrics",
      repo = "fixrepo", namespace = "ns", branch = "main")
    val rows = spark.read.parquet(s"$out/metrics")
    // the pushgateway sample twin (ingest_controller.py:114-152): one
    // ingest_stage_run_seconds gauge per stage level, fully labeled
    val levels = rows.select("level").as[String].collect().toSet
    assert(levels == Set("preprocess", "code_nodes", "catalog",
      "file_summaries", "module_summaries", "repo_summaries",
      "vector_write", "audit_and_clean"), levels.toString)
    assert(rows.select("metric_name").distinct().as[String].collect().toSeq ==
      Seq("ingest_stage_run_seconds"))
    val sample = rows.as[IngestMetrics.GaugeSample].collect().head
    assert(sample.repo == "fixrepo" && sample.namespace == "ns" &&
      sample.branch == "main" && sample.run_id == "run-gauges")
    assert(rows.as[IngestMetrics.GaugeSample].collect().forall(_.value >= 0.0))
    // append semantics: a second run lands next to the first
    IngestMetrics.exportGauges(spark, metrics, s"$out/metrics",
      repo = "fixrepo", namespace = "ns", branch = "main")
    assert(spark.read.parquet(s"$out/metrics").count() == rows.count() * 2)
  }

  test("embeddings are normalized and fixed-dim") {
    val embs = corpus.select("embedding").as[Array[Float]].collect()
    assert(embs.forall(_.length == 64))
    embs.filter(_.exists(_ != 0f)).foreach { v =>
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3)
    }
  }

  test("imports/symbol/topics populated (SURVEY §7.7)") {
    val py = corpus.filter(col("scope") === "chunk" &&
      col("filePath") === "src/util/helpers.py").as[Node].head()
    assert(py.imports.contains("json"))
    assert(py.symbol == "helper")
    val java = corpus.filter(col("scope") === "chunk" &&
      col("filePath") === "Main.java").as[Node].head()
    assert(java.imports.exists(_.startsWith("java.util")))
  }

  test("ingest is deterministic (same input → same row ids)") {
    val again = pipeline.buildCorpus(spark.createDataset(fixtureRepo), "run-1")
    val a = corpus.select("rowId").as[String].collect().sorted
    val b = again.select("rowId").as[String].collect().sorted
    assert(a.toSeq == b.toSeq)
  }

  test("S5+S6: write partitions by scope and audits chunk count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    val run = pipeline.write(corpus, s"$dir/corpus", "run-1")
    val written = spark.read.parquet(s"$dir/corpus")
    assert(written.count() == corpus.count())
    val chunkCount = corpus.filter(col("scope") === "chunk").count()
    assert(run.nodeCount == chunkCount)
    // partition pruning surface: scope dirs exist
    val scopeDirs = new java.io.File(s"$dir/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(Node.Scopes.forall(s => scopeDirs.contains(s"scope=$s")))
  }

  test("S5 via sink trait: connector batching matches the reference write semantics") {
    import graft.sources.{ConnectorCorpusSink, SinkDoc}
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val key = "sink-spec-1"
    RecordingWriter.reset(key)
    val run = pipeline.write(corpus,
      new ConnectorCorpusSink(new RecordingWriter(key), batchSize = 3),
      s"$dir/corpus", "run-1")
    val calls = RecordingWriter.calls(key)

    // scopes flow in the fixed catalog→…→chunk order to per-scope tables
    val scopesSeen = calls.map(_._1).distinct
    assert(scopesSeen == Node.Scopes.filter(s => scopesSeen.contains(s)))
    assert(calls.forall { case (s, t, _) =>
      t == ConnectorCorpusSink.DefaultTables(s) })
    // batches bounded, every node delivered exactly once, ids stable
    assert(calls.forall(_._3.length <= 3))
    val delivered = calls.flatMap(_._3)
    val expected = corpus.collect()
    assert(delivered.length == expected.length)
    assert(delivered.map(_.id).sorted.toSeq ==
      expected.map(_.rowId).sorted.toSeq)
    // metadata: string-only, allow-listed (+ shredded list keys + scope)
    calls.foreach { case (scope, _, batch) =>
      val allowed = ConnectorCorpusSink.AllowFields(scope).toSet
      batch.foreach { d: SinkDoc =>
        d.meta.keys.foreach { k =>
          val base = k.split(":", 2).head
          assert(allowed.contains(base) || k == "scope",
            s"$scope meta key '$k' not allow-listed")
        }
        assert(d.meta("scope") == scope)
      }
    }
    // chunk audit count matches without a parquet read-back
    assert(run.nodeCount == corpus.filter(col("scope") === "chunk").count())
    // idempotence contract: a re-run delivers the identical id set
    RecordingWriter.reset(key)
    new ConnectorCorpusSink(new RecordingWriter(key), batchSize = 3)
      .write(corpus, "run-1")
    val redelivered = RecordingWriter.calls(key).flatMap(_._3).map(_.id)
    assert(redelivered.sorted.toSeq == delivered.map(_.id).sorted.toSeq)
  }

  test("retrying writer: transient upsert failures recover; terminal ones rethrow") {
    import graft.sources.{RetryingScopeBatchWriter, ScopeBatchWriter, SinkDoc}
    val attempts = new java.util.concurrent.atomic.AtomicInteger
    class Flaky(failFirst: Int) extends ScopeBatchWriter {
      override def upsert(s: String, t: String, b: Seq[SinkDoc]): Unit =
        if (attempts.incrementAndGet() <= failFirst)
          throw new RuntimeException("transient")
    }
    val doc = SinkDoc("id1", "t", Array.empty[Float], Map.empty)
    // 2 transient failures then success, within the 3-attempt budget
    new RetryingScopeBatchWriter(new Flaky(2), maxAttempts = 3, baseBackoffMs = 1)
      .upsert("chunk", "embeddings", Seq(doc))
    assert(attempts.get() == 3)
    // persistent failure exhausts the budget and rethrows (Spark task
    // retry then owns the failure)
    attempts.set(0)
    val e = intercept[RuntimeException] {
      new RetryingScopeBatchWriter(new Flaky(99), maxAttempts = 3, baseBackoffMs = 1)
        .upsert("chunk", "embeddings", Seq(doc))
    }
    assert(e.getMessage == "transient" && attempts.get() == 3)
  }

  test("deduping writer: replayed batches apply once, failed writes leave no receipt") {
    import graft.sources.{DedupingScopeBatchWriter, InMemoryTokenLedger,
      RetryingScopeBatchWriter, ScopeBatchWriter, SinkDoc}
    val writes = new java.util.concurrent.atomic.AtomicInteger
    val failures = new java.util.concurrent.atomic.AtomicInteger
    class Store extends ScopeBatchWriter {
      override def upsert(s: String, t: String, b: Seq[SinkDoc]): Unit = {
        if (failures.getAndDecrement() > 0) throw new RuntimeException("boom")
        writes.incrementAndGet()
      }
    }
    failures.set(0)
    InMemoryTokenLedger.reset("idem-spec")
    val ledger = new InMemoryTokenLedger("idem-spec")
    val w = new DedupingScopeBatchWriter(new Store, ledger)
    val b1 = Seq(SinkDoc("a", "ta", Array(1f), Map("k" -> "v")),
      SinkDoc("b", "tb", Array(2f), Map.empty))
    // replay of an identical batch is skipped — including in reversed
    // delivery order (the token is content-derived, order-independent)
    w.upsert("chunk", "embeddings", b1)
    w.upsert("chunk", "embeddings", b1)
    w.upsert("chunk", "embeddings", b1.reverse)
    assert(writes.get() == 1, "identical batch must land exactly once")
    // a different batch (same ids, changed content) is NOT a replay
    w.upsert("chunk", "embeddings", b1.map(d => d.copy(text = d.text + "!")))
    assert(writes.get() == 2)
    // same content, different table → different token
    w.upsert("chunk", "embeddings_file", b1)
    assert(writes.get() == 3)

    // commit-after-write: a failed write leaves no receipt, so the retry
    // layer (composed INSIDE the dedup layer) still lands the batch
    InMemoryTokenLedger.reset("idem-spec")
    writes.set(0); failures.set(1)
    val wr = new DedupingScopeBatchWriter(
      new RetryingScopeBatchWriter(new Store, maxAttempts = 3, baseBackoffMs = 1),
      new InMemoryTokenLedger("idem-spec"))
    wr.upsert("chunk", "embeddings", b1)
    assert(writes.get() == 1, "retry after transient failure must write")
    wr.upsert("chunk", "embeddings", b1)
    assert(writes.get() == 1, "replay after commit must be skipped")
  }

  test("S5 end-to-end: a re-run through the deduping connector sink delivers nothing") {
    import graft.sources.{ConnectorCorpusSink, DedupingScopeBatchWriter,
      InMemoryTokenLedger}
    val key = "sink-idem-1"
    RecordingWriter.reset(key)
    InMemoryTokenLedger.reset(key)
    val sink = new ConnectorCorpusSink(
      new DedupingScopeBatchWriter(new RecordingWriter(key),
        new InMemoryTokenLedger(key)), batchSize = 3)
    sink.write(corpus, "run-1")
    val first = RecordingWriter.calls(key).flatMap(_._3).map(_.id).sorted
    assert(first.nonEmpty)
    sink.write(corpus, "run-1")
    val second = RecordingWriter.calls(key).flatMap(_._3).map(_.id).sorted
    assert(second == first, "re-run must not re-deliver any batch")
  }

  test("P5: spillover meta sanitized to string-string") {
    val out = IngestPipeline.sanitizeMeta(Map(
      "s" -> "x", "i" -> 7, "b" -> true,
      "seq" -> Seq("a", "b"), "arr" -> Array(1, 2),
      "map" -> Map("k" -> "v"),
      "opt" -> Some(3), "none" -> None, "nul" -> null))
    assert(out == Map(
      "s" -> "x", "i" -> "7", "b" -> "true",
      "seq" -> "a,b", "arr" -> "1,2",
      "map" -> "{\"k\":\"v\"}", "opt" -> "3"))
  }

  test("S1/F5: repo enumeration filters forks/archived/private") {
    import graft.model.RepoRef
    val listed = Seq(
      RepoRef("ns", "keep", "main", isFork = false, isArchived = false, isPrivate = false),
      RepoRef("ns", "fork", "main", isFork = true, isArchived = false, isPrivate = false),
      RepoRef("ns", "arch", "main", isFork = false, isArchived = true, isPrivate = false),
      RepoRef("ns", "priv", "main", isFork = false, isArchived = false, isPrivate = true))
    val kept = graft.sources.CorpusStore.eligibleRepos(spark, listed).collect()
    assert(kept.map(_.name).toSeq == Seq("keep"))
    val withForks = graft.sources.CorpusStore.eligibleRepos(spark, listed,
      includeForks = true).collect()
    assert(withForks.map(_.name).toSet == Set("keep", "fork"))
  }

  test("S2/S3: repo-dir reader + raw debug dump round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-repo")
    java.nio.file.Files.createDirectories(dir.resolve("src"))
    java.nio.file.Files.writeString(dir.resolve("src/a.py"), "print(1)\n")
    java.nio.file.Files.writeString(dir.resolve("README.md"), "# hi\n")
    val docs = graft.sources.CorpusStore.readRepoDir(
      spark, dir.toString, "ns", "r1").collect()
    assert(docs.length == 2)
    val py = docs.find(_.filePath == "src/a.py").get
    assert(py.text == "print(1)\n" && py.namespace == "ns" && py.repo == "r1")
    val dump = java.nio.file.Files.createTempDirectory("graft-dump").toString
    graft.sources.CorpusStore.dumpJson(
      spark.createDataset(docs.toSeq).toDF(), s"$dump/raw")
    assert(spark.read.json(s"$dump/raw").count() == 2)
  }

  test("S8: health check reports scope counts, llm and embedder status") {
    val dir = java.nio.file.Files.createTempDirectory("graft-health").toString
    pipeline.write(corpus, s"$dir/corpus", "run-1")
    val st = graft.sources.Health.check(spark, s"$dir/corpus",
      new graft.llm.StubLlm, new graft.llm.HashEmbedder(64))
    assert(st.corpusUp && st.llmUp && st.embedderUp)
    assert(st.scopeCounts.keySet == graft.model.Node.Scopes.toSet)
    val down = graft.sources.Health.check(spark, s"$dir/nope",
      new graft.llm.StubLlm, new graft.llm.HashEmbedder(64))
    assert(!down.corpusUp && down.detail.contains("DOWN"))
  }

  test("ingest content is invariant to input partitioning") {
    val a = pipeline.buildCorpus(spark.createDataset(fixtureRepo), "run-1")
      .collect().map(n => (n.rowId, n.scope, n.text, n.summary,
        n.rollupOf.mkString(","), n.language)).sortBy(_._1)
    val b = pipeline.buildCorpus(
      spark.createDataset(fixtureRepo).repartition(7), "run-1")
      .collect().map(n => (n.rowId, n.scope, n.text, n.summary,
        n.rollupOf.mkString(","), n.language)).sortBy(_._1)
    assert(a.toSeq == b.toSeq,
      "node content must not depend on partition layout")
  }

  test("C2 structural default: chunks reconstruct each file, defs stay whole") {
    // structural chunking is the DEFAULT (the reference's AST splitter is
    // its default path) — this exercises the default-constructed pipeline
    val structPipe = new IngestPipeline(new StubLlm, new HashEmbedder(64))
    val corpus2 = structPipe.buildCorpus(spark.createDataset(fixtureRepo), "run-s")
    val chunks = corpus2.filter(col("scope") === "chunk").as[Node].collect()
    // every source file reconstructs exactly from its ordered chunks —
    // the structural splitter's zero-overlap coverage invariant, which the
    // windowed default cannot offer
    val byFile = chunks.groupBy(_.filePath)
    val sources = fixtureRepo.map(r => r.filePath -> r.text).toMap
    byFile.foreach { case (path, cs) =>
      val rebuilt = cs.sortBy(_.meta("chunk_index").toInt).map(_.text).mkString
      assert(rebuilt == sources(path), s"$path not reconstructed")
    }
    // the 806-line python file: def main() lands whole inside one chunk
    val mainChunks = byFile("src/main.py").sortBy(_.meta("chunk_index").toInt)
    val defChunk = mainChunks.filter(_.text.contains("def main():"))
    assert(defChunk.length == 1)
    assert(defChunk.head.text.contains("def main():\n    print('hello')"))
    // all five scopes still populated (rollups unaffected by splitter)
    val scopes = corpus2.select("scope").distinct().as[String].collect().toSet
    assert(graft.model.Node.Scopes.forall(scopes.contains))
  }

  test("windowed fallback (structuralChunking=false) keeps reference windows") {
    val winPipe = new IngestPipeline(new StubLlm, new HashEmbedder(64),
      structuralChunking = false)
    val corpus2 = winPipe.buildCorpus(spark.createDataset(fixtureRepo), "run-w")
    val chunks = corpus2.filter(col("scope") === "chunk").as[Node].collect()
    // the fallback is the reference's fixed-window splitter: chunk sizes
    // bounded by the 4000-char code cap, >1 chunk for the long file
    assert(chunks.forall(_.text.length <= 4200)) // cap + boundary snap slack
    assert(chunks.count(_.filePath == "src/main.py") > 1)
    val scopes = corpus2.select("scope").distinct().as[String].collect().toSet
    assert(graft.model.Node.Scopes.forall(scopes.contains))
  }
}

/** Test double for [[graft.sources.ScopeBatchWriter]]: upserts run on
  * executor threads, so calls land in a JVM-static registry (valid in
  * local mode, where executors share the test JVM). */
class RecordingWriter(key: String) extends graft.sources.ScopeBatchWriter {
  override def upsert(scope: String, table: String,
      batch: Seq[graft.sources.SinkDoc]): Unit =
    RecordingWriter.record(key, (scope, table, batch))
}

object RecordingWriter {
  private val reg = scala.collection.concurrent.TrieMap
    .empty[String, scala.collection.mutable.ArrayBuffer[
      (String, String, Seq[graft.sources.SinkDoc])]]
  def reset(key: String): Unit =
    reg.put(key, scala.collection.mutable.ArrayBuffer.empty)
  def record(key: String, call: (String, String, Seq[graft.sources.SinkDoc])): Unit =
    reg(key).synchronized { reg(key) += call }
  def calls(key: String): Seq[(String, String, Seq[graft.sources.SinkDoc])] =
    reg(key).synchronized { reg(key).toSeq }
}
