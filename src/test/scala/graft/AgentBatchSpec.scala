package graft

import graft.agent.AgentLoop
import graft.llm.{HashEmbedder, StubLlm}
import graft.model.{Node, QueryRequest}
import graft.retrieval.{BatchRetrieval, Retrieval}
import graft.streaming.JobStream
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Multi-query fan-out: per-query parity with the sequential agent loop,
  * and the scan-amortization guarantee (Spark job count independent of
  * the number of queries in a scope group). */
class AgentBatchSpec extends SparkSpec {
  import spark.implicits._

  val embedder = new HashEmbedder(64)

  def mkNode(id: String, scope: String, repo: String, module: String,
             path: String, text: String, topics: Seq[String] = Nil): Node =
    Node.empty.copy(rowId = id, scope = scope, namespace = "ns", repo = repo,
      branch = "main", module = module, filePath = path, text = text,
      topics = topics, embedding = embedder.embed(text))

  lazy val corpus = spark.createDataset(Seq(
    mkNode("c1", "chunk", "payments", "api", "api/retry.py",
      "def retry_with_backoff(attempts): pass", Seq("retry", "backoff")),
    mkNode("c2", "chunk", "payments", "api", "api/client.py",
      "class PaymentsClient: pass", Seq("client")),
    mkNode("c3", "chunk", "payments", "core", "core/ledger.py",
      "def post_ledger_entry(tx): pass", Seq("ledger")),
    mkNode("c4", "chunk", "search", "idx", "idx/build.py",
      "def build_index(docs): pass", Seq("index")),
    mkNode("c5", "chunk", "search", "idx", "idx/query.py",
      "def run_query(q): pass", Seq("query")),
    mkNode("c6", "chunk", "search", "rank", "rank/score.py",
      "def score_hits(hits): pass", Seq("rank")),
    mkNode("c7", "chunk", "payments", "core", "core/config.py",
      "CONFIG = load_settings('payments.yaml')", Seq("config")),
    mkNode("f1", "file", "payments", "api", "api/retry.py",
      "Summary: retry helpers with exponential backoff"),
    mkNode("r1", "repo", "payments", "", "",
      "Payments service: clients, retries, ledger"),
    mkNode("r2", "repo", "search", "", "",
      "Search service: index build and ranking"),
    mkNode("k1", "catalog", "payments", "", "",
      "Catalog: payments repo overview and architecture"),
    mkNode("k2", "catalog", "search", "", "",
      "Catalog: search repo overview"))).toDF().cache()

  val reqs = Seq(
    "j1" -> QueryRequest("error handling in retry code"),
    "j2" -> QueryRequest("give me an overview of the architecture"),
    "j3" -> QueryRequest("how is the ledger class implemented"),
    "j4" -> QueryRequest("where are the config settings loaded"))

  /** Spark job count for `body` — listener events are async, so poll
    * until the counter stabilizes. */
  def countJobs(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var prev = -1
      var waited = 0
      while (n.get() != prev && waited < 5000) {
        prev = n.get(); Thread.sleep(200); waited += 200
      }
      n.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("runBatch states are identical to the sequential loop's, per query") {
    corpus.count()
    val agent = new AgentLoop(new StubLlm, embedder)
    val sequential = reqs.map { case (id, r) => id -> agent.run(corpus, r) }
    val batched = agent.runBatch(corpus, reqs)
    assert(batched.map(_._1) == reqs.map(_._1), "input order preserved")
    sequential.zip(batched).foreach { case ((id, s), (_, b)) =>
      assert(b.docs == s.docs, s"$id: docs diverge")
      assert(b.answer == s.answer, s"$id: answer diverges")
      assert(b.scope == s.scope && b.attempt == s.attempt &&
        b.filters == s.filters, s"$id: loop state diverges")
      assert(b.debug == s.debug, s"$id: event breadcrumbs diverge")
    }
  }

  test("property: batch/sequential parity holds on a seeded random corpus") {
    // the fixture corpus exercises the happy path; a randomized corpus
    // (random repos/modules/topics, tie-prone texts, mixed scopes)
    // stresses ranking ties, empty hops and filter interactions
    val rnd = new scala.util.Random(11)
    val scopes = graft.model.Node.Scopes
    val nodes = (0 until 80).map { i =>
      val repo = s"r${rnd.nextInt(4)}"
      val module = s"m${rnd.nextInt(3)}"
      mkNode(f"n$i%03d", scopes(rnd.nextInt(scopes.length)), repo, module,
        s"$module/f${rnd.nextInt(5)}.py",
        // small text vocabulary → frequent identical embeddings → ties
        Seq.fill(3 + rnd.nextInt(4))(s"w${rnd.nextInt(12)}").mkString(" "),
        Seq.fill(rnd.nextInt(3))(s"t${rnd.nextInt(6)}"))
    }
    val rcorpus = spark.createDataset(nodes).toDF().cache()
    rcorpus.count()
    val specs = (0 until 6).map { i =>
      BatchRetrieval.Spec(s"q$i", Seq.fill(4)(s"w${rnd.nextInt(12)}").mkString(" "),
        scopes(rnd.nextInt(scopes.length)),
        if (i % 3 == 0) Map("repo" -> s"r${rnd.nextInt(4)}") else Map.empty)
    }
    val batched = BatchRetrieval.retrieveAll(rcorpus, embedder, specs)
    specs.foreach { sp =>
      val seq = Retrieval.retrieveResult(rcorpus, embedder, sp.query, sp.scope, sp.filters)
      val bat = batched(sp.id)
      assert(bat.docs == seq.docs, s"${sp.id} (${sp.scope}, ${sp.filters}): docs diverge")
      assert(bat.exhausted == seq.exhausted, s"${sp.id}: exhausted flag diverges")
    }
  }

  test("retrieveAllNoExpand parity: Eager and Mmr match retrieveResult per query") {
    // the rag gate remedy (VERDICT r10 item 6): one scan serves every
    // expand=false pool; ids, scores, order, exhausted must equal the
    // sequential serving path's for BOTH strategies — including on the
    // tie-prone randomized corpus
    val rnd = new scala.util.Random(23)
    val scopes = graft.model.Node.Scopes
    val nodes = (0 until 80).map { i =>
      val repo = s"r${rnd.nextInt(4)}"
      val module = s"m${rnd.nextInt(3)}"
      mkNode(f"n$i%03d", scopes(rnd.nextInt(scopes.length)), repo, module,
        s"$module/f${rnd.nextInt(5)}.py",
        Seq.fill(3 + rnd.nextInt(4))(s"w${rnd.nextInt(12)}").mkString(" "),
        Seq.fill(rnd.nextInt(3))(s"t${rnd.nextInt(6)}"))
    }
    val rcorpus = spark.createDataset(nodes).toDF().cache()
    rcorpus.count()
    val specs = (0 until 6).map { i =>
      BatchRetrieval.Spec(s"q$i", Seq.fill(4)(s"w${rnd.nextInt(12)}").mkString(" "),
        scopes(rnd.nextInt(scopes.length)),
        if (i % 3 == 0) Map("repo" -> s"r${rnd.nextInt(4)}") else Map.empty)
    }
    for (strategy <- Seq(Retrieval.Eager, Retrieval.Mmr(0.35))) {
      val batched = BatchRetrieval.retrieveAllNoExpand(
        rcorpus, embedder, specs, strategy)
      specs.foreach { sp =>
        val seq = Retrieval.retrieveResult(rcorpus, embedder, sp.query,
          sp.scope, sp.filters, expand = false, strategy = strategy)
        val bat = batched(sp.id)
        assert(bat.docs == seq.docs,
          s"${sp.id} ($strategy, ${sp.scope}, ${sp.filters}): docs diverge")
        assert(bat.exhausted == seq.exhausted,
          s"${sp.id} ($strategy): exhausted flag diverges")
      }
    }
  }

  test("retrieveAllNoExpand job count is O(scope groups), not O(queries)") {
    corpus.count()
    val mk = (n: Int) => (0 until n).map(i => BatchRetrieval.Spec(
      s"q$i", s"query about topic $i", "chunk"))
    // warm codegen/planner caches
    BatchRetrieval.retrieveAllNoExpand(corpus, embedder, mk(1))
    val jobs2 = countJobs(BatchRetrieval.retrieveAllNoExpand(corpus, embedder, mk(2)))
    val jobs6 = countJobs(BatchRetrieval.retrieveAllNoExpand(corpus, embedder, mk(6)))
    assert(jobs6 <= jobs2 + 1,
      s"job count grew with query count: 2 queries=$jobs2, 6 queries=$jobs6")
  }

  test("retrieveAllNoExpand plan: one scan, broadcast queries, group-limited window") {
    // the 100 TB shape the batched gate engine claims: the per-query
    // top-k must be a WindowGroupLimit (per-partition top-k BEFORE the
    // exchange — the shuffle carries ≤ k rows per query per map
    // partition, never every scored row), the query table must arrive
    // broadcast, and the whole call must run as ONE collected plan
    corpus.count()
    val specs = (0 until 5).map(i =>
      BatchRetrieval.Spec(s"q$i", s"retrieval query number $i", "chunk"))
    BatchRetrieval.retrieveAllNoExpand(corpus, embedder, specs) // warm
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { plans.add(qe.executedPlan.toString); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      BatchRetrieval.retrieveAllNoExpand(corpus, embedder, specs)
      // listener events are async; poll briefly for the plan to land
      var waited = 0
      while (plans.isEmpty && waited < 50) { Thread.sleep(100); waited += 1 }
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    val got = plans.asScala.toSeq
    assert(got.length == 1, s"expected ONE executed plan, got ${got.length}")
    val p = got.head
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-k must group-limit below the exchange:\n$p")
    assert(p.contains("Broadcast"),
      s"the (qid, qvec) table must broadcast into the scan:\n$p")
  }

  test("batched retrieval scan count is O(scope groups), not O(queries)") {
    corpus.count()
    val specs = Seq(
      BatchRetrieval.Spec("q1", "retry with backoff attempts", "chunk"),
      BatchRetrieval.Spec("q2", "build the search index", "chunk"),
      BatchRetrieval.Spec("q3", "post a ledger entry", "chunk"),
      BatchRetrieval.Spec("q4", "load config settings", "chunk"))
    // warm codegen/window paths so neither side pays first-use jobs
    BatchRetrieval.retrieveAll(corpus, embedder, specs.take(1))
    Retrieval.retrieveResult(corpus, embedder, specs.head.query, "chunk")

    // AQE materializes each windowed stage as 2 jobs (shuffle map + final)
    // — still ONE corpus scan per stage. The invariant is therefore not an
    // absolute job count but INDEPENDENCE from Q: 4 queries in one scope
    // group must launch exactly the jobs 2 queries do (stages = 1 seed +
    // ≤ maxDepth hops), while the sequential loop pays per query.
    // (A 1-query "group" intentionally short-circuits to the sequential
    // path, so the batched baseline is the smallest real group: 2.)
    val twoQueryJobs = countJobs {
      BatchRetrieval.retrieveAll(corpus, embedder, specs.take(2))
    }
    val batchJobs = countJobs {
      BatchRetrieval.retrieveAll(corpus, embedder, specs)
    }
    val seqJobs = countJobs {
      specs.foreach(sp =>
        Retrieval.retrieveResult(corpus, embedder, sp.query, sp.scope))
    }
    info(s"one scope group: 2 queries=$twoQueryJobs jobs, 4 queries=$batchJobs " +
      s"jobs, sequential 4x=$seqJobs jobs")
    assert(batchJobs == twoQueryJobs,
      s"job count must not grow with Q: $twoQueryJobs vs $batchJobs")
    assert(seqJobs >= specs.length, "sequential pays ≥1 scan per query")
    assert(batchJobs < seqJobs)
  }

  test("oversized groups take the relational path and keep per-query parity") {
    // 40 specs in one scope group exceed MaxGroupQueries=32 → the
    // relational (broadcast frontier table) path; outputs must still
    // equal the sequential path query-by-query
    corpus.count()
    val specs = (0 until 40).map(i =>
      BatchRetrieval.Spec(s"big$i", s"retry ledger index w${i % 7}", "chunk"))
    assert(specs.length > BatchRetrieval.MaxGroupQueries)
    val batched = BatchRetrieval.retrieveAll(corpus, embedder, specs)
    specs.take(5).foreach { sp =>
      val seq = Retrieval.retrieveResult(corpus, embedder, sp.query, sp.scope)
      assert(batched(sp.id).docs == seq.docs, s"${sp.id}: docs diverge")
    }
    assert(batched.size == specs.length)
  }

  test("relational path: parity with sequential on the random corpus, with filters") {
    val rnd = new scala.util.Random(23)
    val scopes = graft.model.Node.Scopes
    val nodes = (0 until 80).map { i =>
      val repo = s"r${rnd.nextInt(4)}"
      val module = s"m${rnd.nextInt(3)}"
      mkNode(f"n$i%03d", scopes(rnd.nextInt(scopes.length)), repo, module,
        s"$module/f${rnd.nextInt(5)}.py",
        Seq.fill(3 + rnd.nextInt(4))(s"w${rnd.nextInt(12)}").mkString(" "),
        Seq.fill(rnd.nextInt(3))(s"t${rnd.nextInt(6)}"))
    }
    val rcorpus = spark.createDataset(nodes).toDF().cache()
    rcorpus.count()
    // drive the relational implementation directly (group of 8, below the
    // automatic switch point) so its semantics are tested independently
    // of the MaxGroupQueries routing
    val filt = Map("repo" -> "r1")
    val specs = (0 until 8).map(i =>
      BatchRetrieval.Spec(s"rel$i",
        Seq.fill(4)(s"w${rnd.nextInt(12)}").mkString(" "), "chunk", filt))
    val rel = BatchRetrieval.retrieveGroupRelational(
      rcorpus, embedder, "chunk", filt, specs)
    specs.foreach { sp =>
      val seq = Retrieval.retrieveResult(rcorpus, embedder, sp.query, sp.scope, sp.filters)
      assert(rel(sp.id).docs == seq.docs, s"${sp.id}: docs diverge")
      assert(rel(sp.id).exhausted == seq.exhausted, s"${sp.id}: exhausted diverges")
    }
  }

  test("relational path job count does not grow with Q") {
    corpus.count()
    def specsOf(n: Int) = (0 until n).map(i =>
      BatchRetrieval.Spec(s"s$i", s"retry ledger index w${i % 7}", "chunk"))
    // both sizes are above MaxGroupQueries → both relational; the job
    // count per stage chain must be identical (1 seed + ≤ maxDepth hops,
    // ×2 jobs per windowed stage under AQE), regardless of Q
    BatchRetrieval.retrieveAll(corpus, embedder, specsOf(33)) // warm-up
    val jobs33 = countJobs {
      BatchRetrieval.retrieveAll(corpus, embedder, specsOf(33))
    }
    val jobs48 = countJobs {
      BatchRetrieval.retrieveAll(corpus, embedder, specsOf(48))
    }
    info(s"relational group: Q=33 → $jobs33 jobs, Q=48 → $jobs48 jobs")
    assert(jobs33 == jobs48, s"job count grew with Q: $jobs33 vs $jobs48")
  }

  test("runJobsBatched event trails match runJobs' per job") {
    corpus.count()
    val agent = new AgentLoop(new StubLlm, embedder)
    val batched = JobStream.runJobsBatched(corpus, agent, reqs)
    val threaded = JobStream.runJobs(corpus, agent, reqs)
    assert(batched.map(e => (e.jobId, e.event)) ==
      threaded.map(e => (e.jobId, e.event)))
    // data payloads match too (timestamps excluded)
    assert(batched.map(_.data) == threaded.map(_.data))
  }

  test("runJobsBatched: cancelled job short-circuits, others complete") {
    corpus.count()
    val agent = new AgentLoop(new StubLlm, embedder)
    JobStream.cancel("jx")
    try {
      val events = JobStream.runJobsBatched(corpus, agent,
        Seq("jx" -> QueryRequest("anything"), reqs.head))
      val byJob = events.groupBy(_.jobId)
      assert(byJob("jx").map(_.event) == Seq("started", "final"))
      assert(byJob("jx").last.data.contains("cancelled"))
      assert(byJob(reqs.head._1).exists(_.event == "final"))
    } finally JobStream.clearCancel("jx")
  }
}
