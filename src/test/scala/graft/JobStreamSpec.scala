package graft

import graft.agent.AgentLoop
import graft.llm.{HashEmbedder, StubLlm}
import graft.model.{Node, QueryRequest}
import graft.streaming.JobStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** FIXTURES §4: job-event stream — started/retrieval/final ordering,
  * cancellation, streaming sink via MemoryStream + foreachBatch. */
class JobStreamSpec extends SparkSpec {
  import spark.implicits._

  val embedder = new HashEmbedder(64)
  lazy val corpus = spark.createDataset(Seq(
    Node.empty.copy(rowId = "c1", scope = "chunk", namespace = "ns",
      repo = "payments", module = "api", filePath = "api/retry.py",
      text = "def retry_with_backoff(attempts): pass",
      embedding = embedder.embed("def retry_with_backoff(attempts): pass"))))
    .toDF().cache()
  lazy val agent = new AgentLoop(new StubLlm, embedder)

  test("runJob: started → retrieval → final with sources") {
    val events = JobStream.runJob(corpus, agent, "job1",
      QueryRequest("retry with backoff"))
    assert(events.head.event == "started")
    assert(events.exists(_.event == "plan"), "plan breadcrumb becomes an event")
    assert(events.exists(_.event == "judge"), "judge breadcrumb becomes an event")
    assert(events.map(_.event).takeRight(2) == Seq("retrieval", "final"))
    assert(events.last.data.contains("\"answer\""))
  }

  test("runJob: pre-set cancel flag → cancelled final, no work") {
    JobStream.cancel("job2")
    val events = JobStream.runJob(corpus, agent, "job2", QueryRequest("anything"))
    assert(events.map(_.event) == Seq("started", "final"))
    assert(events.last.data.contains("cancelled"))
    JobStream.clearCancel("job2")
  }

  test("ST1-ST3: streaming job source → events parquet sink") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Int, String)]
    val jobs = input.toDF().toDF("jobId", "query", "topK", "repoName")
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    input.addData(("j1", "retry with backoff", 5, ""), ("j2", "payments client", 5, ""))
    val q = JobStream.start(jobs, corpus, agent, s"$dir/events", s"$dir/ckpt")
    q.awaitTermination(60000)
    val events = spark.read.parquet(s"$dir/events")
    val byJob = events.groupBy("jobId").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byJob.keySet == Set("j1", "j2"))
    assert(byJob.values.forall(_ >= 3))
    // every job has exactly one final event
    val finals = events.filter(col("event") === "final").count()
    assert(finals == 2)

    // ST4 twin: stream the sink back as one job's SSE frames
    val frameDir = java.nio.file.Files.createTempDirectory("graft-sse").toString
    val fq = JobStream.tailFrames(spark, s"$dir/events", "j1")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$frameDir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("sse_frames").start()
    fq.awaitTermination(60000)
    val frames = spark.table("sse_frames").orderBy(col("ts"))
      .select("frame").collect().map(_.getString(0))
    val expected = events.filter(col("jobId") === "j1").count()
    assert(frames.length == expected && frames.nonEmpty)
    assert(frames.forall(f => f.startsWith("data: {\"event\": \"") &&
      f.endsWith("}\n\n")))
    // each frame's payload is one valid JSON object carrying the event
    frames.foreach { f =>
      val body = f.stripPrefix("data: ").stripSuffix("\n\n")
      val parsed = spark.range(1).select(
        from_json(lit(body),
          org.apache.spark.sql.types.StructType.fromDDL("event STRING")).as("j"))
        .select("j.event").collect().head
      assert(!parsed.isNullAt(0), s"unparseable SSE payload: $body")
    }
    // same-millisecond timestamps make intra-job order ties possible —
    // assert presence, not position
    assert(frames.exists(_.contains("\"event\": \"started\"")))
    assert(frames.exists(_.contains("\"event\": \"final\"")))
  }
}
