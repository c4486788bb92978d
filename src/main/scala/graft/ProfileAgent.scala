package graft

import graft.agent.AgentLoop
import graft.llm.{HashEmbedder, StubLlm}
import graft.model.QueryRequest
import graft.queries.RagQueries
import graft.streaming.JobStream
import org.apache.spark.sql.SparkSession

/** Dev tool: wall-time breakdown of the rag_agent_events path at a given
  * SF — corpus build, cache materialization, then each agent job (run
  * sequentially so per-job cost is attributable). */
object ProfileAgent {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    // per-Spark-stage cost of the (single-action) lazy corpus build
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val rt = Option(i.taskMetrics).map(_.executorRunTime).getOrElse(-1L)
          val wall = (for { t0 <- i.submissionTime; t1 <- i.completionTime }
            yield t1 - t0).getOrElse(-1L)
          println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%3d " +
            f"wall=${wall}%5dms taskTime=${rt}%6dms  ${i.name.take(90)}")
        }
      })

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val c = timed("corpus build+count") {
      val df = RagQueries.corpusFor(spark, sfDir); df.count(); df
    }
    val agent = new AgentLoop(new StubLlm, new HashEmbedder(384))
    val jobs = Seq(
      "job-1" -> QueryRequest("error handling in query code"),
      "job-2" -> QueryRequest("give me an overview of the architecture"),
      "job-3" -> QueryRequest("describe the src3 project", repoName = Some("src3")))
    jobs.foreach { case (id, req) =>
      val evs = timed(s"$id (${req.query.take(30)})") {
        JobStream.runJob(c, agent, id, req)
      }
      evs.foreach(e => println(s"    ${e.event}: ${e.data.take(120)}"))
    }
    timed("all 3 concurrent") { JobStream.runJobs(c, agent, jobs) }
    val batchJobs = Seq(
      "batch-1" -> QueryRequest("error handling in query code"),
      "batch-2" -> QueryRequest("give me an overview of the architecture"),
      "batch-3" -> QueryRequest("how is the parser class implemented"),
      "batch-4" -> QueryRequest("where are the config settings loaded"),
      "batch-5" -> QueryRequest("describe the src3 project", repoName = Some("src3")))
    timed("5 batched (cold plans)") { JobStream.runJobsBatched(c, agent, batchJobs) }
    timed("5 batched (warm)") { JobStream.runJobsBatched(c, agent, batchJobs) }
    timed("5 threaded") { JobStream.runJobs(c, agent, batchJobs) }

    // ---- the rag_agent_batch_gate stage table (VERDICT r8 item 3) ----
    // the gate runs BOTH halves by design (parity proof); attribute its
    // wall: batched half, then each sequential job, then the raw
    // retrieval kernel so the per-job floor is visible
    println("[gate] ---- qAgentBatchGate-shaped breakdown (warm) ----")
    val jobCounter = new org.apache.spark.scheduler.SparkListener {
      var n = 0L
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        synchronized { n += 1 }
    }
    spark.sparkContext.addSparkListener(jobCounter)
    def gateTimed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val j0 = jobCounter.synchronized(jobCounter.n)
      val r = f
      val j1 = jobCounter.synchronized(jobCounter.n)
      println(f"[gate] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        f"(${j1 - j0} spark jobs)")
      r
    }
    gateTimed("batched half (5 jobs)") {
      JobStream.runJobsBatched(c, agent, batchJobs)
    }
    batchJobs.foreach { case (id, req) =>
      gateTimed(s"sequential $id") { JobStream.runJob(c, agent, id, req) }
    }
    // the retrieval kernel alone, warm — the sequential floor per round
    val emb = new HashEmbedder(384)
    (1 to 3).foreach { i =>
      gateTimed(s"raw retrieve (chunk scope) #$i") {
        graft.retrieval.Retrieval.retrieve(
          c, emb, "error handling in query code", "chunk")
      }
    }
    spark.stop()
  }
}
