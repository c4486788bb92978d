package graft.streaming

import graft.agent.AgentLoop
import graft.model.{JobEvent, QueryRequest}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Job orchestration as Structured Streaming (SURVEY §2.10 ST1-ST5).
  *
  * The reference's "streaming" is a Redis/ARQ job queue with progress
  * pub/sub; the Spark-native shape is: a streaming source of job rows
  * (file/Kafka/memory) → `foreachBatch` runs the agent per job →
  * progress/final events append to an events sink which the serving layer
  * tails (the SSE shim is serving, not engine — SURVEY §3.3).
  *
  * Cooperative cancellation (ST5) = a driver-side flag set checked before
  * work, mirroring the Redis `job:{id}:cancel` flag semantics.
  */
object JobStream {

  /** ST5: cooperative cancel flags (process-local twin of the Redis flag). */
  private val cancelled = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def cancel(jobId: String): Unit = cancelled.add(jobId)
  def isCancelled(jobId: String): Boolean = cancelled.contains(jobId)
  def clearCancel(jobId: String): Unit = cancelled.remove(jobId)

  def event(jobId: String, event: String, data: String): JobEvent =
    JobEvent(jobId, event, new java.sql.Timestamp(System.currentTimeMillis()), data)

  /** Run one job → its event trail (started → retrieval → final; error /
    * cancelled paths included — reference worker.py:109-176). `onEvent`
    * fires for each event AS IT IS PRODUCED — `started` before the agent
    * runs, the rest at completion — so a live subscriber (the serving
    * shim's SSE stream, the reference's bus `_notify`) sees progress
    * without waiting for the returned trail. */
  def runJob(
      corpus: DataFrame,
      agent: AgentLoop,
      jobId: String,
      req: QueryRequest,
      onEvent: JobEvent => Unit = _ => ()): Seq[JobEvent] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[JobEvent]
    def emit(e: JobEvent): Unit = { out += e; onEvent(e) }
    emit(event(jobId, "started", s"""{"query":${quote(req.query)}}"""))
    if (isCancelled(jobId)) {
      emit(event(jobId, "final", """{"cancelled":true}"""))
      return out.toSeq
    }
    try {
      stateEvents(jobId, agent.run(corpus, req)).foreach(emit)
    } catch {
      case e: Exception =>
        emit(event(jobId, "error", s"""{"message":${quote(String.valueOf(e.getMessage))}}"""))
    }
    out.toSeq
  }

  /** The completed-state event trail: per-stage progress events from the
    * loop's breadcrumbs (the Spark twin of the reference's _notify
    * pub/sub, agent_graph.py:566-583) — plan / judge / retry stages
    * including filter-tightening retries — then retrieval + final. */
  private def stateEvents(jobId: String, state: graft.model.AgentState): Seq[JobEvent] = {
    val stages = state.debug.map { d =>
      val idx = d.indexOf(':')
      val (stage, detail) =
        if (idx > 0) (d.take(idx), d.drop(idx + 1).trim) else ("debug", d)
      event(jobId, stage, s"""{"detail":${quote(detail)}}""")
    }
    stages :+
      event(jobId, "retrieval",
        s"""{"attempts":${state.attempt},"hits":${state.docs.length}}""") :+
      event(jobId, "final",
        s"""{"answer":${quote(state.answer.getOrElse(""))},"sources":${state.docs.length}}""")
  }

  /** Run independent jobs with their retrievals BATCHED through
    * [[graft.agent.AgentLoop.runBatch]]: one corpus scan per
    * (scope, filters) group per retrieval stage, however many jobs are in
    * flight — the scan-amortized alternative to [[runJobs]]'s
    * thread-overlap (which still issues per-query scans). Event trails
    * match [[runJob]]'s per job, concatenated in input order; cancelled
    * jobs short-circuit as usual. A retrieval failure inside the shared
    * batch fails every non-cancelled job in it (one error event each) —
    * the batch is one Spark program, so per-job isolation belongs to the
    * caller's batching policy, not this runner. */
  def runJobsBatched(
      corpus: DataFrame,
      agent: AgentLoop,
      jobs: Seq[(String, QueryRequest)]): Seq[JobEvent] = {
    val (cancelledJobs, active) = jobs.partition { case (id, _) => isCancelled(id) }
    val cancelEvents = cancelledJobs.map { case (id, req) =>
      id -> Seq(
        event(id, "started", s"""{"query":${quote(req.query)}}"""),
        event(id, "final", """{"cancelled":true}"""))
    }.toMap
    val activeEvents: Map[String, Seq[JobEvent]] =
      try {
        agent.runBatch(corpus, active).map { case (id, state) =>
          id -> (event(id, "started",
            s"""{"query":${quote(active.find(_._1 == id).get._2.query)}}""") +:
            stateEvents(id, state))
        }.toMap
      } catch {
        case e: Exception =>
          active.map { case (id, req) =>
            id -> Seq(
              event(id, "started", s"""{"query":${quote(req.query)}}"""),
              event(id, "error",
                s"""{"message":${quote(String.valueOf(e.getMessage))}}"""))
          }.toMap
      }
    jobs.flatMap { case (id, _) =>
      cancelEvents.getOrElse(id, activeEvents.getOrElse(id, Nil))
    }
  }

  /** Run independent jobs concurrently (the Spark scheduler interleaves
    * jobs submitted from separate threads, so the many small retrieval
    * jobs' scheduler latencies overlap — the engine twin of the reference
    * worker's concurrent job handling, worker.py:73-88). Event order is
    * preserved within each job and across jobs by input order. The caller
    * must have materialized any lazily-cached corpus first, or all
    * threads race to compute the cache. */
  def runJobs(
      corpus: DataFrame,
      agent: AgentLoop,
      jobs: Seq[(String, QueryRequest)],
      parallelism: Int = 4): Seq[JobEvent] = {
    if (jobs.isEmpty) return Nil
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, jobs.length)))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = jobs.map { case (id, req) =>
        new java.util.concurrent.Callable[Seq[JobEvent]] {
          override def call(): Seq[JobEvent] = runJob(corpus, agent, id, req)
        }
      }
      pool.invokeAll(tasks.asJava).asScala.toSeq.flatMap(_.get())
    } finally pool.shutdown()
  }

  /** ST1-ST3: consume a streaming job-request frame (columns: jobId,
    * query, topK, repoName) and append events to a parquet sink. Works
    * with any streaming source — file drop-dir, Kafka, or MemoryStream in
    * tests. */
  def start(
      jobs: DataFrame,
      corpus: DataFrame,
      agent: AgentLoop,
      eventsPath: String,
      checkpoint: String): StreamingQuery = {
    jobs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val reqs = batch
          .select(col("jobId"), col("query"),
            coalesce(col("topK"), lit(5)).cast("int").as("topK"),
            col("repoName"))
          .collect() // job batches are small by construction (max_jobs=10)
        val events = reqs.toSeq.flatMap { r =>
          runJob(corpus, agent, r.getString(0),
            QueryRequest(r.getString(1), r.getInt(2),
              Option(r.getString(3)).filter(_.nonEmpty)))
        }
        events.toDS().write.mode(SaveMode.Append).parquet(eventsPath)
      }
      .start()
  }

  /** ST4 twin — SSE frame rendering over the events sink. The reference
    * serves `data: {"event": ..., "data": {...}}\n\n` per bus message
    * (bus.py:24-27, jobs_controller.py:22-27); the engine side of that
    * contract is the per-job subscription (filter) and the frame
    * encoding, which run identically on a batch read of the sink or a
    * `readStream` tail ([[tailFrames]]). The HTTP layer writes frames
    * through verbatim; `: ping\n\n` keepalives are connection-level, not
    * data, so they never enter the sink. `data` is already a JSON
    * object string by construction (see [[event]]), so the frame embeds
    * it raw rather than re-escaping it through to_json. */
  def sseFrames(events: DataFrame, jobId: String): DataFrame =
    events.filter(col("jobId") === jobId)
      .select(col("ts"), concat(
        lit("data: {\"event\": \""), col("event"),
        lit("\", \"data\": "), col("data"), lit("}\n\n")).as("frame"))

  /** Streaming subscription: tail the parquet events sink for one job's
    * frames — the `bus.stream(job_id)` twin as a Structured Streaming
    * source (new sink files deliver incrementally; AvailableNow in
    * tests). */
  def tailFrames(
      spark: SparkSession,
      eventsPath: String,
      jobId: String): DataFrame = {
    import spark.implicits._
    val schema = Seq.empty[JobEvent].toDS().schema
    sseFrames(spark.readStream.schema(schema).parquet(eventsPath), jobId)
  }

  /** Windowed event analytics over the events sink — the engine-side
    * addition the reference lacks (watermark + tumbling window). */
  def eventCounts(events: DataFrame): DataFrame = {
    events
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute"), col("event"))
      .count()
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
}
