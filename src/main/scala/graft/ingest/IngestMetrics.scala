package graft.ingest

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One per-stage metrics row (the Spark twin of the reference's
  * `ingest_stage_run_seconds` gauge, ingest_controller.py:114-152). */
final case class StageMetric(
    runId: String,
    stage: String,
    wallMs: Long,
    taskTimeMs: Long,
    recordsRead: Long,
    tasks: Long)

/** Per-stage ingest metrics: wall clock from the `stage` wrapper plus
  * executor task metrics attributed through the Spark job group by a
  * `SparkListener` — the surface a production job exports to its metrics
  * sink (the reference pushes the same shape to a Prometheus gateway;
  * here the sink is the caller's, e.g. a parquet append next to the
  * audit rows).
  *
  * Attribution works by prefix-tagging the job group per stage: the
  * listener maps each job's stages back to the pipeline stage name, then
  * accumulates task time / input records / task counts on stage
  * completion. Listener delivery is asynchronous — `snapshot` reflects
  * stages whose events have drained (tests poll; production sinks read
  * after the run).
  */
class IngestMetrics(spark: SparkSession, runId: String) extends AutoCloseable {

  private val groupPrefix = s"graft-ingest-$runId:"
  private val wall = new ConcurrentHashMap[String, java.lang.Long]()
  private val taskTime = new ConcurrentHashMap[String, java.lang.Long]()
  private val records = new ConcurrentHashMap[String, java.lang.Long]()
  private val tasks = new ConcurrentHashMap[String, java.lang.Long]()
  private val stageToName = new ConcurrentHashMap[Int, String]()

  private def add(m: ConcurrentHashMap[String, java.lang.Long], k: String, v: Long): Unit =
    m.merge(k, java.lang.Long.valueOf(v),
      (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.valueOf(a + b))

  private val listener = new SparkListener {
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val group = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      group.filter(_.startsWith(groupPrefix))
        .map(_.stripPrefix(groupPrefix))
        .foreach(name => j.stageIds.foreach(id => stageToName.put(id, name)))
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val name = stageToName.get(s.stageInfo.stageId)
      if (name != null && s.stageInfo.taskMetrics != null) {
        val m = s.stageInfo.taskMetrics
        add(taskTime, name, m.executorRunTime)
        add(records, name, m.inputMetrics.recordsRead)
        add(tasks, name, s.stageInfo.numTasks.toLong)
      }
    }
  }
  spark.sparkContext.addSparkListener(listener)

  /** Run one pipeline stage under its own job group, recording wall time;
    * every Spark job the body fires is attributed to `name`. */
  def stage[T](name: String)(body: => T): T = {
    val sc = spark.sparkContext
    sc.setJobGroup(groupPrefix + name, s"ingest stage $name")
    val t0 = System.nanoTime()
    try body
    finally {
      add(wall, name, (System.nanoTime() - t0) / 1000000L)
      sc.clearJobGroup()
    }
  }

  /** Bounded wait for async listener delivery to cover every timed stage
    * (each stage forces at least one job, so each should gain task rows). */
  def awaitDrain(maxMs: Long = 5000): Unit = {
    val deadline = System.nanoTime() + maxMs * 1000000L
    while (System.nanoTime() < deadline && taskTime.size() < wall.size())
      Thread.sleep(20)
  }

  /** Metrics rows recorded so far (stages with a wall-clock entry). */
  def snapshot: Seq[StageMetric] = {
    import scala.jdk.CollectionConverters._
    wall.asScala.toSeq.sortBy(_._1).map { case (name, w) =>
      StageMetric(runId, name, w,
        Option(taskTime.get(name)).map(_.longValue()).getOrElse(0L),
        Option(records.get(name)).map(_.longValue()).getOrElse(0L),
        Option(tasks.get(name)).map(_.longValue()).getOrElse(0L))
    }
  }

  override def close(): Unit =
    spark.sparkContext.removeSparkListener(listener)
}

object IngestMetrics {

  /** Engine stage → reference metric level (`stage_timer` call sites,
    * ingest_controller.py:235-391). The engine times the same 8 pipeline
    * phases; only the names differ (rollup vs summaries — the engine
    * derives rollup text relationally, the reference via per-level LLM
    * summary passes). */
  val LevelByStage: Map[String, String] = Map(
    "preprocess" -> "preprocess",
    "chunk_enrich_embed" -> "code_nodes",
    "catalog" -> "catalog",
    "file_rollup" -> "file_summaries",
    "module_rollup" -> "module_summaries",
    "repo_rollup" -> "repo_summaries",
    "write" -> "vector_write",
    "audit" -> "audit_and_clean")

  /** One exported gauge sample — the relational twin of the reference's
    * `ingest_stage_run_seconds` pushgateway sample
    * (ingest_controller.py:114-152): same metric name, same label set
    * (level/repo/namespace/branch/run_id), value in seconds; the engine's
    * task-level metrics ride along as extra columns a Prometheus exporter
    * would drop. */
  final case class GaugeSample(
      metric_name: String,
      level: String,
      repo: String,
      namespace: String,
      branch: String,
      run_id: String,
      value: Double,
      task_time_ms: Long,
      records_read: Long,
      tasks: Long)

  /** Render a run's stage metrics as gauge samples. */
  def gauges(
      metrics: Seq[StageMetric],
      repo: String,
      namespace: String,
      branch: String): Seq[GaugeSample] =
    metrics.map { m =>
      GaugeSample("ingest_stage_run_seconds",
        LevelByStage.getOrElse(m.stage, m.stage),
        repo, namespace, branch, m.runId,
        m.wallMs / 1000.0, m.taskTimeMs, m.recordsRead, m.tasks)
    }

  /** Append a run's gauge samples as a parquet artifact — the engine's
    * metrics push (a Prometheus deployment tails this dataset or swaps in
    * a gateway-backed exporter; the sample shape is identical). */
  def exportGauges(
      spark: SparkSession,
      metrics: Seq[StageMetric],
      path: String,
      repo: String,
      namespace: String,
      branch: String): Unit = {
    import spark.implicits._
    gauges(metrics, repo, namespace, branch).toDS()
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(path)
  }
}
