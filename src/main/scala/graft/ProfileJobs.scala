package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.collection.concurrent.TrieMap

/** Round-16 dev tool: per-query scheduling profile — wall seconds vs
  * job/stage/task counts and summed task time, measured warm (run 2 of
  * 2). High wall with low task-time sum = scheduler/planner overhead;
  * high task time = real compute. With SPARK_GRAFT_PROFILE_JOBS=1 also
  * prints one line per Spark job (submit→end wall, tasks, task time).
  * Usage: runMain graft.ProfileJobs [sfDir] [q1,q2,... | all]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val sel = if (args.length > 1) args(1) else "all"
    val perJob = sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    try graft.queries.RagQueries.corpusFor(spark, sfDir).count()
    catch { case _: Throwable => () }

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNanos = new AtomicLong
    // per-job detail: jobId -> (submitNanos, endNanos, tasks, taskMs)
    case class J(var t0: Long = 0L, var t1: Long = 0L,
      var n: Int = 0, var ms: Long = 0L, var stages: Set[Int] = Set())
    val byJob = TrieMap.empty[Int, J]
    val stageToJob = TrieMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val rec = byJob.getOrElseUpdate(j.jobId, J())
        rec.t0 = System.nanoTime()
        j.stageIds.foreach(sid => stageToJob(sid) = j.jobId)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        byJob.get(j.jobId).foreach(_.t1 = System.nanoTime())
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) {
          val d = t.taskInfo.finishTime - t.taskInfo.launchTime
          taskNanos.addAndGet(d * 1000000L)
          stageToJob.get(t.stageId).flatMap(byJob.get).foreach { r =>
            r.n += 1; r.ms += d; r.stages += t.stageId
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names: Seq[String] = sel match {
      case "all" => SparkEntry.queries.keys.toSeq.sorted
        .filterNot(SparkEntry.auditOnly)
      case s => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }
    println("query,wall_s,jobs,stages,tasks,task_time_s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warm
      Thread.sleep(250)
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
      byJob.clear(); stageToJob.clear()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(250)
      println(f"$name,$wall%.3f,${jobs.get},${stages.get},${tasks.get},${taskNanos.get / 1e9}%.2f")
      if (perJob) {
        var prevEnd = t0
        byJob.toSeq.sortBy(_._1).foreach { case (id, r) =>
          val gap = (r.t0 - prevEnd) / 1e9
          prevEnd = math.max(prevEnd, r.t1)
          println(f"  job=$id gap=$gap%.3f wall=${(r.t1 - r.t0) / 1e9}%.3f " +
            f"stages=${r.stages.size} tasks=${r.n} task_s=${r.ms / 1e3}%.2f")
        }
        val tailGap = ((t0 + (wall * 1e9).toLong) - prevEnd) / 1e9
        println(f"  tail_after_last_job=$tailGap%.3f")
      }
    }
    spark.stop()
  }
}
