package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-15 optimization profiler: for each named query (args, or the
  * top-cost list below), report where the wall goes —
  *   build_ms  driver-side plan construction (fn() call),
  *   cold_s    first count() (includes codegen compile + cache build),
  *   warm_s    min of N warm count() runs (the bench's steady state),
  *   jobs/stages/tasks  scheduler work per WARM run,
  *   task_s    summed executor task time per warm run (parallel work),
  * so warm_s >> task_s/cores means fixed scheduling/driver overhead
  * dominates, and jobs count shows per-round action cost of iterative
  * queries. Usage: runMain graft.ProfileR15 <sfDir> [q1,q2,...]
  */
object ProfileR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskNanos = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskNanos += (t.taskInfo.duration * 1000000L)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.range(1000).selectExpr("sum(id)").collect()
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else Seq(
        "dd_ktruss", "dd_triangles", "dd_edit_distance", "ks_rm3",
        "dd_cdc_chunks", "rag_agent_batch_gate", "dd_simhash_clusters_stars",
        "ev_gsp", "td_curation_funnel", "dd_jaccard_prefix_full", "dd_lpa",
        "rag_agent_batch", "dd_kcore", "dd_winnowing_topk", "dd_containment",
        "dd_lsh_tuning_curve", "dd_jaccard", "ks_rm3_stored",
        "vs_ivf_recall_curve", "ks_snippets")
    println(f"${"query"}%-28s ${"build_ms"}%9s ${"cold_s"}%8s ${"warm_s"}%8s ${"jobs"}%5s ${"stage"}%6s ${"tasks"}%6s ${"task_s"}%8s")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: UNKNOWN")
        case Some(fn) =>
          val b0 = System.nanoTime()
          val df0 = fn(spark, sfDir)
          val buildMs = (System.nanoTime() - b0) / 1e6
          val c0 = System.nanoTime()
          df0.count()
          val cold = (System.nanoTime() - c0) / 1e9
          // warm: rebuild the frame each run like the bench does
          var best = Double.MaxValue
          var bJobs = 0; var bStages = 0; var bTasks = 0; var bTaskS = 0.0
          (1 to 2).foreach { _ =>
            jobs = 0; stages = 0; tasks = 0; taskNanos = 0L
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val w = (System.nanoTime() - t0) / 1e9
            // listener events are async; give the bus a beat to drain
            Thread.sleep(120)
            if (w < best) {
              best = w; bJobs = jobs; bStages = stages; bTasks = tasks
              bTaskS = taskNanos / 1e9
            }
          }
          println(f"$name%-28s $buildMs%9.1f $cold%8.2f $best%8.2f $bJobs%5d $bStages%6d $bTasks%6d $bTaskS%8.2f")
      }
    }
    spark.stop()
  }
}
