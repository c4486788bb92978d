package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query seconds.
  *
  * Methodology (VERDICT r3 item 1 + r13 item 1 — bench integrity):
  *   - IDLE GATE: the host's load is sampled at START; a non-idle host
  *     (load1 > SPARK_GRAFT_BENCH_IDLE_LOAD1, default 0.5, or another
  *     runnable process) marks the artifact `"tainted":true` — r13
  *     measured a 1.41× same-code spread across three runs that differed
  *     only in host load, so round-over-round ratios may only be stated
  *     between untainted runs. SPARK_GRAFT_BENCH_REQUIRE_IDLE=1 waits
  *     (up to SPARK_GRAFT_BENCH_IDLE_WAIT sec, default 300) and refuses
  *     with exit 2 rather than emit a tainted artifact.
  *   - Every line carries `"round":N` (inferred from the committed
  *     BENCH_r*.json set, env-overridable via SPARK_GRAFT_ROUND) so
  *     BENCH_HISTORY attribution never needs timestamp reconstruction.
  *   - Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3) and the
  *     MIN is reported: the sandbox has documented background load spikes
  *     (PERF.md: walls vary ±50% minutes apart), so a single sample
  *     conflates engine cost with host noise. Min-of-N measures the
  *     engine's steady-state cost — the quantity that is comparable
  *     round-over-round and to the r1 baseline.
  *   - The shared RAG corpus (built once per sf-dir, served from cache —
  *     the reference's ingest-then-query lifecycle) is materialized in an
  *     UNTIMED setup step, so its one-time build cost no longer lands on
  *     whichever rag_* query happens to run first (r1 charged it to
  *     rag_ingest_scopes, r3 to rag_agent_events — made cross-round
  *     per-query deltas meaningless). Setup cost is reported separately
  *     as "setup_sec".
  *   - Per-run raw samples go to stderr as a diagnostic JSON line
  *     ("bench_runs") so regressions can be told apart from load spikes
  *     without re-running.
  */
object Bench {
  /** (load1, load5, runnable, total-procs) from /proc/loadavg; negative
    * sentinel row when unreadable (non-Linux). */
  private def loadAvg(): (Double, Double, Int, Int) =
    try {
      val f = scala.io.Source.fromFile("/proc/loadavg")
      try {
        val p = f.mkString.trim.split("\\s+")
        val rt = p(3).split("/")
        (p(0).toDouble, p(1).toDouble, rt(0).toInt, rt(1).toInt)
      } finally f.close()
    } catch { case _: Throwable => (-1.0, -1.0, -1, -1) }

  /** Round number for artifact attribution: the driver names its
    * artifact BENCH_r{N}.json AFTER this run, so at run time the
    * highest committed BENCH_r*.json is N-1. Env-overridable; scans
    * both the cwd and the BENCH_HISTORY file's directory, so a launch
    * from outside the repo root still attributes correctly as long as
    * SPARK_GRAFT_BENCH_HISTORY points into it; emits round 0 (clearly
    * "unknown", never a plausible round) when neither is visible. */
  private def currentRound(): Int =
    sys.env.get("SPARK_GRAFT_ROUND").flatMap(_.toIntOption).getOrElse {
      val histDir = new java.io.File(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", "BENCH_HISTORY.jsonl"))
        .getAbsoluteFile.getParentFile
      // full-name match, not a substring scan: stray neighbors like
      // BENCH_r3.json.bak must not count toward round inference
      val R = "BENCH_r(\\d+)\\.json".r
      val rs = (Option(new java.io.File(".").listFiles()).getOrElse(Array()) ++
        Option(histDir.listFiles()).getOrElse(Array()))
        .map(_.getName).flatMap {
          case R(d) => Some(d.toInt)
          case _ => None
        }
      if (rs.isEmpty) 0 else rs.max + 1
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // idle gate (VERDICT r13 item 1): three same-code r13 runs spread
    // 1.41× purely with host load, which makes every round-over-round
    // ratio unenforceable unless runs are idle-stamped. Gate at START
    // (load at end is dominated by the run itself): not idle ⇒ the
    // artifact is loudly TAINTED (round comparisons must skip it); with
    // SPARK_GRAFT_BENCH_REQUIRE_IDLE=1 we instead poll up to
    // IDLE_WAIT_SEC for the host to drain and refuse (exit 2) if it
    // never does. runnable counts this process itself, hence the -1.
    val idleLoad1 = sys.env.getOrElse("SPARK_GRAFT_BENCH_IDLE_LOAD1", "0.5").toDouble
    val requireIdle = sys.env.get("SPARK_GRAFT_BENCH_REQUIRE_IDLE").contains("1")
    val idleWaitSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_IDLE_WAIT", "300").toInt
    // runnable counts kernel TASKS in R state including this process's
    // own threads — the sampling thread always, and transiently the
    // JVM's JIT/GC threads. Take the MIN over a few spaced samples: a
    // foreign hog is PERSISTENTLY runnable across all of them (even
    // when it started seconds ago and is invisible to load1's 1-minute
    // average), while own JIT/GC spikes are not — so min-1 <= 0 taints
    // on real load without spuriously refusing an idle host.
    def idleProbe(): ((Double, Double, Int, Int), Boolean) = {
      val samples = (1 to 3).map { i =>
        val l = loadAvg(); if (i < 3) Thread.sleep(120); l }
      val head = samples.head
      val minRunnable = samples.map(_._3).min
      (head, head._1 < 0 || (head._1 <= idleLoad1 && minRunnable - 1 <= 0))
    }
    var (start, idleNow) = idleProbe()
    if (requireIdle) {
      val deadline = System.nanoTime() + idleWaitSec * 1e9.toLong
      while (!idleNow && System.nanoTime() < deadline) {
        System.err.println(f"[bench] waiting for idle host: load1=${start._1}%.2f runnable=${start._3}")
        Thread.sleep(10000)
        val p = idleProbe(); start = p._1; idleNow = p._2
      }
      if (!idleNow) {
        System.err.println(f"[bench] REFUSING: host not idle after ${idleWaitSec}s (load1=${start._1}%.2f runnable=${start._3}); set SPARK_GRAFT_BENCH_REQUIRE_IDLE=0 to taint instead")
        sys.exit(2)
      }
    }
    val tainted = !idleNow
    if (tainted)
      System.err.println(f"[bench] WARNING: host not idle at start (load1=${start._1}%.2f runnable=${start._3}); artifact will carry tainted:true — do not use it for round-over-round comparison")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val setupT0 = System.nanoTime()
    // warm up the session (scheduler, codegen, shuffle machinery, parquet
    // reader, HOF codegen paths) so the first measured query doesn't
    // absorb JVM startup
    spark.range(1000).selectExpr("sum(id)").collect()
    try {
      spark.read.parquet(s"$sfDir/region.parquet").count()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
        .selectExpr("size(filter(split(lower(text), '\\\\s+'), t -> t = 'the'))")
        .groupBy(org.apache.spark.sql.functions.col("doc_id") % 2).count().collect()
      // materialize the shared RAG corpus cache (ingest once, query many —
      // the reference's own lifecycle) so rag_* timings measure queries,
      // not the one-time build
      graft.queries.RagQueries.corpusFor(spark, sfDir).count()
    } catch { case _: Throwable => () }
    val setupSec = (System.nanoTime() - setupT0) / 1e9
    // optional comma-separated subset for isolating a regression without
    // paying for the whole suite (full-suite numbers remain the record)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // full-pair exact audits are opt-in (SparkEntry.auditOnly): the
    // default bench measures the rows that run at 100× scale — their
    // bounded _topk twins — while the correctness gate keeps checking
    // the exact forms every round
    // SPARK_GRAFT_BENCH_HEAVY=1 is the opt-in heavy tier (VERDICT r13
    // item 6): it runs the two full-pair exact audit rows so their
    // walls land in BENCH_HISTORY with the same stamps as everything
    // else, making them diffable round-to-round
    val audit = sys.env.get("SPARK_GRAFT_BENCH_AUDIT").contains("1") ||
      sys.env.get("SPARK_GRAFT_BENCH_HEAVY").contains("1")
    // mid-run foreign-load detector (VERDICT r14 item 2): the start
    // gate can't see load that ARRIVES mid-run — r14 measured a
    // residual 1.16× spread between start-clean runs from exactly
    // that. Between queries our executor threads are parked, so a
    // min-of-3 runnable probe at each query boundary (same exclusion
    // rule as the start gate: -1 for the sampling thread, min over
    // spaced samples so own JIT/GC spikes don't count) sees a foreign
    // hog that is active RIGHT NOW. The max across boundaries lands in
    // the artifact; any boundary with foreign runnable > 0 sets
    // tainted_mid. Probes run outside the timed regions.
    var midForeignMax = 0
    def boundaryProbe(): Unit = {
      val probe = (1 to 3).map { i =>
        val l = loadAvg(); if (i < 3) Thread.sleep(120); l._3 }
      val foreign = probe.min - 1
      if (foreign > midForeignMax) midForeignMax = foreign
    }
    // deterministic name order: warmup residue lands on the same query
    // every round instead of whichever the Map hash puts first
    val samples = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .filter { case (name, _) =>
        audit || only.isDefined || !SparkEntry.auditOnly(name) }
      .map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      boundaryProbe()
      name -> times
    }
    val results = samples.map { case (name, ts) => name -> ts.min }
    val raw = samples.map { case (k, ts) =>
      s"\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    System.err.println(s"""{"metric":"bench_runs","runs":$runs,"samples":$raw}""")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // idle/contention stamp (VERDICT r12 item 4): round-over-round
    // per-query diffs are only meaningful when both runs were similarly
    // idle — record the host's load average and runnable/total process
    // counts at run END so the artifact carries its own noise context
    val end = loadAvg()
    // tainted_end (VERDICT r14 item 2): a foreign process still runnable
    // at run END, judged by the same min-of-3 rule as the start gate.
    // load1 at end is deliberately NOT part of the predicate — the 1-min
    // average is dominated by this run's own 32-thread bursts, so it
    // would taint every heavy run; the instantaneous runnable count
    // (own executors parked by now) is the honest end-of-run signal.
    val endForeign = ((1 to 3).map { i =>
      val l = loadAvg(); if (i < 3) Thread.sleep(120); l._3 }).min - 1
    val taintedEnd = end._1 >= 0 && endForeign > 0
    val taintedMid = midForeignMax > 0
    val round = currentRound()
    val load =
      s""""load1":${end._1},"load5":${end._2},"runnable":${end._3},"procs":${end._4},""" +
      s""""load1_start":${start._1},"runnable_start":${start._3},""" +
      s""""tainted":$tainted,"tainted_end":$taintedEnd,""" +
      s""""tainted_mid":$taintedMid,"runnable_mid_max":$midForeignMax,""" +
      s""""round":$round"""
    val ts = java.time.Instant.now().toString
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"setup_sec":$setupSec,$load,"ts":"$ts"}"""
    println(line)
    // cumulative per-run history: every full map survives in order, so
    // any round's verdict can diff all rows from committed files alone
    // instead of the driver's (historically truncated) stdout capture
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", "BENCH_HISTORY.jsonl")),
      line + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not append history: ${e.getMessage}") }
    // ALSO persist the line to a file: the round artifact is captured
    // from stdout, and a truncated capture (BENCH_r10/r11 both shipped
    // `parsed: null` with a cut raw tail) loses the whole per-query map.
    // SPARK_GRAFT_BENCH_OUT overrides; default lands next to the build.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
    // compact summary as the LAST stdout line (VERDICT r14 item 6):
    // the driver's stdout capture has shipped a truncated TAIL five
    // rounds running, losing the long per-query line above. This short
    // line survives tail truncation of everything before it and is
    // independently parseable; the full per-query map remains in
    // BENCH_HISTORY.jsonl and SPARK_GRAFT_BENCH_OUT.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"runs":$runs,"tainted":$tainted,"tainted_end":$taintedEnd,"tainted_mid":$taintedMid,"round":$round,"compact":true,"full_line":"BENCH_HISTORY.jsonl"}""")
  }
}
