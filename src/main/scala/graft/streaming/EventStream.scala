package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming analytics — the beyond-reference streaming surface
  * (the reference's "streaming" is job orchestration only, SURVEY §2.10):
  * watermarked tumbling-window aggregation and stateful sessionization via
  * `flatMapGroupsWithState`. The batch twins in
  * [[graft.queries.EventQueries]] (ev_hourly_rollup / ev_sessionize) are
  * the oracle-checked semantics; these run the same logic incrementally.
  *
  * Scale: state is partitioned by the group key (user), so the state store
  * shards with the shuffle; the watermark bounds state size by evicting
  * sessions older than the lateness allowance. Skewed users are the risk —
  * same salting/AQE options as the batch sessionize.
  */
object EventStream {

  case class Ev(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

  case class SessionState(
      sessionSeq: Long,
      startMs: Long,
      lastMs: Long,
      nEvents: Long,
      sumValue: Double)

  case class SessionOut(
      user_id: Long,
      session_seq: Long,
      n_events: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      sum_value: Double)

  val GapMs: Long = 30L * 60 * 1000

  /** Watermarked tumbling-window counts per event type (1-minute windows,
    * 1-minute lateness). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Streaming hourly-count ledger + served seasonal decomposition —
    * the incremental twin of ev_stl. Each micro-batch appends its
    * PARTIAL (event_type, h, cnt) rollup as a `batch=<id>` delta
    * (overwrite-by-path: a redelivered batch rewrites byte-identical
    * rows — the [[graft.streaming.IndexStream]] ledger discipline);
    * hours may repeat across batches, so the merge-on-read view SUMS
    * partials — integer sums, so the merged cube equals the batch
    * count exactly under any batch split. [[stlReport]] feeds the
    * merged cube through the SAME
    * `EventQueries.denseGridFromCounts`/`stlFromGrid` kernels the batch
    * query uses, so stream and batch cannot disagree by construction.
    * The ledger is the smallest state that can serve the report:
    * types × hours rows, never event-sized. */
  def startHourlyLedger(input: DataFrame, ledgerDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeHourlyDelta(batch, ledgerDir, batchId)
      }
      .start()

  /** One micro-batch's partial rollup — exposed for replay specs. */
  def writeHourlyDelta(batch: DataFrame, ledgerDir: String,
      batchId: Long): Unit = {
    batch
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$ledgerDir/hourly/batch=$batchId")
    ()
  }

  /** Merge-on-read counts cube over the accumulated ledger. The
    * listing+footer read retries across a concurrent compaction of the
    * `batch=` dirs (ADVICE r10, the [[graft.operators
    * .Compaction.retryFileGone]] discipline); the returned frame is
    * LAZY, so only [[stlReport]] — which materializes inside the
    * fold-stable bracket — is a safe serving-path entry point
    * (package-private for the same reason as DedupStream's
    * fingerprints view, r12). */
  private[graft] def hourlyCounts(s: org.apache.spark.sql.SparkSession,
      ledgerDir: String): DataFrame =
    graft.operators.Compaction.retryFileGone {
      val p = new org.apache.hadoop.fs.Path(s"$ledgerDir/hourly")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val empty = s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_type STRING, h TIMESTAMP, cnt BIGINT"))
      if (!fs.exists(p)) empty
      else {
        val parts = fs.listStatus(p).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
          .filter(st => fs.listStatus(st.getPath)
            .exists(_.getPath.getName.endsWith(".parquet")))
          .map(_.getPath.toString)
        if (parts.isEmpty) empty
        else s.read.parquet(parts: _*)
          .groupBy(col("event_type"), col("h"))
          .agg(sum(col("cnt")).as("cnt"))
      }
    }

  /** The ev_stl report served from the ledger (see
    * [[startHourlyLedger]]).
    *
    * Window semantics (ADVICE r10): with `fresh = false` (default)
    * the report is EXACTLY the batch oracle — the analyzed 672-hour
    * slab is anchored to the axis head, which means the served
    * decomposition FREEZES once the ledger spans ≥696 hours (newly
    * ingested events never change it) and a late event earlier than
    * the current min hour shifts which window is analyzed. That is the
    * right contract for parity gates. A continuously-served report
    * wants `fresh = true`: the same-width slab anchored to the axis
    * TAIL, so the decomposition tracks the newest 28 whole days and
    * early stragglers cannot move the window (exactness is
    * anchor-independent — see
    * [[graft.queries.EventQueries.stlFromGrid]]).
    *
    * Built (grid densification + decomposition) inside the fold-stable
    * bracket ([[graft.operators.Compaction.stableAcrossFolds]], r12:
    * bare FileNotFound retries cannot see a fold's silent-subset
    * listing window) so serving a report concurrent with a ledger
    * compaction re-reads a fresh listing whether the race threw or
    * not; denseGridFromCounts checkpoints the cube, so the whole build
    * materializes within the bracket scope. */
  def stlReport(s: org.apache.spark.sql.SparkSession,
      ledgerDir: String, fresh: Boolean = false): DataFrame =
    graft.operators.Compaction.stableAcrossFolds(
      s, Seq(s"$ledgerDir/hourly")) {
      val (grid, axisLen) =
        graft.queries.EventQueries.denseGridFromCounts(s, hourlyCounts(s, ledgerDir))
      graft.queries.EventQueries.stlFromGrid(grid, axisLen,
        anchorTail = fresh)
    }

  /** Stateful sessionization: 30-minute inactivity gap closes a session.
    * Closed sessions emit as soon as the closing event arrives; dangling
    * sessions emit on event-time timeout once the watermark passes the
    * gap. Output matches the batch ev_sessionize rows. */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Emit the dangling session but keep a zero-event tombstone so a
            // later event for this user continues session_seq instead of
            // restarting at 1 (the batch ev_sessionize numbering). State is
            // one tombstone per user — bounded by distinct users, same as
            // the batch shuffle. No new timeout: the tombstone never fires.
            val out = state.getOption.filter(_.nEvents > 0)
              .map(s => toOut(userId, s)).iterator
            state.getOption.foreach(s => state.update(s.copy(nEvents = 0)))
            out
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var st = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              st match {
                // nEvents == 0 is a flushed-session tombstone: its rows were
                // already emitted on timeout, so only the seq counter carries
                // over. (Any event reaching here is above the watermark,
                // which already passed lastMs + gap — the gap check holds.)
                case Some(s) if s.nEvents == 0 || t - s.lastMs > GapMs =>
                  if (s.nEvents > 0) closed += toOut(userId, s)
                  st = Some(SessionState(s.sessionSeq + 1, t, t, 1, e.value))
                case Some(s) =>
                  // out-of-order (pre-watermark) events may extend the
                  // session backwards as well as forwards
                  st = Some(s.copy(startMs = math.min(s.startMs, t),
                    lastMs = math.max(s.lastMs, t),
                    nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
                case None =>
                  st = Some(SessionState(1, t, t, 1, e.value))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + GapMs)
            }
            closed.iterator
          }
      }
  }

  /** Typed row for [[transitions]]. */
  case class TEv(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

  /** One experiment-ledger entry: a user ENTERS the experiment (first
    * event ever) or CONVERTS (first purchase ever) on a day, in an arm. */
  case class MsprtMark(user_id: Long, variant: String,
      obs_day: java.sql.Date, kind: String)

  /** Per-user monitor state: which marks this user has already emitted. */
  case class MsprtState(entered: Boolean, converted: Boolean)

  /** The engine's md5 arm assignment, driver-side (the
    * [[graft.queries.EventQueries.qMsprt]] bucket arithmetic). */
  private def armOf(userId: Long): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(userId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    if (Integer.parseInt(h, 16) % 2 == 0) "A" else "B"
  }

  /** Streaming experiment monitor — the incremental twin of the batch
    * always-valid readout ([[graft.queries.EventQueries.qMsprt]]): each
    * user emits at most TWO marks ever (enter on first event, convert on
    * first purchase), so the marks relation is an append-only experiment
    * ledger whose per-(arm, day) rollup is exactly the batch query's
    * delta relation — [[msprtReport]] folds it through the SAME
    * [[graft.queries.EventQueries.msprtCurve]] scorer, which is what
    * makes stream ≡ batch provable rather than approximate.
    *
    * State per user is two booleans — O(distinct users), independent of
    * history. Shares the arrival-order premise of [[transitions]]
    * (first-seen = earliest arrival; a true straggler moves a user's
    * entry day and is what the nightly batch recompute corrects);
    * within a micro-batch the group sorts by (ts, event_id) like every
    * monitor here. */
  def msprtMarks(events: Dataset[TEv]): Dataset[MsprtMark] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MsprtState, MsprtMark](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[TEv], state: GroupState[MsprtState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(MsprtState(false, false))
          val arm = armOf(userId)
          def dayOf(e: TEv) = java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(epochDay(e.ts).toLong))
          val out = scala.collection.mutable.ArrayBuffer.empty[MsprtMark]
          if (!st.entered) {
            out += MsprtMark(userId, arm, dayOf(sorted.head), "enter")
            st = st.copy(entered = true)
          }
          if (!st.converted) {
            sorted.find(_.event_type == "purchase").foreach { p =>
              out += MsprtMark(userId, arm, dayOf(p), "convert")
              st = st.copy(converted = true)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** The live readout over the accumulated marks ledger: roll the marks
    * to per-(arm, day) deltas and score through the batch query's own
    * [[graft.queries.EventQueries.msprtCurve]]. `spine` is the
    * observation-day relation (one `obs_day` column — in a deployment,
    * the days the monitor has seen; in the spec, the batch twin's). */
  def msprtReport(marks: DataFrame, spine: DataFrame): DataFrame = {
    val newu = marks.filter(col("kind") === "enter")
      .groupBy(col("variant"), col("obs_day"))
      .agg(count(lit(1)).as("nu"))
    val newc = marks.filter(col("kind") === "convert")
      .groupBy(col("variant"), col("obs_day"))
      .agg(count(lit(1)).as("nc"))
    graft.queries.EventQueries.msprtCurve(newu, newc, spine)
  }

  /** Emitted (prev → next) pair. */
  case class Transition(user_id: Long, prev_type: String, event_type: String)

  /** Streaming event-type transitions — the incremental twin of the
    * batch transition matrix
    * ([[graft.queries.EventQueries.qEventTransitions]]): as each user's
    * events arrive, emit the consecutive (prev → next) pairs. State is
    * ONE (ts, event_id, event_type) triple per user — bounded by
    * distinct users, independent of history length — and within each
    * micro-batch the group sorts by (ts, event_id) exactly like the
    * batch window's total order. Pairing is exact when arrival order
    * respects event time ACROSS batches (the CDC/ingest-edge premise
    * shared with [[graft.streaming.IngestStream]]); a late event would
    * need the batch twin's re-sort, which is what the nightly batch
    * recompute is for. Downstream, `groupBy(prev, next).count()` gives
    * the live matrix; the stream ≡ batch invariant on pair counts is
    * asserted in EventStreamSpec. */
  def transitions(events: Dataset[TEv]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TEv, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[TEv], state: GroupState[TEv]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          var prev = state.getOption
          sorted.foreach { e =>
            prev.foreach(p => out += Transition(userId, p.event_type, e.event_type))
            prev = Some(e)
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** Emitted 3-step path for [[paths3]]. */
  case class Path3(user_id: Long, t1: String, t2: String, t3: String)

  /** Streaming 3-gram paths — the sequence-mining tail of the transitions
    * stream and the incremental twin of the batch
    * [[graft.queries.EventQueries.qTopPaths]] (VERDICT r4 item 7). State
    * generalizes [[transitions]]' single carried event to the last TWO
    * (ts, event_id, event_type) per user — still O(1) per user,
    * independent of history length — and each arriving event emits the
    * trigram it completes, bridging micro-batches. Downstream
    * `groupBy(t1,t2,t3).count()` is the live top-paths report; the
    * stream ≡ batch count invariant (same premise as [[transitions]]:
    * arrival order respects event time across batches) is asserted in
    * EventStreamSpec. */
  def paths3(events: Dataset[TEv]): Dataset[Path3] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[TEv], Path3](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[TEv], state: GroupState[Seq[TEv]]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Path3]
          var tail = state.getOption.getOrElse(Seq.empty)
          sorted.foreach { e =>
            if (tail.length == 2)
              out += Path3(userId, tail(0).event_type, tail(1).event_type,
                e.event_type)
            tail = (tail :+ e).takeRight(2)
          }
          if (tail.nonEmpty) state.update(tail)
          out.iterator
      }
  }

  /** Funnel state: the stage reached and the deadline (micros) for the
    * next step. */
  case class FunnelState(stage: Int, deadlineUs: Long)

  /** Emitted on each advance: the user just reached `stage` at `ts`. */
  case class FunnelAdvance(user_id: Long, stage: Int, ts: Timestamp)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Streaming windowed funnel — the incremental twin of the batch
    * [[graft.queries.EventQueries.qEventFunnel]] fold: each user runs the
    * same (stage, deadline) state machine (step i+1 must land within
    * `windowUs` of step i, or the user stalls), but incrementally — one
    * advance row emits the moment a user reaches a stage, instead of a
    * nightly recompute discovering it. State is one (int, long) per user.
    * `groupBy(stage).count()` on the emissions is the live funnel (a user
    * reaching stage 3 emitted rows for 1, 2 and 3 — the ≥-stage counts
    * the batch report derives with `when(stage >= s)`); the stream ≡
    * batch per-user final stage invariant is asserted in EventStreamSpec. */
  def funnel(
      events: Dataset[TEv],
      steps: Seq[String] = Seq("view", "click", "purchase"),
      windowUs: Long = 86400000000L): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    val stepList = steps.toList
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[TEv], state: GroupState[FunnelState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAdvance]
          var st = state.getOption.getOrElse(FunnelState(0, 0L))
          sorted.foreach { e =>
            if (st.stage < stepList.length &&
                e.event_type == stepList(st.stage) &&
                (st.stage == 0 || micros(e.ts) <= st.deadlineUs)) {
              st = FunnelState(st.stage + 1, micros(e.ts) + windowUs)
              out += FunnelAdvance(userId, st.stage, e.ts)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Retention state: the user's cohort day (epoch days, fixed at first
    * sight) and the day offsets already emitted. */
  case class RetState(cohortDay: Int, seen: Seq[Int])

  /** Emitted exactly once per (user, day_offset): the user was active
    * `day_offset` days after their cohort day. */
  case class RetentionMark(user_id: Long, cohort_day: java.sql.Date, day_offset: Int)

  private def epochDay(t: Timestamp): Int =
    java.time.LocalDateTime.ofInstant(t.toInstant, java.time.ZoneOffset.UTC)
      .toLocalDate.toEpochDay.toInt

  /** Streaming retention — the incremental twin of the batch cohort
    * matrix ([[graft.queries.EventQueries.qRetention]], VERDICT r5
    * missing-item 5): each user's first-seen event fixes their cohort
    * day, and every later event emits one [[RetentionMark]] the first
    * time it lands on a new `day_offset`. Downstream,
    * `groupBy(cohort_day, day_offset).count()` is the live `active_n`
    * and the `day_offset = 0` row is `cohort_n` — exactly the batch
    * report's inputs, maintained incrementally instead of nightly.
    *
    * State per user is the cohort day plus the offsets already seen —
    * ∝ the user's distinct active days (bounded by cohort age in days),
    * not event history. Cohort assignment shares the arrival-order
    * premise of [[transitions]]: first-seen = earliest event time per
    * user (the CDC/ingest-edge premise); a true late-arriving first day
    * is what the nightly batch recompute corrects. The stream ≡ batch
    * invariant is asserted in EventStreamSpec. */
  def retention(events: Dataset[TEv]): Dataset[RetentionMark] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetState, RetentionMark](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[TEv], state: GroupState[RetState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[RetentionMark]
          var st = state.getOption.getOrElse(
            RetState(epochDay(sorted.head.ts), Seq.empty))
          sorted.foreach { e =>
            val off = epochDay(e.ts) - st.cohortDay
            if (off >= 0 && !st.seen.contains(off)) {
              st = st.copy(seen = st.seen :+ off)
              out += RetentionMark(userId,
                java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(st.cohortDay.toLong)),
                off)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** SCD2 state: the open run's attribute value and version counter. */
  case class Scd2State(lastType: String, version: Long)

  /** Emitted exactly once per run START — the append-only half of the
    * type-2 dimension history. */
  case class Scd2Mark(user_id: Long, version: Long, event_type: String,
      valid_from: Timestamp)

  /** Streaming SCD2 maintenance — the incremental twin of the batch
    * change-history build ([[graft.queries.EventQueries.qScd2]]): each
    * arriving event either continues the user's open run (no output) or
    * closes it and emits the NEW version's [[Scd2Mark]]. The marks
    * relation is exactly the batch output's (user_id, version,
    * event_type, valid_from) columns; `lead(valid_from)` over it (and a
    * count join for n_events) reproduces the full interval table, so a
    * dimension store can append marks and never rewrite history —
    * the type-2 write discipline.
    *
    * State per user is ONE (type, version) pair — O(distinct users),
    * independent of history length. Shares the arrival-order premise of
    * [[transitions]] (event time respected across batches; the nightly
    * batch recompute corrects true stragglers). Stream ≡ batch is
    * asserted in EventStreamSpec, including a run that spans a
    * micro-batch boundary emitting NO spurious version. */
  def scd2Marks(events: Dataset[TEv]): Dataset[Scd2Mark] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Mark](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[TEv], state: GroupState[Scd2State]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Mark]
          var st = state.getOption
          sorted.foreach { e =>
            if (!st.exists(_.lastType == e.event_type)) {
              val v = st.map(_.version + 1).getOrElse(1L)
              out += Scd2Mark(userId, v, e.event_type, e.ts)
              st = Some(Scd2State(e.event_type, v))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming interval join — the batch `ev_interval_pairs` relation
    * ([[graft.queries.EventQueries.qIntervalPairs]]: every click within
    * 30 minutes at-or-after a same-user view) through Spark's NATIVE
    * watermarked stream-stream join (StreamingSymmetricHashJoin), not a
    * hand-rolled state machine: both sides carry an event-time
    * watermark, the time-range predicate bounds each side's state
    * retention (a view can stop waiting for clicks once the click
    * watermark passes view_ts + 30 min; a click can match no view older
    * than 30 min before it), and matches emit in append mode the moment
    * both rows exist. `lateness` is the out-of-orderness allowance the
    * deployment tolerates — state size scales with
    * (lateness + 30 min) × arrival rate per user, the exact knob a
    * 100 TB/day event feed tunes. Proven stream ≡ batch against the
    * hash-gated relation in EventStreamSpec. */
  def intervalPairs(events: Dataset[TEv],
      lateness: String = "1 hour"): DataFrame = {
    val views = events.toDF()
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", lateness)
    val clicks = events.toDF()
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    views.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        round((unix_micros(col("click_ts")) - unix_micros(col("view_ts"))) /
          lit(1000000.0), 6).as("delay_s"))
  }

  /** Per-user funnel anchors as they become known: first view, first
    * click at-or-after it, first purchase at-or-after that (micros;
    * MinValue = unset). `pendCUs`/`pendPUs` carry the latest instant at
    * which a click/purchase arrived BEFORE its prerequisite anchor was
    * known — only a prerequisite locking at exactly that instant (the
    * one delivery the event-time-ordered premise still allows to land
    * in a later micro-batch) can resurrect it. */
  case class AnchorState(tvUs: Long, tcUs: Long, tpUs: Long,
      pendCUs: Long = Long.MinValue, pendPUs: Long = Long.MinValue)

  /** Emitted exactly once per (user, anchor) the moment that anchor
    * becomes known. */
  case class AnchorMark(user_id: Long, anchor: String, ts: Timestamp)

  /** Streaming funnel anchors — the incremental twin of the batch
    * step-latency report's anchor derivation
    * ([[graft.queries.EventQueries.qFunnelLatency]]): each user's first
    * view, first click at-or-after it and first purchase at-or-after
    * that are monotone in event time, so under the family's
    * arrival-order premise (micro-batches drain in event-time order —
    * the CDC/ingest-edge premise shared with [[transitions]] and
    * [[retention]]; a true late-arriving anchor is what the nightly
    * batch recompute corrects) one fixed-size state per user maintains
    * them exactly. The premise leaves EQUAL timestamps unordered across
    * batch cuts: a click delivered one batch before its same-instant
    * first view still counts in the batch query (`us >= tv`), so the
    * state carries the latest pre-anchor click/purchase instant and
    * resurrects it when the prerequisite locks at exactly that instant
    * — no ordering assumption remains beyond event-time monotonicity.
    * Each anchor emits one [[AnchorMark]] when it locks;
    * downstream, [[funnelLatencyReport]] turns the append-only ledger
    * into the live latency report through the SAME rollup kernel as the
    * batch query — proven stream ≡ batch in EventStreamSpec. */
  def funnelAnchors(events: Dataset[TEv]): Dataset[AnchorMark] = {
    import events.sparkSession.implicits._
    val Unset = Long.MinValue
    // batch anchors are PURE timestamp comparisons (us >= tv admits a
    // click at the same instant as the view), so within one timestamp
    // the fold must apply prerequisite stages first — view before click
    // before purchase — or a same-instant pair sorted click-first would
    // silently drop the click the batch query counts at latency 0
    val stageRank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AnchorState, AnchorMark](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[TEv], state: GroupState[AnchorState]) =>
          val sorted = evs.toSeq.sortBy(e =>
            (micros(e.ts), stageRank.getOrElse(e.event_type, 3), e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[AnchorMark]
          var st = state.getOption.getOrElse(AnchorState(Unset, Unset, Unset))
          def tsOf(us: Long): Timestamp = {
            val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
            t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
            t
          }
          // a purchase pending at the instant the click anchor just
          // locked was delivered before its prerequisite (a tie split
          // across a batch cut) — the batch query counts it at latency 0
          def resurrectPurchase(): Unit =
            if (st.tpUs == Unset && st.pendPUs != Unset &&
                st.pendPUs == st.tcUs) {
              st = st.copy(tpUs = st.pendPUs)
              out += AnchorMark(userId, "purchase", tsOf(st.tpUs))
            }
          sorted.foreach { e =>
            val us = micros(e.ts)
            e.event_type match {
              case "view" if st.tvUs == Unset =>
                st = st.copy(tvUs = us); out += AnchorMark(userId, "view", e.ts)
                if (st.tcUs == Unset && st.pendCUs != Unset && st.pendCUs == us) {
                  st = st.copy(tcUs = us)
                  out += AnchorMark(userId, "click", tsOf(us))
                  resurrectPurchase()
                }
              case "click" if st.tvUs != Unset && st.tcUs == Unset && us >= st.tvUs =>
                st = st.copy(tcUs = us); out += AnchorMark(userId, "click", e.ts)
                resurrectPurchase()
              case "click" if st.tvUs == Unset =>
                // prerequisite not yet known: only a view locking at this
                // same instant can admit it later (event time is monotone
                // across batches, ties excepted) — keep the latest
                st = st.copy(pendCUs = math.max(st.pendCUs, us))
              case "purchase" if st.tcUs != Unset && st.tpUs == Unset && us >= st.tcUs =>
                st = st.copy(tpUs = us); out += AnchorMark(userId, "purchase", e.ts)
              case "purchase" if st.tcUs == Unset =>
                st = st.copy(pendPUs = math.max(st.pendPUs, us))
              case _ =>
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** The live step-latency report over the anchor ledger: fold the
    * marks back to per-user (tv, tc, tp) — each anchor was emitted at
    * most once, so `min` is the identity pick — and feed the batch
    * query's own percentile rollup. */
  def funnelLatencyReport(marks: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    def at(a: String) =
      min(when(col("anchor") === a, unix_micros(col("ts"))))
    val t = marks.groupBy(col("user_id"))
      .agg(at("view").as("tv"), at("click").as("tc"), at("purchase").as("tp"))
    val vc = t.filter(col("tc").isNotNull)
      .select(round((col("tc") - col("tv")) / 1000000.0, 6).as("lat_s"))
      .withColumn("step", lit("1_view_to_click"))
    val cp = t.filter(col("tp").isNotNull)
      .select(round((col("tp") - col("tc")) / 1000000.0, 6).as("lat_s"))
      .withColumn("step", lit("2_click_to_purchase"))
    graft.queries.EventQueries.funnelLatencyRollup(vc.unionByName(cp))
  }

  /** Last-touch attribution mark: purchase `conv_id` credited to the
    * user's latest in-window touch. */
  case class AttribMark(user_id: Long, conv_id: Long, touch_id: Long,
      touch_type: String, conv_ts: Timestamp)

  /** Per-user attribution state: the best (latest) touch seen so far. */
  case class TouchState(touch_id: Long, touch_type: String, tsMicros: Long)

  /** Streaming last-touch attribution — the incremental twin of
    * [[graft.queries.EventQueries.qAttribution]]'s last_touch model: a
    * conversion credits the user's most recent click/view within the
    * lookback window, emitted the moment the purchase arrives instead
    * of a nightly recompute. State is ONE (touch_id, type, ts) triple
    * per user — the latest touch dominates every later conversion's
    * last-touch choice, so earlier touches never need retaining (the
    * reason last-touch is the O(1)-state attribution model; linear and
    * U-shaped need the window's full touch list). A touch credits every
    * later in-window conversion and survives its first purchase, exactly
    * like the batch pair-up. Arrival-order premise as [[transitions]];
    * ordering/tiebreaks use microsecond timestamps + event_id, matching
    * the batch window's (tts, touch_id) order. */
  def attributionMarks(events: Dataset[TEv],
      windowDays: Int = 3): Dataset[AttribMark] = {
    import events.sparkSession.implicits._
    val windowUs = windowDays.toLong * 86400L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, AttribMark](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[TEv], state: GroupState[TouchState]) =>
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[AttribMark]
          var st = state.getOption
          sorted.foreach { e =>
            e.event_type match {
              case "click" | "view" =>
                st = Some(TouchState(e.event_id, e.event_type, micros(e.ts)))
              case "purchase" =>
                val c = micros(e.ts)
                st.foreach { t =>
                  if (t.tsMicros < c && t.tsMicros >= c - windowUs)
                    out += AttribMark(userId, e.event_id, t.touch_id,
                      t.touch_type, e.ts)
                }
              case _ => ()
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** EWMA state/emission: the running fold (`ewma` after `n_events`
    * events). One row per user per micro-batch carries the latest
    * smoothed value downstream. */
  case class EwmaOut(user_id: Long, n_events: Long, ewma: Double)

  /** Typed row for [[ewma]] (value-carrying). */
  case class VEv(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

  /** Streaming EWMA — the incremental twin of the batch ordered fold
    * ([[graft.queries.EventQueries.qEventEwma]], VERDICT r5 missing-item
    * 5): EWMA_i = α·v_i + (1−α)·EWMA_{i−1} is the textbook
    * can't-be-a-window recurrence, and ALSO the textbook streaming-state
    * recurrence — one (n, ewma) pair per user, updated per event in
    * (ts, event_id) order within each micro-batch and carried across
    * batches. Emits the user's latest fold once per micro-batch it
    * appears in; the last emission per user equals the batch fold
    * bit-for-bit (same IEEE sequence, same order — the cross-batch
    * smoothing invariant EventStreamSpec asserts). Arrival-order premise
    * as [[transitions]]. */
  def ewma(events: Dataset[VEv], alpha: Double = 0.25): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaOut, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[VEv], state: GroupState[EwmaOut]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(EwmaOut(userId, 0L, 0.0))
          sorted.foreach { e =>
            st =
              if (st.n_events == 0L) EwmaOut(userId, 1L, e.value)
              else EwmaOut(userId, st.n_events + 1,
                st.ewma * (1 - alpha) + e.value * alpha)
          }
          state.update(st)
          Iterator.single(st)
      }
  }

  /** Holt state/emission: the (level, trend) pair after `n_events`
    * observations — level tracks the smoothed value, trend its smoothed
    * per-step change, so `level + h·trend` is the h-step forecast. */
  case class HoltOut(user_id: Long, n_events: Long,
      level: Double, trend: Double)

  /** Streaming Holt double exponential smoothing (Holt 1957, reprinted
    * IJF 2004 — public paper; the trend-aware extension of [[ewma]]):
    *   l_i = α·v_i + (1−α)·(l_{i−1} + b_{i−1})
    *   b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}
    * Initialization per the standard convention: l_1 = v_1, b_1 = 0 (a
    * single point carries no trend); the second point onward runs the
    * coupled recurrence. Like EWMA this is the textbook streaming-state
    * recurrence — one (n, level, trend) triple per user, updated in
    * (ts, event_id) order within each micro-batch and carried across
    * batches, so the last emission equals a driver-side fold over the
    * full ordered stream bit-for-bit (same IEEE sequence, same order —
    * the EventStreamSpec property). Arrival-order premise as
    * [[transitions]]. */
  def holt(events: Dataset[VEv], alpha: Double = 0.25,
      beta: Double = 0.1): Dataset[HoltOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[HoltOut, HoltOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[VEv], state: GroupState[HoltOut]) =>
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(HoltOut(userId, 0L, 0.0, 0.0))
          sorted.foreach { e =>
            st =
              if (st.n_events == 0L) HoltOut(userId, 1L, e.value, 0.0)
              else {
                val l = alpha * e.value + (1 - alpha) * (st.level + st.trend)
                val b = beta * (l - st.level) + (1 - beta) * st.trend
                HoltOut(userId, st.n_events + 1, l, b)
              }
          }
          state.update(st)
          Iterator.single(st)
      }
  }

  /** One observation of a monitored series: `seq` is the point's
    * position in the series (e.g. the densified hour index an upstream
    * windowed count assigns). */
  case class SeriesPoint(event_type: String, seq: Long, v: Double)

  /** CUSUM monitor state/emission — the
    * [[graft.queries.EventQueries.qEventCusum]] output tuple. */
  case class CusumOut(event_type: String, n: Long, sp: Double, sn: Double,
      n_alarm_points: Long, first_alarm_i: Long)

  /** Streaming CUSUM monitor (Page 1954 — the batch query's deployment
    * form): folds the two-sided tabular CUSUM over arriving series
    * points with REFERENCE (mean, sd) per type calibrated on a baseline
    * window — a live monitor cannot standardize against statistics of a
    * series that hasn't finished, so calibration is an input here where
    * the batch report derives it from the full series (feed the batch
    * stats in and the folds agree bit-for-bit: same IEEE sequence, same
    * order — the CusumSpec parity). State is one 5-tuple per type
    * (bounded by |types|, never by stream length); points fold in `seq`
    * order within each micro-batch and the state carries across
    * batches. Emits the latest state once per batch per type; alarm
    * counting does not reset, matching the batch report. */
  def cusum(points: Dataset[SeriesPoint], ref: Map[String, (Double, Double)],
      k: Double = 0.5, h: Double = 4.0): Dataset[CusumOut] = {
    import points.sparkSession.implicits._
    val bc = points.sparkSession.sparkContext.broadcast(ref)
    points
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumOut, CusumOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (t: String, it: Iterator[SeriesPoint], state: GroupState[CusumOut]) =>
          val (mean, sd) = bc.value.getOrElse(t, (0.0, 0.0))
          val sorted = it.toSeq.sortBy(_.seq)
          var st = state.getOption.getOrElse(CusumOut(t, 0L, 0.0, 0.0, 0L, 0L))
          sorted.foreach { p =>
            val z = if (sd == 0.0) 0.0 else (p.v - mean) / sd
            val sp = math.max(0.0, st.sp + z - k)
            val sn = math.max(0.0, st.sn - z - k)
            val alarm = sp > h || sn > h
            st = CusumOut(t, st.n + 1, sp, sn,
              st.n_alarm_points + (if (alarm) 1L else 0L),
              if (st.first_alarm_i > 0L) st.first_alarm_i
              else if (alarm) st.n + 1 else 0L)
          }
          state.update(st)
          Iterator.single(st)
      }
  }

  private def toOut(userId: Long, s: SessionState): SessionOut =
    SessionOut(userId, s.sessionSeq, s.nEvents,
      new Timestamp(s.startMs), new Timestamp(s.lastMs),
      math.rint(s.sumValue * 100) / 100)

  /** Streaming as-of enrichment — the incremental twin of the batch
    * ev_asof_click ([[graft.queries.EventQueries.qAsofClick]]): each
    * purchase carries the user's LATEST click at-or-before it, bounded to
    * a trailing lookback window. The bound is not a simplification but
    * the streaming form of the operator: "latest click ever" needs
    * unbounded per-user state, while the interval condition lets the
    * stream-stream join evict click state as the watermark passes
    * (state ∝ users × lookback, not history).
    *
    * Shape: watermarked interval LEFT join (purchases keep flowing when a
    * user never clicked) → per-purchase max over the joined candidates —
    * two chained stateful operators, the event-time-ordered composition
    * Structured Streaming supports natively. Emission is append-mode:
    * a purchase row is final once the watermark passes it, at which
    * point every qualifying click has arrived by the join's own
    * watermark arithmetic. */
  def asofEnrich(
      purchases: DataFrame,
      clicks: DataFrame,
      lookbackMinutes: Int = 60,
      lateness: String = "10 minutes"): DataFrame = {
    val p = purchases.select(
      col("event_id").as("p_id"), col("user_id").as("p_user"),
      col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", lateness)
    val c = clicks.select(
      col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("value").as("c_value"))
      .withWatermark("c_ts", lateness)
    p.join(c,
        expr(s"""p_user = c_user AND c_ts <= p_ts AND
                 c_ts >= p_ts - INTERVAL $lookbackMinutes MINUTES"""),
        "leftOuter")
      .groupBy(col("p_id"), col("p_user"), col("p_ts"), col("p_value"))
      .agg(max(struct(col("c_ts"), col("c_value"))).as("click"))
      .select(col("p_id"), col("p_user"), col("p_ts"), col("p_value"),
        col("click.c_ts").as("click_ts"), col("click.c_value").as("click_value"))
  }
}
