package graft

import java.sql.Timestamp

import graft.streaming.EventStream
import graft.streaming.EventStream.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Event-time streaming: watermarked windows and stateful sessionization
  * (flatMapGroupsWithState) against MemoryStream micro-batches. */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
  def tsH(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("windowed counts: tumbling 1-minute windows per event type") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val q = EventStream.windowedCounts(events)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    input.addData((ts(0), "click"), (ts(0), "click"), (ts(1), "view"))
    q.processAllAvailable()
    // advance watermark far enough to close the first windows
    input.addData((ts(10), "click"))
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .selectExpr("window.start", "event_type", "n").as[(Timestamp, String, Long)]
      .collect().toSet
    q.stop()
    assert(rows.contains((ts(0), "click", 2L)))
    assert(rows.contains((ts(1), "view", 1L)))
  }

  test("stateful sessionize: gap closes session; timeout flushes dangler") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    // session 1: two events 5 minutes apart
    input.addData(Ev(1, 1, tsH(10, 0), 1.0), Ev(1, 2, tsH(10, 5), 2.0))
    q.processAllAvailable()
    // 40-minute gap → closes session 1, opens session 2
    input.addData(Ev(1, 3, tsH(10, 45), 4.0))
    q.processAllAvailable()
    val afterClose = spark.table("sessions").as[EventStream.SessionOut].collect()
    assert(afterClose.length == 1)
    val s1 = afterClose.head
    assert(s1.user_id == 1 && s1.session_seq == 1 && s1.n_events == 2)
    assert(s1.session_start == tsH(10, 0) && s1.session_end == tsH(10, 5))
    assert(s1.sum_value == 3.0)

    // push the watermark far past session 2's gap → event-time timeout
    input.addData(Ev(2, 9, tsH(12, 0), 0.5))
    q.processAllAvailable()
    input.addData(Ev(2, 10, tsH(13, 0), 0.5))
    q.processAllAvailable()
    val all = spark.table("sessions").as[EventStream.SessionOut].collect()
    val s2 = all.find(s => s.user_id == 1 && s.session_seq == 2)
    assert(s2.isDefined, s"timeout should flush the dangling session: ${all.toSeq}")
    assert(s2.get.n_events == 1 && s2.get.sum_value == 4.0)

    // post-timeout event for user 1: the tombstone keeps the counter, so
    // numbering continues at 3 (not back at 1) and the flushed session is
    // not re-emitted
    input.addData(Ev(1, 11, tsH(13, 30), 7.0))
    q.processAllAvailable()
    input.addData(Ev(2, 12, tsH(15, 0), 0.5)) // advance watermark → timeout
    q.processAllAvailable()
    val finalRows = spark.table("sessions").as[EventStream.SessionOut].collect()
    q.stop()
    val u1 = finalRows.filter(_.user_id == 1).sortBy(_.session_seq)
    assert(u1.map(_.session_seq).toSeq == Seq(1L, 2L, 3L), s"${u1.toSeq}")
    val s3 = u1.find(_.session_seq == 3).get
    assert(s3.n_events == 1 && s3.sum_value == 7.0)
  }

  test("streaming transitions: cross-batch pairing equals the batch matrix") {
    import graft.streaming.EventStream.{TEv, Transition}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TEv]
    val q = EventStream.transitions(input.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 view→click; user 2 single event (no pair yet)
      input.addData(
        TEv(1, 1, ts(0), "view"), TEv(1, 2, ts(1), "click"),
        TEv(2, 3, ts(1), "view"))
      q.processAllAvailable()
      // batch 2: pairs must BRIDGE batches via the carried state
      input.addData(
        TEv(1, 4, ts(5), "purchase"),
        TEv(2, 5, ts(6), "error"), TEv(2, 6, ts(7), "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trans").as[Transition].collect()
      .groupBy(t => (t.prev_type, t.event_type)).view.mapValues(_.length).toMap
    // batch twin on the same rows: lag over (user order by ts, id)
    val batch = Seq(
      (1L, 1L, ts(0), "view"), (1L, 2L, ts(1), "click"), (1L, 4L, ts(5), "purchase"),
      (2L, 3L, ts(1), "view"), (2L, 5L, ts(6), "error"), (2L, 6L, ts(7), "view"))
      .sortBy(r => (r._1, r._3.getTime, r._2))
      .groupBy(_._1).values.flatMap(_.sliding(2).collect {
        case Seq(a, b) => (a._4, b._4)
      }).groupBy(identity).view.mapValues(_.size).toMap
    assert(got == batch, s"stream $got != batch $batch")
    assert(got(("view", "click")) == 1 && got(("click", "purchase")) == 1 &&
      got(("view", "error")) == 1 && got(("error", "view")) == 1)
  }

  test("streaming 3-gram paths: cross-batch trigrams equal the batch lag windows") {
    import graft.streaming.EventStream.{Path3, TEv}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TEv]
    val q = EventStream.paths3(input.toDS())
      .writeStream.format("memory").queryName("paths3")
      .outputMode(OutputMode.Append()).start()
    val evs = Seq(
      TEv(1, 1, ts(0), "view"), TEv(1, 2, ts(1), "click"),
      TEv(2, 3, ts(1), "view"),
      // batch 2: trigrams must bridge batches via the carried 2-tail
      TEv(1, 4, ts(5), "purchase"), TEv(1, 5, ts(6), "view"),
      TEv(2, 6, ts(6), "error"), TEv(2, 7, ts(7), "view"))
    try {
      input.addData(evs.take(3): _*)
      q.processAllAvailable()
      input.addData(evs.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("paths3").as[Path3].collect()
      .groupBy(p => (p.t1, p.t2, p.t3)).view.mapValues(_.length).toMap
    // batch twin: two lag windows == sliding(3) over the per-user order
    val batch = evs.sortBy(e => (e.user_id, e.ts.getTime, e.event_id))
      .groupBy(_.user_id).values.flatMap(_.sliding(3).collect {
        case Seq(a, b, c) => (a.event_type, b.event_type, c.event_type)
      }).groupBy(identity).view.mapValues(_.size).toMap
    assert(got == batch, s"stream $got != batch $batch")
    assert(got(("view", "click", "purchase")) == 1, "bridged trigram present")
  }

  test("streaming funnel: stage advances equal the batch fold, window stalls enforced") {
    import graft.streaming.EventStream.{FunnelAdvance, TEv}
    implicit val sqlCtx = spark.sqlContext
    def tsD(day: Int, hour: Int): Timestamp =
      Timestamp.valueOf(f"2026-01-$day%02d $hour%02d:00:00")
    val input = MemoryStream[TEv]
    val q = EventStream.funnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    val batch1 = Seq(
      TEv(1, 1, tsD(1, 10), "view"), TEv(1, 2, tsD(1, 11), "click"),
      TEv(2, 3, tsD(1, 10), "view"),
      TEv(3, 4, tsD(1, 10), "click"), // no view first: never enters
      TEv(4, 5, tsD(1, 10), "view"), TEv(4, 6, tsD(1, 11), "click"))
    val batch2 = Seq(
      TEv(1, 7, tsD(1, 12), "purchase"),  // within window → stage 3
      TEv(2, 8, tsD(2, 12), "click"),     // 26h after view → stalls at 1
      TEv(4, 9, tsD(2, 13), "purchase"))  // 26h after click → stalls at 2
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val adv = spark.table("funnel_out").as[FunnelAdvance].collect()
    val finalStage = adv.groupBy(_.user_id).view
      .mapValues(_.map(_.stage).max).toMap
    // batch twin: the qEventFunnel (stage, deadline) fold per user
    val steps = Seq("view", "click", "purchase")
    val batchStage = (batch1 ++ batch2)
      .sortBy(e => (e.ts.getTime, e.event_id)).groupBy(_.user_id).view
      .mapValues(_.foldLeft((0, 0L)) { case ((st, dl), e) =>
        val us = e.ts.getTime * 1000L
        if (st < 3 && e.event_type == steps(st) && (st == 0 || us <= dl))
          (st + 1, us + 86400000000L)
        else (st, dl)
      }._1).toMap
    assert(finalStage == batchStage.filter(_._2 > 0),
      s"stream $finalStage != batch $batchStage")
    assert(finalStage == Map(1L -> 3, 2L -> 1, 4L -> 2))
    // every advance emitted exactly once: user 1 passed stages 1,2,3
    assert(adv.filter(_.user_id == 1).map(_.stage).sorted.toSeq == Seq(1, 2, 3))
    // live ≥-stage counts match the batch report's s1/s2/s3 derivation
    val geCounts = (1 to 3).map(s => s -> finalStage.count(_._2 >= s)).toMap
    assert(geCounts == Map(1 -> 3, 2 -> 2, 3 -> 1))
  }

  test("streaming retention: cross-batch cohort marks equal the batch matrix") {
    import graft.streaming.EventStream.{RetentionMark, TEv}
    implicit val sqlCtx = spark.sqlContext
    def tsDay(day: Int, hour: Int): Timestamp =
      Timestamp.valueOf(f"2026-01-$day%02d $hour%02d:00:00")
    val input = MemoryStream[TEv]
    val q = EventStream.retention(input.toDS())
      .writeStream.format("memory").queryName("retention")
      .outputMode(OutputMode.Append()).start()
    val evs = Seq(
      // batch 1: user 1 cohorts on Jan 1 (two same-day events → one mark);
      // user 2 cohorts on Jan 2
      TEv(1, 1, tsDay(1, 9), "view"), TEv(1, 2, tsDay(1, 17), "click"),
      TEv(2, 3, tsDay(2, 10), "view"),
      // batch 2: offsets must bridge batches via the carried cohort day;
      // repeat activity on an already-marked offset emits nothing
      TEv(1, 4, tsDay(3, 8), "view"), TEv(1, 5, tsDay(3, 20), "purchase"),
      TEv(2, 6, tsDay(4, 11), "view"))
    try {
      input.addData(evs.take(3): _*)
      q.processAllAvailable()
      input.addData(evs.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("retention").as[RetentionMark].collect()
      .map(m => (m.user_id, m.cohort_day.toString, m.day_offset)).toSet
    // batch twin on the same rows: distinct (cohort_day, day_offset, user)
    // — qRetention's `activity` relation, from which active_n/cohort_n roll up
    // derive days via the SAME UTC conversion the operator's epochDay
    // pins — toLocalDateTime would use the JVM default zone and shift
    // the expected cohort day on a non-UTC JVM
    val days = evs.map(e => e.user_id ->
      e.ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate)
    val cohort = days.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val batch = days.map { case (u, day) =>
      (u, cohort(u).toString,
        java.time.temporal.ChronoUnit.DAYS.between(cohort(u), day).toInt)
    }.toSet
    assert(got == batch, s"stream $got != batch $batch")
    // exactly one mark per (user, offset): no duplicates from repeat activity
    assert(spark.table("retention").count() == batch.size)
  }

  test("streaming ewma: cross-batch smoothing equals the batch ordered fold") {
    import graft.streaming.EventStream.{EwmaOut, VEv}
    implicit val sqlCtx = spark.sqlContext
    val alpha = 0.25
    val input = MemoryStream[VEv]
    val q = EventStream.ewma(input.toDS(), alpha)
      .writeStream.format("memory").queryName("ewma")
      .outputMode(OutputMode.Append()).start()
    val evs = Seq(
      VEv(1, 1, ts(0), 1.0), VEv(1, 2, ts(1), 2.0), // batch 1
      VEv(1, 3, ts(5), 4.0), VEv(2, 4, ts(6), 3.0)) // batch 2
    try {
      input.addData(evs.take(2): _*)
      q.processAllAvailable()
      input.addData(evs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    // the LAST emission per user (highest n_events) is the live fold
    val got = spark.table("ewma").as[EwmaOut].collect()
      .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_events)).toMap
    // batch twin: qEventEwma's fold (init = first value, then the
    // recurrence) over the per-user (ts, event_id) order — bit-equal,
    // not just approximately equal, because the IEEE sequence matches
    val batch = evs.sortBy(e => (e.user_id, e.ts.getTime, e.event_id))
      .groupBy(_.user_id).view.mapValues { es =>
        es.map(_.value).reduceLeft((acc, x) => acc * (1 - alpha) + x * alpha)
      }.toMap
    assert(got.keySet == batch.keySet)
    batch.foreach { case (u, v) =>
      assert(got(u).ewma == v, s"user $u: ${got(u).ewma} != $v (bit-exact)")
    }
    assert(got(1L).n_events == 3 && got(2L).n_events == 1)
    assert(got(1L).ewma == 0.75 * (0.75 * 1.0 + 0.25 * 2.0) + 0.25 * 4.0)
  }

  test("streaming scd2: cross-batch run continuation; marks equal the batch history") {
    import graft.streaming.EventStream.{Scd2Mark, TEv}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TEv]
    val q = EventStream.scd2Marks(input.toDS())
      .writeStream.format("memory").queryName("scd2")
      .outputMode(OutputMode.Append()).start()
    val b1 = Seq(TEv(1, 1, ts(0), "A"), TEv(1, 2, ts(5), "A"),
      TEv(2, 3, ts(1), "C"))
    val b2 = Seq(
      TEv(1, 4, ts(10), "A"),  // run continues ACROSS the batch boundary
      TEv(1, 5, ts(20), "B"),  // new version
      TEv(2, 6, ts(11), "D"))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(spark.table("scd2").count() == 2,
        "batch 1: one mark per user's opening run")
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val marks = spark.table("scd2").as[Scd2Mark].collect()
    assert(marks.length == 4,
      s"continuation must not re-mark: ${marks.toSeq}")
    // batch twin: qScd2 over the same rows written as an events fixture —
    // the marks are exactly its (user_id, version, event_type, valid_from)
    val dir = java.nio.file.Files.createTempDirectory("scd2stream").toString
    (b1 ++ b2).toDF()
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.EventQueries.qScd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    // format the mark timestamps through the SAME Spark formatter the
    // batch query uses, so both sides share one session-zone rendering
    val got = marks.toSeq.toDF()
      .select(col("user_id"), col("version"), col("event_type"),
        org.apache.spark.sql.functions
          .date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("vf"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == batch, s"stream $got != batch $batch")
  }

  test("property: scd2 marks equal the batch history on random streams and splits") {
    import graft.streaming.EventStream.{Scd2Mark, TEv}
    implicit val sqlCtx = spark.sqlContext
    val types = Array("A", "B", "C")
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // event times strictly increasing per user so arrival order can
      // respect event time (the operator's documented premise)
      val evs = (0 until 60).map { i =>
        TEv(rnd.nextInt(4).toLong + 1, i.toLong, ts(i), types(rnd.nextInt(3)))
      }
      // random batch boundaries, delivery in event order
      val cuts = Seq(rnd.nextInt(30) + 1, rnd.nextInt(29) + 31).sorted
      val batches = Seq(evs.take(cuts(0)),
        evs.slice(cuts(0), cuts(1)), evs.drop(cuts(1)))
      val name = s"scd2prop$seed"
      val input = MemoryStream[TEv]
      val q = EventStream.scd2Marks(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table(name).as[Scd2Mark].collect()
        .map(m => (m.user_id, m.version, m.event_type,
          m.valid_from.getTime)).toSet
      // driver-side batch fold over the full ordered stream
      val want = evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        val runs = es.sortBy(e => (e.ts.getTime, e.event_id))
          .foldLeft(List.empty[(String, Long)]) { (acc, e) =>
            if (acc.headOption.exists(_._1 == e.event_type)) acc
            else (e.event_type, e.ts.getTime) :: acc
          }.reverse
        runs.zipWithIndex.map { case ((t, from), i) =>
          (u, (i + 1).toLong, t, from)
        }
      }.toSet
      assert(got == want, s"seed $seed: $got != $want")
    }
  }

  test("streaming asof enrich: latest prior click within lookback, null when none") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    def df(m: MemoryStream[Ev]) = m.toDF()
      .selectExpr("user_id", "event_id", "ts", "value")
    val q = EventStream.asofEnrich(df(purchases), df(clicks))
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append()).start()

    clicks.addData(Ev(1, 100, ts(0), 1.0), Ev(1, 101, ts(20), 2.0))
    purchases.addData(
      Ev(1, 200, ts(30), 9.0), // u1: latest prior click = 10:20 (2.0)
      Ev(2, 201, ts(30), 7.0)) // u2: no clicks at all
    q.processAllAvailable()
    // push both watermarks far past the purchases so append finalizes
    clicks.addData(Ev(9, 998, tsH(12, 0), 0.0))
    purchases.addData(Ev(9, 999, tsH(12, 0), 0.0))
    q.processAllAvailable()
    clicks.addData(Ev(9, 996, tsH(14, 0), 0.0))
    purchases.addData(Ev(9, 997, tsH(14, 0), 0.0))
    q.processAllAvailable()

    val rows = spark.table("asof_out")
      .selectExpr("p_id", "click_value").as[(Long, Option[Double])]
      .collect().toMap
    q.stop()
    assert(rows(200L) == Some(2.0), s"latest prior click wins: $rows")
    assert(rows(201L).isEmpty, s"no-click purchase flows with null: $rows")
  }

  test("manifest source: puts, updates and deletes equal a one-shot ingest") {
    import graft.ingest.IngestPipeline
    import graft.llm.{HashEmbedder, StubLlm}
    import graft.model.RawDoc
    import graft.streaming.IngestStream
    val manifests = java.nio.file.Files.createTempDirectory("manifest-in")
    val out = java.nio.file.Files.createTempDirectory("manifest-out").toString
    val ck = java.nio.file.Files.createTempDirectory("manifest-ck").toString
    val pipeline = new IngestPipeline(new StubLlm, new HashEmbedder(32))
    def manifest(name: String, lines: String*): Unit =
      java.nio.file.Files.writeString(manifests.resolve(name), lines.mkString("\n"))

    manifest("m1.jsonl",
      """{"op":"put","namespace":"ns","repo":"r1","filePath":"a.py","text":"def one(): pass"}""",
      """{"op":"put","namespace":"ns","repo":"r1","filePath":"b.py","text":"def two(): pass"}""")
    val q1 = IngestStream.startManifest(
      spark, manifests.toString, s"$out/corpus", pipeline, "mrun", ck)
    q1.awaitTermination(120000)
    assert(IngestStream.readCorpus(spark, s"$out/corpus")
      .filter(col("scope") === "chunk").count() == 2)

    // second manifest: update a.py (same path — re-delivered naturally),
    // delete b.py, add c.py
    manifest("m2.jsonl",
      """{"op":"put","namespace":"ns","repo":"r1","filePath":"a.py","text":"def one_v2(): return 1"}""",
      """{"op":"delete","namespace":"ns","repo":"r1","filePath":"b.py"}""",
      """{"op":"put","namespace":"ns","repo":"r1","filePath":"c.py","text":"def three(): pass"}""")
    val q2 = IngestStream.startManifest(
      spark, manifests.toString, s"$out/corpus", pipeline, "mrun", ck)
    q2.awaitTermination(120000)
    val c = IngestStream.readCorpus(spark, s"$out/corpus")
    val chunkTexts = c.filter(col("scope") === "chunk")
      .select("filePath", "text").as[(String, String)].collect().toMap
    assert(chunkTexts.keySet == Set("a.py", "c.py"), s"$chunkTexts")
    assert(chunkTexts("a.py").contains("one_v2"), "update applied")

    val finalRaw = spark.read.parquet(s"$out/corpus/raw")
      .select("namespace", "repo", "branch", "filePath", "text").as[RawDoc]
    val oneShot = pipeline.buildCorpus(finalRaw, "oneshot").toDF()
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("rowId", "scope", "repo", "filePath", "text")
      .as[(String, String, String, String, String)].collect().toSet
    assert(key(c) == key(oneShot))
  }

  test("streaming ingest: per-repo refresh equals a one-shot batch ingest") {
    import graft.ingest.IngestPipeline
    import graft.llm.{HashEmbedder, StubLlm}
    import graft.model.RawDoc
    import graft.streaming.IngestStream
    val watch = java.nio.file.Files.createTempDirectory("ingest-watch")
    val out = java.nio.file.Files.createTempDirectory("ingest-out").toString
    val pipeline = new IngestPipeline(new StubLlm, new HashEmbedder(32))

    def drop(ns: String, repo: String, path: String, text: String): Unit = {
      val f = watch.resolve(s"$ns/$repo/$path")
      java.nio.file.Files.createDirectories(f.getParent)
      java.nio.file.Files.writeString(f, text)
    }
    drop("ns", "alpha", "src/a.py", "def alpha_one(): pass\n")
    drop("ns", "alpha", "README.md", "# alpha readme with plenty of text here")

    val ck = java.nio.file.Files.createTempDirectory("ingest-ck").toString
    val q1 = IngestStream.start(
      spark, watch.toString, s"$out/corpus", pipeline, "srun", ck)
    q1.awaitTermination(120000)
    val c1 = IngestStream.readCorpus(spark, s"$out/corpus")
    assert(c1.filter(col("scope") === "chunk").count() == 2)
    assert(c1.filter(col("scope") === "file").count() == 2)

    // second batch: a new file in alpha and a second repo (the file
    // source re-delivers by PATH only, so stream-delivered repos are
    // add-only; same-path updates are covered below via processBatch)
    drop("ns", "alpha", "src/b.py", "def beta_two(): pass\n")
    drop("ns", "beta", "main.go", "package main\nfunc main() {}\n")
    val q2 = IngestStream.start(
      spark, watch.toString, s"$out/corpus", pipeline, "srun", ck)
    q2.awaitTermination(120000)
    val c2 = IngestStream.readCorpus(spark, s"$out/corpus")

    val chunkIds = c2.filter(col("scope") === "chunk")
      .select("rowId").as[String].collect()
    assert(chunkIds.length == chunkIds.distinct.length, "no duplicate rows")
    assert(c2.filter(col("scope") === "chunk").count() == 4)
    // rollups refreshed, not first-version-stale: alpha's file scope now
    // covers 3 files and its repo node aggregates all of them
    assert(c2.filter(col("scope") === "file" && col("repo") === "alpha").count() == 3)
    assert(c2.filter(col("scope") === "repo" && col("repo") === "alpha")
      .select("rollupCount").as[Int].head() == 2) // modules: "" (root) + src
    assert(c2.filter(col("scope") === "catalog").count() == 2, "one catalog per repo")

    // an updated file delivered by a re-delivering source (processBatch
    // directly): latest version wins, chunk text replaced
    val upd = Seq(RawDoc("ns", "alpha", "main", "src/a.py",
      "def alpha_one_v2(): return 42\n")).toDF()
    IngestStream.processBatch(upd, s"$out/corpus", pipeline, "srun-upd")
    val c3 = IngestStream.readCorpus(spark, s"$out/corpus")
    val aText = c3.filter(col("scope") === "chunk" && col("filePath") === "src/a.py")
      .select("text").as[String].collect()
    assert(aText.length == 1 && aText.head.contains("alpha_one_v2"),
      s"updated file must replace its old text, got: ${aText.toSeq}")
    assert(c3.filter(col("scope") === "chunk").count() == 4, "no duplicate chunk rows")

    // deletion rides a tombstone through the STREAM (a marker is a new
    // path, so the path-keyed file source delivers it): drop b.py
    drop("ns", "alpha", "src/b.py.deleted", "tombstone")
    val q3 = IngestStream.start(
      spark, watch.toString, s"$out/corpus", pipeline, "srun", ck)
    q3.awaitTermination(120000)
    val c4 = IngestStream.readCorpus(spark, s"$out/corpus")
    assert(c4.filter(col("scope") === "chunk" && col("filePath") === "src/b.py")
      .count() == 0, "tombstoned file must vanish")
    assert(c4.filter(col("scope") === "file" && col("repo") === "alpha").count() == 2,
      "file rollup refreshed after deletion")

    // a fully-tombstoned repo disappears, partitions cleaned up
    val delBeta = Seq(graft.model.RawDoc(
      "ns", "beta", "main", s"main.go${IngestStream.DeletedSuffix}", "")).toDF()
    IngestStream.processBatch(delBeta, s"$out/corpus", pipeline, "srun-del")
    val c5 = IngestStream.readCorpus(spark, s"$out/corpus")
    assert(c5.filter(col("repo") === "beta").count() == 0, "empty repo removed")

    // THE invariant: the store equals a one-shot batch ingest of the
    // union of delivered files (latest version per file, deletions applied)
    val finalRaw = spark.read.parquet(s"$out/corpus/raw")
      .select("namespace", "repo", "branch", "filePath", "text").as[RawDoc]
    val oneShot = pipeline.buildCorpus(finalRaw, "oneshot").toDF()
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("rowId", "scope", "repo", "filePath", "text")
      .as[(String, String, String, String, String)].collect().toSet
    assert(key(c5) == key(oneShot),
      "streamed store must equal the batch ingest of the final raw set")
  }

  test("attribution marks: cross-batch last touch credits later conversions") {
    import graft.streaming.EventStream.{AttribMark, TEv}
    implicit val sqlCtx = spark.sqlContext
    // batch 1: user 1 clicks; batch 2: purchase (credits the click) and a
    // view; batch 3: second purchase (credits the VIEW, not the click) and
    // a purchase 4+ days later (credits nothing: window expired)
    val b1 = Seq(TEv(1L, 10L, tsH(10, 0), "click"))
    val b2 = Seq(TEv(1L, 11L, tsH(11, 0), "purchase"),
      TEv(1L, 12L, tsH(12, 0), "view"))
    val b3 = Seq(TEv(1L, 13L, tsH(13, 0), "purchase"),
      TEv(1L, 14L, Timestamp.valueOf("2026-01-09 13:00:00"), "purchase"))
    val input = MemoryStream[TEv]
    val q = EventStream.attributionMarks(input.toDS())
      .writeStream.format("memory").queryName("attrib1")
      .outputMode(OutputMode.Append()).start()
    try {
      Seq(b1, b2, b3).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("attrib1").as[AttribMark].collect()
      .map(m => (m.conv_id, m.touch_id, m.touch_type)).toSet
    assert(got == Set((11L, 10L, "click"), (13L, 12L, "view")), s"got $got")
  }

  test("property: attribution marks equal the batch last-touch pick on random streams") {
    import graft.streaming.EventStream.{AttribMark, TEv}
    implicit val sqlCtx = spark.sqlContext
    val types = Array("click", "view", "purchase", "error")
    val windowUs = 3L * 86400L * 1000000L
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      // 5-hour spacing: 60 events span 295h >> the 72h window, so the
      // property exercises in-window, expired and missing-touch cases
      val evs = (0 until 60).map { i =>
        TEv(rnd.nextInt(4).toLong + 1, i.toLong,
          Timestamp.valueOf(java.time.LocalDateTime
            .of(2026, 1, 1, 0, 0).plusHours(5L * i)
            .format(java.time.format.DateTimeFormatter
              .ofPattern("yyyy-MM-dd HH:mm:ss"))),
          types(rnd.nextInt(4)))
      }
      val cuts = Seq(rnd.nextInt(30) + 1, rnd.nextInt(29) + 31).sorted
      val batches = Seq(evs.take(cuts(0)),
        evs.slice(cuts(0), cuts(1)), evs.drop(cuts(1)))
      val name = s"attribprop$seed"
      val input = MemoryStream[TEv]
      val q = EventStream.attributionMarks(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table(name).as[AttribMark].collect()
        .map(m => (m.conv_id, m.touch_id, m.touch_type)).toSet
      // driver-side batch pick: per purchase, the latest in-window touch
      def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      val want = evs.filter(_.event_type == "purchase").flatMap { c =>
        evs.filter(t => Set("click", "view").contains(t.event_type) &&
            t.user_id == c.user_id &&
            us(t.ts) < us(c.ts) && us(t.ts) >= us(c.ts) - windowUs)
          .sortBy(t => (us(t.ts), t.event_id)).lastOption
          .map(t => (c.event_id, t.event_id, t.event_type))
      }.toSet
      assert(got == want, s"seed $seed: $got vs $want")
    }
  }

  test("streaming holt: cross-batch level/trend equal the driver-side fold") {
    import graft.streaming.EventStream.{HoltOut, VEv}
    implicit val sqlCtx = spark.sqlContext
    val (alpha, beta) = (0.25, 0.1)
    val input = MemoryStream[VEv]
    val q = EventStream.holt(input.toDS(), alpha, beta)
      .writeStream.format("memory").queryName("holt")
      .outputMode(OutputMode.Append()).start()
    // a rising series: Holt's trend must become positive and the 1-step
    // forecast must beat plain EWMA's lag on the ramp
    val evs = Seq(
      VEv(1, 1, ts(0), 1.0), VEv(1, 2, ts(1), 2.0),  // batch 1
      VEv(1, 3, ts(5), 3.0), VEv(1, 4, ts(6), 4.0),  // batch 2
      VEv(2, 5, ts(7), 7.0))                          // single point: no trend
    try {
      input.addData(evs.take(2): _*)
      q.processAllAvailable()
      input.addData(evs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("holt").as[HoltOut].collect()
      .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_events)).toMap
    // driver-side fold over the full ordered stream — bit-exact parity
    def fold(vs: Seq[Double]): (Double, Double) =
      vs.tail.foldLeft((vs.head, 0.0)) { case ((l0, b0), v) =>
        val l = alpha * v + (1 - alpha) * (l0 + b0)
        val b = beta * (l - l0) + (1 - beta) * b0
        (l, b)
      }
    val (l1, b1) = fold(Seq(1.0, 2.0, 3.0, 4.0))
    assert(got(1L).level == l1 && got(1L).trend == b1,
      s"user 1: ${got(1L)} != ($l1, $b1)")
    assert(b1 > 0, "rising series must carry a positive trend")
    assert(got(2L) == HoltOut(2L, 1L, 7.0, 0.0), "single point: no trend")
    // stream ≡ batch: the relational fold (ev_holt) over the same rows
    // lands on the same rounded (level, trend) pair
    val dir = java.nio.file.Files.createTempDirectory("holtfix").toString
    evs.map(e => (e.event_id, e.ts, e.user_id, "x", e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batchQ = graft.queries.EventQueries.qEventHolt(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    got.foreach { case (u, h) =>
      val (bl, bb) = batchQ(u)
      assert(math.rint(h.level * 1e6) / 1e6 == bl &&
        math.rint(h.trend * 1e6) / 1e6 == bb,
        s"user $u stream $h vs batch ($bl, $bb)")
    }
  }

  test("funnel anchors: pre-view clicks rejected, anchors lock once across batches") {
    import graft.streaming.EventStream.{AnchorMark, TEv}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TEv]
    val q = EventStream.funnelAnchors(input.toDS())
      .writeStream.format("memory").queryName("anchors")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: click BEFORE the first view must not anchor; the view
      // locks in the same batch
      input.addData(
        TEv(1, 1, ts(0), "click"), TEv(1, 2, ts(5), "view"),
        TEv(2, 3, ts(0), "view"))
      q.processAllAvailable()
      // batch 2 bridges state: user 1's first valid click locks (the
      // second click is silent), then the purchase; user 2's purchase
      // without any click stays rejected; user 3's whole journey lands
      // at ONE instant with the click FIRST by event_id — the batch
      // semantics (us >= tv) count it, so the stream must too
      input.addData(
        TEv(1, 4, ts(10), "click"), TEv(1, 5, ts(12), "click"),
        TEv(1, 6, ts(15), "purchase"),
        TEv(2, 7, ts(3), "purchase"),
        TEv(3, 8, ts(20), "purchase"), TEv(3, 9, ts(20), "click"),
        TEv(3, 10, ts(20), "view"),
        // user 4: the whole same-instant journey delivered REVERSED
        // ACROSS BATCH CUTS — purchase and click land this batch, the
        // view only in the next; the batch query (us >= tv) counts all
        // three at latency 0, so the stream must resurrect them
        TEv(4, 11, ts(30), "purchase"), TEv(4, 12, ts(30), "click"))
      q.processAllAvailable()
      input.addData(TEv(4, 13, ts(30), "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("anchors").as[AnchorMark].collect()
      .map(m => (m.user_id, m.anchor, m.ts)).toSet
    assert(got == Set(
      (1L, "view", ts(5)), (1L, "click", ts(10)), (1L, "purchase", ts(15)),
      (2L, "view", ts(0)),
      (3L, "view", ts(20)), (3L, "click", ts(20)), (3L, "purchase", ts(20)),
      (4L, "view", ts(30)), (4L, "click", ts(30)), (4L, "purchase", ts(30))))
  }

  test("property: funnel anchors equal the batch report on random tie-dense streams") {
    import graft.streaming.EventStream.TEv
    implicit val sqlCtx = spark.sqlContext
    val types = Array("view", "click", "purchase", "error")
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(4200 + seed)
      // minutes drawn from a SMALL range so same-instant collisions are
      // common — the equal-timestamp ordering class the review caught
      val evs = (0 until 80).map { i =>
        TEv(rnd.nextInt(5).toLong + 1, i.toLong,
          ts(rnd.nextInt(12)), types(rnd.nextInt(4)))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"funprop$seed").toString
      evs.map(e => (e.event_id, e.ts, e.user_id, e.event_type, 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      // event-time-ordered delivery, ARBITRARY order within an instant
      // (the operator's only premise is event-time monotonicity across
      // batches — equal-timestamp events may split across cuts with the
      // prerequisite last); cuts land anywhere, including mid-timestamp
      val ordered = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val cuts = Seq(rnd.nextInt(40) + 1, rnd.nextInt(39) + 41).sorted
      val name = s"funprop$seed"
      val input = MemoryStream[TEv]
      val q = EventStream.funnelAnchors(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        Seq(ordered.take(cuts(0)), ordered.slice(cuts(0), cuts(1)),
          ordered.drop(cuts(1))).foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
        }
      } finally q.stop()
      val stream = EventStream.funnelLatencyReport(spark.table(name))
        .collect().map(_.toSeq).toSeq
      val batch = graft.queries.EventQueries.qFunnelLatency(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(stream == batch, s"seed $seed: $stream != $batch")
    }
  }

  test("interval join: native stream-stream join equals the batch relation on testdata") {
    import graft.streaming.EventStream.TEv
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = graft.queries.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts", "event_type")
      .as[TEv].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[TEv]
    val q = graft.streaming.EventStream.intervalPairs(input.toDS())
      .writeStream.format("memory").queryName("ivpairs")
      .outputMode(OutputMode.Append()).start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val stream = spark.table("ivpairs")
      .orderBy(col("user_id"), col("view_id"), col("click_id"))
      .collect().map(_.toSeq).toSeq
    val batch = graft.queries.EventQueries.qIntervalPairs(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(stream.nonEmpty, "fixture must produce view-click pairs")
    assert(stream == batch, s"stream ${stream.size} rows != batch ${batch.size}")
  }

  test("funnel anchors: ledger report equals the batch latency query on testdata") {
    import graft.streaming.EventStream.TEv
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // event-time-ordered delivery (the family's arrival-order premise):
    // sort the corpus by ts and drain it as three contiguous batches
    val evs = graft.queries.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts", "event_type")
      .as[TEv].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[TEv]
    val q = EventStream.funnelAnchors(input.toDS())
      .writeStream.format("memory").queryName("anchors_sf")
      .outputMode(OutputMode.Append()).start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val stream = EventStream.funnelLatencyReport(spark.table("anchors_sf"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val batch = graft.queries.EventQueries.qFunnelLatency(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(stream.toSeq == batch.toSeq,
      s"stream ${stream.toSeq} != batch ${batch.toSeq}")
  }
}
