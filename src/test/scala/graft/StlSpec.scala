package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._

/** Classical seasonal decomposition (ev_stl): a planted-pattern fixture
  * (the seasonal profile must recover the planted hour-of-day shape; a
  * flat series must yield zero seasonal and NULL strength), plus a full
  * driver-side recomputation on sf0.001. Oracle parity vs DuckDB is the
  * driver gate.
  */
class StlSpec extends SparkSpec {

  /** Driver replica of the exact-integer pipeline over per-hour counts
    * laid out on a dense 0..len-1 axis (len ≥ 696). */
  private def refStl(counts: Map[(String, Int), Long], types: Seq[String],
      len: Int, hodOf: Int => Int): Map[String, (Map[Int, Double], Option[Double])] =
    types.map { t =>
      val n = (0 until len).map(i => counts.getOrElse((t, i), 0L))
      val det = (12 until 684).map { i =>
        val s1 = (i - 12 to i + 11).map(n).sum
        val s2 = (i - 11 to i + 12).map(n).sum
        (hodOf(i), 48L * n(i) - s1 - s2)
      }
      val sSum = det.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val tot = sSum.values.sum
      val scNum = sSum.view.mapValues(s => 24L * s - tot).toMap
      val seasonal = scNum.view
        .mapValues(v => TestHash.roundHalfUp(v / 32256.0, 6)).toMap
      val nr = det.map { case (hod, d) => 672L * d - scNum(hod) }
      val nsr = det.map { case (_, d) => 672L * d }
      def varOf(xs: Seq[Long]): Double = {
        val m = xs.length.toDouble
        val s = xs.sum.toDouble
        val s2 = xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
        s2 - s * s / m
      }
      val (vr, vsr) = (varOf(nr), varOf(nsr))
      val strength = if (vsr == 0.0) None
        else Some(TestHash.roundHalfUp(math.max(0.0, 1.0 - vr / vsr), 6))
      t -> (seasonal, strength)
    }.toMap

  test("planted hour-of-day pattern is recovered; flat series yields NULL strength") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stl").toString
    // epoch-based so the fixture is timezone-independent (the session
    // runs UTC; Timestamp.valueOf would parse in the JVM default zone):
    // 2024-03-01T00:30:00Z — axis hour 0 is hod 0 in UTC
    val base = java.time.Instant.parse("2024-03-01T00:30:00Z").toEpochMilli
    // 720 hours; 'wave' carries n(h) = 3 + (hod % 12); 'flat' constant 5
    val rows = (0 until 720).flatMap { i =>
      val ts = new java.sql.Timestamp(base + i * 3600L * 1000)
      val hod = i % 24 // axis starts at hour 0 of the day
      Seq.fill(3 + (hod % 12))(("wave", ts)) ++ Seq.fill(5)(("flat", ts))
    }
    rows.toDF("event_type", "ts").write.parquet(s"$dir/events.parquet")
    val got = EventQueries.qStlSeasonal(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got.size == 48, s"24 hods x 2 types: ${got.size}")
    // flat: zero seasonal everywhere, strength NULL (VarSR = 0)
    (0 until 24).foreach { h =>
      assert(got(("flat", h))._1 == 0.0, s"flat hod $h seasonal")
      assert(got(("flat", h))._2.isEmpty, s"flat hod $h strength")
    }
    // wave: matches the driver replica exactly, and the planted shape
    // survives — hod 11 (peak of the ramp) beats hod 0/12 (troughs)
    val counts = (0 until 720).map(i => ("wave", i) -> (3L + (i % 24) % 12)).toMap ++
      (0 until 720).map(i => ("flat", i) -> 5L).toMap
    val want = refStl(counts, Seq("wave", "flat"), 720, i => i % 24)
    (0 until 24).foreach { h =>
      assert(got(("wave", h))._1 == want("wave")._1(h), s"wave hod $h seasonal")
    }
    assert(got(("wave", 0))._2 == want("wave")._2)
    val s = want("wave")._2.get
    assert(s > 0.9, s"the planted cycle should dominate: strength $s")
    assert(got(("wave", 11))._1 > got(("wave", 0))._1 &&
      got(("wave", 11))._1 > got(("wave", 12))._1, "ramp peak at hod 11")
    // centering: the 24 seasonals sum to ~0 (numerators sum to exactly 0)
    val sum = (0 until 24).map(h => got(("wave", h))._1).sum
    assert(math.abs(sum) < 1e-4, s"seasonal must be centered: $sum")
  }

  test("streaming hourly ledger serves the identical report; replay is a no-op") {
    import graft.streaming.EventStream
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("stl-stream").toString
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("ts"))
    // three deterministic micro-batches; hours REPEAT across batches,
    // so the merge-on-read sum of partials is genuinely exercised
    (0 until 3).foreach { b =>
      EventStream.writeHourlyDelta(
        ev.filter(col("event_id") % 3 === b), s"$dir/led", b.toLong)
    }
    def report() = EventStream.stlReport(spark, s"$dir/led").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    val stream = report()
    val batch = EventQueries.qStlSeasonal(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(stream.nonEmpty && stream == batch,
      "ledger-served report must equal the batch decomposition")
    // crash-replay of batch 2: overwrite-by-path → byte-identical no-op
    EventStream.writeHourlyDelta(
      ev.filter(col("event_id") % 3 === 2), s"$dir/led", 2L)
    assert(report() == stream, "replay changed the ledger")
  }

  test("fresh=true anchors the served window to the axis tail") {
    import graft.streaming.EventStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stl-fresh").toString
    val base = java.time.Instant.parse("2024-03-01T00:30:00Z").toEpochMilli
    def tsAt(i: Int) = new java.sql.Timestamp(base + i.toLong * 3600L * 1000)
    // 900 hours, one event every hour (so truncations keep exact hour
    // bounds); the hod ramp switches on only in the back half — the
    // head-anchored window [12, 684) and the tail-anchored window
    // [216, 888) see genuinely different signals
    val rows = (0 until 900).flatMap { i =>
      val extra = if (i >= 450) (i % 24) % 12 else 0
      Seq.fill(1 + extra)(("x", tsAt(i)))
    }
    rows.toDF("event_type", "ts").write.parquet(s"$dir/full/events.parquet")
    (0 until 2).foreach { b =>
      EventStream.writeHourlyDelta(
        rows.toDF("event_type", "ts").filter(col("ts").cast("long") % 2 === b),
        s"$dir/led", b.toLong)
    }
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    val stale = rowsOf(EventStream.stlReport(spark, s"$dir/led"))
    val freshR = rowsOf(EventStream.stlReport(spark, s"$dir/led", fresh = true))
    // default stays the batch oracle verbatim
    assert(stale == rowsOf(EventQueries.qStlSeasonal(spark, s"$dir/full")),
      "fresh=false must stay batch-parity")
    // non-circular tail check: the tail-anchored slab over the 900-hour
    // axis analyzes exactly the hours a HEAD-anchored run analyzes over
    // the corpus truncated to the last 696 hours (same absolute hours
    // h1-683 .. h1-12, same counts, same hod) — so the reports are equal
    rows.filter { case (_, ts) => ts.getTime >= base + 204L * 3600_000L }
      .toDF("event_type", "ts").write.parquet(s"$dir/tail/events.parquet")
    assert(freshR == rowsOf(EventQueries.qStlSeasonal(spark, s"$dir/tail")),
      "fresh=true must equal the head-anchored run on the tail-truncated corpus")
    assert(freshR != stale, "the ramp-only-in-tail fixture must separate the anchors")
    // a late straggler EARLIER than the current axis min extends the
    // axis head: the tail-anchored report is pinned to max-hour and
    // must not move; the head-anchored one shifts with it
    EventStream.writeHourlyDelta(
      Seq(("x", new java.sql.Timestamp(base - 50L * 3600_000L)))
        .toDF("event_type", "ts"), s"$dir/led", 2L)
    assert(rowsOf(EventStream.stlReport(spark, s"$dir/led", fresh = true)) == freshR,
      "an early straggler must not move the tail-anchored window")
    assert(rowsOf(EventStream.stlReport(spark, s"$dir/led")) != stale,
      "the head-anchored window shifts with the straggler (documented)")
  }

  test("engine output equals a full driver recomputation on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val e = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime))
    val h0 = e.map(_._2).min
    val len = ((e.map(_._2).max - h0) / 3600000L).toInt + 1
    assert(len >= 696, s"fixture precondition: $len")
    val counts = e.groupBy(x => (x._1, ((x._2 - h0) / 3600000L).toInt))
      .view.mapValues(_.length.toLong).toMap
    val types = e.map(_._1).distinct.toSeq.sorted
    val hodOf = (i: Int) =>
      java.time.Instant.ofEpochMilli(h0 + i * 3600000L)
        .atZone(java.time.ZoneOffset.UTC).getHour
    val want = refStl(counts, types, len, hodOf)
    val got = EventQueries.qStlSeasonal(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got.size == types.size * 24)
    got.foreach { case ((t, h), (seas, str)) =>
      assert(seas == want(t)._1(h), s"type $t hod $h seasonal")
      // NULL-ness must agree BEFORE comparing values — Option.zip would
      // silently skip a NULL-vs-value disagreement (the one branch the
      // cross-engine NULL routing could get wrong)
      assert(str.isDefined == want(t)._2.isDefined,
        s"type $t strength nullness: engine $str vs replica ${want(t)._2}")
      str.zip(want(t)._2).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-6, s"type $t strength $a vs $b")
      }
    }
  }
}
