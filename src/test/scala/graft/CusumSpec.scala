package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._

/** CUSUM changepoint detection (ev_cusum): driver-side replication of
  * the standardization + two-sided tabular CUSUM fold on the engine's
  * own densified series. Oracle parity vs the recursive-CTE fold is the
  * cross-engine gate; this is the independent third implementation.
  */
class CusumSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private val (k, h) = (0.5, 4.0)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The reference fold, straight from the operator's definition. */
  private def ref(vals: Array[Double]): (Double, Double, Long, Long) = {
    val n = vals.length
    val mean = r6(vals.foldLeft(0.0)(_ + _) / n)
    val sd = r6(math.sqrt(
      vals.foldLeft(0.0)((p, q) => p + (q - mean) * (q - mean)) / n))
    var sp = 0.0; var sn = 0.0; var na = 0L; var fi = 0L
    vals.zipWithIndex.foreach { case (x, i0) =>
      val z = if (sd == 0.0) 0.0 else (x - mean) / sd
      sp = math.max(0.0, sp + z - k)
      sn = math.max(0.0, sn - z - k)
      if (sp > h || sn > h) {
        na += 1
        if (fi == 0L) fi = i0 + 1L
      }
    }
    (r6(sp), r6(sn), na, fi)
  }

  test("ev_cusum equals a driver-side replication on the real series") {
    val e = graft.queries.Tables.events(spark, sf)
    val counts = e.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hh"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.getLong(2)).toMap
    val hours = {
      val b = e.agg(date_trunc("hour", min(col("ts"))),
        date_trunc("hour", max(col("ts")))).head()
      (b.getTimestamp(0).getTime to b.getTimestamp(1).getTime by 3600000L).toArray
    }
    val rows = EventQueries.qEventCusum(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(0)
      val series = hours.map(hh => counts.getOrElse((t, hh), 0L).toDouble)
      assert(r.getLong(1) == series.length, s"$t: series length")
      val want = ref(series)
      val got = (r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5))
      assert(got == want, s"$t: $got != $want")
    }
    // the detector must actually fire somewhere and stay quiet elsewhere
    // (first_alarm_i > 0 for at least one type on this corpus)
    assert(rows.exists(_.getLong(5) > 0), "some type alarms")
  }

  test("streaming cusum: cross-batch state equals the batch fold on the real series") {
    import graft.streaming.EventStream
    import graft.streaming.EventStream.{CusumOut, SeriesPoint}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // rebuild the densified per-type series exactly as the batch query
    val e = graft.queries.Tables.events(spark, sf)
    val counts = e.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hh"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.getLong(2)).toMap
    val b = e.agg(date_trunc("hour", min(col("ts"))),
      date_trunc("hour", max(col("ts")))).head()
    val hours = (b.getTimestamp(0).getTime to b.getTimestamp(1).getTime
      by 3600000L).toArray
    val types = counts.keys.map(_._1).toSeq.distinct.sorted
    val series = types.map { t =>
      t -> hours.map(hh => counts.getOrElse((t, hh), 0L).toDouble)
    }.toMap

    // reference (mean, sd) = the batch query's own rounded calibration
    val ref = series.view.mapValues { vals =>
      val mean = r6(vals.foldLeft(0.0)(_ + _) / vals.length)
      (mean, r6(math.sqrt(vals.foldLeft(0.0)(
        (p, q) => p + (q - mean) * (q - mean)) / vals.length)))
    }.toMap

    val pts = types.flatMap(t => series(t).zipWithIndex.map {
      case (v, i) => SeriesPoint(t, i + 1L, v)
    })
    val input = MemoryStream[SeriesPoint]
    val q = EventStream.cusum(input.toDS(), ref)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = pts.partition(_.seq <= 200)
      val (b2, b3) = rest.partition(_.seq <= 500)
      Seq(b1, b2, b3).foreach { batch =>
        input.addData(batch: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("cusum_stream").as[CusumOut].collect()
      .groupBy(_.event_type).view.mapValues(_.maxBy(_.n)).toMap

    // parity vs ev_cusum (rounded fields) — same series, same calibration
    val batchRows = graft.queries.EventQueries.qEventCusum(spark, sf).collect()
    batchRows.foreach { r =>
      val t = r.getString(0)
      val s = got(t)
      assert(s.n == r.getLong(1), s"$t: n")
      assert(r6(s.sp) == r.getDouble(2) && r6(s.sn) == r.getDouble(3),
        s"$t: (${r6(s.sp)}, ${r6(s.sn)}) != (${r.getDouble(2)}, ${r.getDouble(3)})")
      assert(s.n_alarm_points == r.getLong(4) && s.first_alarm_i == r.getLong(5),
        s"$t: alarms (${s.n_alarm_points}, ${s.first_alarm_i})")
    }
  }

  test("cusum catches a sustained small shift a pointwise z-test misses") {
    // 200 points: N=150 baseline of alternating 10/12, then 50 at 13 —
    // a ~1σ shift no single point of which is a 3σ outlier
    val vals = (Array.tabulate(150)(i => if (i % 2 == 0) 10.0 else 12.0)
      ++ Array.fill(50)(13.0))
    val n = vals.length
    val mean = vals.sum / n
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / n)
    assert(vals.forall(v => math.abs(v - mean) / sd < 3.0),
      "no pointwise 3-sigma outlier in the fixture")
    val (_, _, na, fi) = ref(vals)
    assert(na > 0 && fi > 150, s"alarm fires inside the shifted tail (fi=$fi)")
  }
}
