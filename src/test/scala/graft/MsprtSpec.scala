package graft

import graft.queries.EventQueries
import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Always-valid mSPRT readout (ev_msprt): a fixture with a real effect
  * proving the significance flag can fire (and that the running-min
  * p-value is monotone), plus a driver-side recomputation of the whole
  * daily readout on sf0.001 — the independent third implementation.
  */
class MsprtSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Tau2 = 0.05 * 0.05

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  private def variantOf(u: Long): String =
    if (Integer.parseInt(md5hex(u.toString).substring(0, 4), 16) % 2 == 0) "A"
    else "B"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The readout, re-derived: (user, variant, firstDay, convDay?) →
    * per-day (n_a, conv_a, n_b, conv_b, theta, pAlways). */
  private def ref(users: Seq[(Long, String, Int, Option[Int])],
      days: Seq[Int]): Seq[(Int, Long, Long, Long, Long, Double, Double)] = {
    var runMin = 1.0
    days.sorted.map { t =>
      def cnt(v: String, f: ((Long, String, Int, Option[Int])) => Boolean) =
        users.count(u => u._2 == v && f(u)).toLong
      val (na, nb) = (cnt("A", _._3 <= t), cnt("B", _._3 <= t))
      val (ca, cb) = (cnt("A", _._4.exists(_ <= t)), cnt("B", _._4.exists(_ <= t)))
      val (theta, v) =
        if (na > 0 && nb > 0) {
          val p = (ca + cb).toDouble / (na + nb)
          (cb.toDouble / nb - ca.toDouble / na,
            p * (1 - p) * (1.0 / na + 1.0 / nb))
        } else (0.0, 0.0)
      val lnlam =
        if (v > 0) 0.5 * math.log(v / (v + Tau2)) +
          theta * theta * Tau2 / (2 * v * (v + Tau2))
        else 0.0
      runMin = math.min(runMin, math.min(1.0, math.exp(-lnlam)))
      (t, na, ca, nb, cb, round6(theta), round6(runMin))
    }
  }

  test("a real effect fires the flag; the always-valid p never increases") {
    import spark.implicits._
    // 40 users per arm picked BY the hash: arm B always converts on day
    // 1, arm A never does — theta = 1 with V = 0.0125 gives ln-lambda
    // ~6.6, p ~0.0014, decisively past alpha = 0.05
    val as = (1L to 500L).filter(variantOf(_) == "A").take(40)
    val bs = (1L to 500L).filter(variantOf(_) == "B").take(40)
    def t(dayIdx: Int) = new Timestamp(1700000000000L + dayIdx * 86400000L)
    val rows =
      as.zipWithIndex.map { case (u, i) =>
        (i.toLong, t(0), u, "view", 0.0, "{}") } ++
      bs.zipWithIndex.map { case (u, i) =>
        (1000L + i, t(0), u, "purchase", 0.0, "{}") } ++
      Seq((2000L, t(1), as.head, "view", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("msprt").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qMsprt(spark, dir).collect()
    assert(got.forall(_.getBoolean(7)), s"both days significant")
    val ps = got.map(_.getDouble(6))
    assert(ps.sliding(2).forall(p => p.last <= p.head), "p never increases")
    assert(ps.head < 0.01, s"decisive effect: p = ${ps.head}")
  }

  test("ev_msprt equals a driver-side recomputation on sf0.001") {
    val epoch = java.time.LocalDate.ofEpochDay(0)
    val pu = graft.queries.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("fd"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .as("cd"))
      .collect()
      .map(r => (r.getLong(0), variantOf(r.getLong(0)),
        r.getDate(1).toLocalDate.toEpochDay.toInt,
        Option(r.getDate(2)).map(_.toLocalDate.toEpochDay.toInt)))
      .toSeq
    val days = graft.queries.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d")).distinct().collect()
      .map(_.getDate(0).toLocalDate.toEpochDay.toInt).toSeq
    val want = ref(pu, days)
    val got = EventQueries.qMsprt(spark, sf).collect().map { r =>
      (r.getDate(0).toLocalDate.toEpochDay.toInt, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))
    }.toSeq
    assert(got.map(x => (x._1, x._2, x._3, x._4, x._5)) ==
      want.map(x => (x._1, x._2, x._3, x._4, x._5)), "cumulative counts")
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._6 - w._6) <= 1.0001e-6, s"theta day ${g._1}")
      assert(math.abs(g._7 - w._7) <= 1.0001e-6, s"p_always day ${g._1}")
    }
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7))

  test("streaming monitor marks fold to the exact batch readout (sf0.001)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evs = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => EventStream.TEv(r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getString(3)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[EventStream.TEv]
    val q = EventStream.msprtMarks(input.toDS())
      .writeStream.format("memory").queryName("msprt_marks")
      .outputMode(OutputMode.Append()).start()
    evs.grouped(math.max(evs.length / 3, 1)).foreach { chunk =>
      input.addData(chunk.toSeq); q.processAllAvailable()
    }
    q.stop()
    val spine = graft.queries.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("obs_day")).distinct()
    val got = EventStream
      .msprtReport(spark.table("msprt_marks"), spine)
      .collect().map(key).toSeq
    val want = EventQueries.qMsprt(spark, sf).collect().map(key).toSeq
    assert(got == want, "stream ledger ≡ batch readout, bit for bit")
    assert(spark.table("msprt_marks").count() <=
      2 * evs.map(_.user_id).distinct.length, "at most two marks per user")
  }

  test("marks dedup across micro-batches: one enter, one convert, ever") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(i: Int) = new Timestamp(1700000000000L + i * 1000L)
    val input = MemoryStream[EventStream.TEv]
    val q = EventStream.msprtMarks(input.toDS())
      .writeStream.format("memory").queryName("msprt_dedup")
      .outputMode(OutputMode.Append()).start()
    input.addData(Seq(
      EventStream.TEv(7L, 1L, t(0), "view"),
      EventStream.TEv(7L, 2L, t(1), "purchase")))
    q.processAllAvailable()
    input.addData(Seq(
      EventStream.TEv(7L, 3L, t(2), "purchase"),
      EventStream.TEv(7L, 4L, t(3), "view")))
    q.processAllAvailable()
    q.stop()
    val marks = spark.table("msprt_dedup").collect()
      .map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(marks.sorted == Seq((7L, "convert"), (7L, "enter")),
      s"later activity re-marks nothing: ${marks.toSeq}")
  }
}
