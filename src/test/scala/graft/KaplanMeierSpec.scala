package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Kaplan–Meier time-to-conversion (ev_km): a hand-computed textbook
  * fixture where right-censoring changes the answer (the reason KM
  * exists), plus a driver-side recomputation on sf0.001.
  */
class KaplanMeierSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def t(day: Int) = new Timestamp(1700000000000L + day * 86400000L)

  test("right-censoring enters the risk set but never the event count") {
    import spark.implicits._
    // u1 converts at t=2; u2 censored at t=4; u3 converts at t=5;
    // u4 censored at t=1; u5 censored at t=2 (same duration as u1's event)
    val rows = Seq(
      (1L, 1L, t(0), "view"), (2L, 1L, t(2), "purchase"),
      (3L, 2L, t(0), "view"), (4L, 2L, t(4), "click"),
      (5L, 3L, t(0), "view"), (6L, 3L, t(5), "purchase"),
      (7L, 4L, t(0), "view"), (8L, 4L, t(1), "click"),
      (9L, 5L, t(0), "view"), (10L, 5L, t(2), "click"))
      .map { case (eid, u, ts, ty) => (eid, ts, u, ty, 0.0, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("km").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qKaplanMeier(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    // t=2: risk {u1,u2,u3,u5}=4, 1 event, 1 censored -> S=3/4
    // t=5: risk {u3}=1 (u2 censored at 4 left), 1 event -> S=0 exactly
    assert(got == Seq(
      (2, 4L, 1L, 1L, 0.75),
      (5, 1L, 1L, 0L, 0.0)), s"got $got")
  }

  test("ev_km equals a driver-side recomputation on sf0.001") {
    val pu = graft.queries.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("fd"), max(to_date(col("ts"))).as("ld"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .as("cd"))
      .collect()
      .map { r =>
        val fd = r.getDate(1).toLocalDate
        val cd = Option(r.getDate(3)).map(_.toLocalDate)
        val t = cd.getOrElse(r.getDate(2).toLocalDate)
        (java.time.temporal.ChronoUnit.DAYS.between(fd, t).toInt, cd.isDefined)
      }.toSeq
    val byT = pu.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toMap
    var surv = 1.0
    val want = byT.keys.toSeq.sorted.flatMap { td =>
      val (d, c) = byT(td)
      val nRisk = pu.count(_._1 >= td).toLong
      if (d == 0) None
      else {
        surv *= 1.0 - d.toDouble / nRisk
        Some((td, nRisk, d, c, round6(surv)))
      }
    }
    val got = EventQueries.qKaplanMeier(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4,
        s"counts: $g vs $w")
      assert(math.abs(g._5 - w._5) <= 1.0001e-6, s"survival: $g vs $w")
    }
    assert(got.size == want.size && got.nonEmpty)
    assert(got.last._5 < got.head._5, "the curve actually falls")
  }
}
