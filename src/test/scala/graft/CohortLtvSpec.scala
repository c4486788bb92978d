package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Cohort LTV triangle (ev_cohort_ltv): a hand-computed fixture (dense
  * grid, zero-revenue cells flat, per-user normalization) and a full
  * driver-side recomputation on sf0.001.
  */
class CohortLtvSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def t(day: Int) = new Timestamp(1700000000000L + day * 86400000L)

  private def round(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("dense triangle: empty cells flat, cumulative normalized per user") {
    import spark.implicits._
    // cohort day0: u1, u2 (u1 buys 10 on day0, 20 on day2; u2 never);
    // cohort day1: u3 (buys 6 on day1 = age 0). corpus ends day2.
    val rows = Seq(
      (1L, 1L, t(0), "purchase", 10.0), (2L, 2L, t(0), "view", 0.0),
      (3L, 1L, t(2), "purchase", 20.0), (4L, 3L, t(1), "purchase", 6.0),
      (5L, 3L, t(2), "view", 0.0))
      .map { case (e, u, ts, ty, v) => (e, ts, u, ty, v, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("ltv").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qCohortLtv(spark, dir).collect()
      .map(r => (r.getDate(0).toString.takeRight(2), r.getInt(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val d0 = got.filter(_._1 == got.head._1)
    assert(d0.map(x => (x._2, x._3, x._4, x._5)).toSeq == Seq(
      (0, 2L, 10.0, 5.0),   // 10 over 2 users
      (1, 2L, 0.0, 5.0),    // empty cell: flat cumulative
      (2, 2L, 20.0, 15.0)), // (10+20)/2
      s"cohort day0 triangle: ${d0.toSeq}")
    val d1 = got.filterNot(_._1 == got.head._1)
    assert(d1.map(x => (x._2, x._3, x._4, x._5)).toSeq == Seq(
      (0, 1L, 6.0, 6.0), (1, 1L, 0.0, 6.0)),
      s"cohort day1 horizon is end-bounded: ${d1.toSeq}")
  }

  test("ev_cohort_ltv equals a driver-side recomputation on sf0.001") {
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getString(2), r.getDouble(3))).toSeq
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val end = ev.map(_._2).max
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size).toMap
    val rev = ev.filter(_._3 == "purchase")
      .groupBy(e => (cohort(e._1), e._2 - cohort(e._1)))
      .view.mapValues(_.map(_._4).sum).toMap
    val want = sizes.keys.toSeq.sorted.flatMap { cd =>
      var cum = 0.0
      (0L to (end - cd)).map { age =>
        val r = rev.getOrElse((cd, age), 0.0)
        cum += r
        (cd, age, sizes(cd).toLong, round(r, 2), round(cum / sizes(cd), 4))
      }
    }
    val got = EventQueries.qCohortLtv(spark, sf).collect().map { r =>
      (r.getDate(0).toLocalDate.toEpochDay, r.getInt(1).toLong, r.getLong(2),
        r.getDouble(3), r.getDouble(4))
    }.toSeq
    assert(got.size == want.size, s"${got.size} vs ${want.size}")
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
      assert(math.abs(g._4 - w._4) <= 0.0101 && math.abs(g._5 - w._5) <= 1.1e-4,
        s"$g vs $w")
    }
  }
}
