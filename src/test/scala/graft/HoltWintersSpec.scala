package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Holt-Winters (ev_holt_winters): driver-side replication of the full
  * init+fold on the engine's own densified series, seasonal-sum
  * structure, and slot labeling. Oracle parity vs the recursive-CTE
  * fold is the driver gate.
  */
class HoltWintersSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private val (a, bt, g, m) = (0.25, 0.05, 0.2, 24)

  /** The reference fold, straight from the operator's definition. */
  private def ref(vals: Array[Double]): (Double, Double, Array[Double]) = {
    val mean1 = vals.take(m).foldLeft(0.0)(_ + _) / m
    val mean2 = vals.slice(m, 2 * m).foldLeft(0.0)(_ + _) / m
    var l = mean1
    var b = (mean2 - mean1) / m
    var s = vals.slice(m, 2 * m).map(_ - mean1)
    vals.drop(2 * m).foreach { x =>
      val sh = s.head
      val l2 = a * (x - sh) + (1 - a) * (l + b)
      val b2 = bt * (l2 - l) + (1 - bt) * b
      s = s.tail :+ (g * (x - l2) + (1 - g) * sh)
      l = l2; b = b2
    }
    (l, b, s)
  }

  test("engine fold equals the driver-side replication on the real series") {
    // rebuild the densified per-type hourly series exactly as the query
    val e = graft.queries.Tables.events(spark, sf)
    val counts = e.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.getLong(2)).toMap
    val hours = {
      val b = e.agg(date_trunc("hour", min(col("ts"))),
        date_trunc("hour", max(col("ts")))).head()
      val (h0, h1) = (b.getTimestamp(0).getTime, b.getTimestamp(1).getTime)
      (h0 to h1 by 3600000L).toArray
    }
    val got = EventQueries.qHoltWinters(spark, sf).collect()
      .groupBy(_.getString(0))
    assert(got.nonEmpty)
    got.foreach { case (tpe, rows) =>
      val vals = hours.map(h => counts.getOrElse((tpe, h), 0L).toDouble)
      assert(vals.length >= 2 * m + 1, s"series too short: ${vals.length}")
      val (l, b, s) = ref(vals)
      val n = vals.length
      // rows are (event_type, slot, seasonal, level, trend, forecast)
      rows.foreach { r =>
        assert(r.getDouble(3) == math.rint(l * 1e6) / 1e6 ||
          math.abs(r.getDouble(3) - l) < 1e-6, s"level: $r vs $l")
        assert(math.abs(r.getDouble(4) - b) < 1e-6, s"trend: $r vs $b")
        assert(math.abs(r.getDouble(5) - (l + b + s.head)) < 1e-6,
          s"forecast: $r")
      }
      // slot j0 of queue position maps back to the right seasonal
      val bySlot = rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
      s.zipWithIndex.foreach { case (sv, j0) =>
        val slot = (n + j0) % m
        assert(math.abs(bySlot(slot) - sv) < 1e-6,
          s"$tpe slot $slot: ${bySlot(slot)} vs $sv")
      }
      assert(rows.length == m, "one row per season slot")
    }
  }

  test("backtest: truncated fit + h-step forecasts match the driver replication") {
    val e = graft.queries.Tables.events(spark, sf)
    val counts = e.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.getLong(2)).toMap
    val hours = {
      val b = e.agg(date_trunc("hour", min(col("ts"))),
        date_trunc("hour", max(col("ts")))).head()
      (b.getTimestamp(0).getTime to b.getTimestamp(1).getTime by 3600000L).toArray
    }
    val got = EventQueries.qHwBacktest(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    got.foreach { case (tpe, (maeHw, maeSn)) =>
      val vals = hours.map(h => counts.getOrElse((tpe, h), 0L).toDouble)
      val n = vals.length
      val (l, b, s) = ref(vals.take(n - m))
      val wantHw = (1 to m).map(h =>
        math.abs(l + h * b + s(h - 1) - vals(n - m + h - 1))).sum / m
      val wantSn = (1 to m).map(h =>
        math.abs(vals(n - 2 * m + h - 1) - vals(n - m + h - 1))).sum / m
      assert(math.abs(maeHw - wantHw) < 1e-4, s"$tpe mae_hw $maeHw vs $wantHw")
      assert(math.abs(maeSn - wantSn) < 1e-4, s"$tpe mae_snaive $maeSn vs $wantSn")
      assert(maeHw >= 0 && maeSn >= 0)
    }
  }
}
