package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Multi-touch attribution (ev_attribution): hand-computed credit on a
  * crafted journey, window-edge exclusion, and the credit-conservation
  * invariant on testdata. Oracle parity vs DuckDB is the driver gate.
  */
class AttributionSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-10 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("hand-traced journey: all four models credit as specified") {
    import spark.implicits._
    // user 1: click(t0), view(t1), click(t2), purchase(t3) — n=3 touches
    // user 2: view(t0), purchase(t1) — n=1
    // user 3: click 4 days before purchase — outside the window, n=0
    val rows = Seq(
      (1L, ts(0), 1L, "click", 0.0, "{}"),
      (2L, ts(10), 1L, "view", 0.0, "{}"),
      (3L, ts(20), 1L, "click", 0.0, "{}"),
      (4L, ts(30), 1L, "purchase", 9.0, "{}"),
      (5L, ts(0), 2L, "view", 0.0, "{}"),
      (6L, ts(5), 2L, "purchase", 5.0, "{}"),
      (7L, Timestamp.valueOf("2024-01-01 10:00:00"), 3L, "click", 0.0, "{}"),
      (8L, Timestamp.valueOf("2024-01-08 10:00:00"), 3L, "purchase", 2.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("attrfix").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qAttribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    // last touch: user1 → click(t2); user2 → view. first: user1 → click(t0).
    assert(got(("last_touch", "click")) == (1.0, 1L))
    assert(got(("last_touch", "view")) == (1.0, 1L))
    assert(got(("first_touch", "click")) == (1.0, 1L))
    assert(got(("first_touch", "view")) == (1.0, 1L))
    // linear: user1 gives 1/3 to each of click,view,click; user2 view=1
    assert(got(("linear", "click")) == (0.6667, 2L))
    assert(got(("linear", "view")) == (1.3333, 2L))
    // U-shaped n=3: first click 0.4, middle view 0.2, last click 0.4
    assert(got(("position_based", "click")) == (0.8, 2L))
    assert(got(("position_based", "view")) == (1.2, 2L))
  }

  test("credit conservation: every model's total equals the attributed conversions") {
    val sf = "/root/testdata/sf0.001"
    val byModel = EventQueries.qAttribution(spark, sf).collect()
      .groupBy(_.getString(0))
      .map { case (m, rs) => m -> rs.map(_.getDouble(2)).sum }
    // each attributed conversion hands out exactly 1.0 total credit, so
    // all four models must agree on the same grand total
    val totals = byModel.values.map(v => math.round(v * 1000.0) / 1000.0).toSet
    assert(totals.size == 1, s"models disagree on total credit: $byModel")
    assert(byModel.values.head > 0)
  }
}
