package graft

import graft.queries.EventQueries
import java.sql.Timestamp

/** Funnel step-latency percentiles (ev_funnel_latency): hand-computed
  * p50/p90/mean on a crafted journey set, ordering-insensitivity, and
  * the step-population invariant on testdata. Oracle parity vs DuckDB
  * is the driver gate.
  */
class FunnelLatencySpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-05 ${10 + min / 60}%02d:${min % 60}%02d:00")

  private def writeFixture(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funlat").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("hand-traced journeys: anchors, exclusions and percentiles") {
    // user 1: view@0, click@10 (600 s), purchase@40 (1800 s)
    // user 2: click@0 (BEFORE first view — must not anchor), view@5,
    //         click@20 → view→click = 900 s; no purchase
    // user 3: purchase@0 (before any click — excluded), view@10, no click
    // user 4: view@0 and click@0 same instant → 0 s; purchase@1 → 60 s
    val dir = writeFixture(Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(10), 1L, "click", 0.0, "{}"),
      (3L, ts(40), 1L, "purchase", 7.0, "{}"),
      (4L, ts(0), 2L, "click", 0.0, "{}"),
      (5L, ts(5), 2L, "view", 0.0, "{}"),
      (6L, ts(20), 2L, "click", 0.0, "{}"),
      (7L, ts(0), 3L, "purchase", 3.0, "{}"),
      (8L, ts(10), 3L, "view", 0.0, "{}"),
      (9L, ts(0), 4L, "view", 0.0, "{}"),
      (10L, ts(0), 4L, "click", 0.0, "{}"),
      (11L, ts(1), 4L, "purchase", 1.0, "{}")))
    val got = EventQueries.qFunnelLatency(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // step 1 latencies sorted: [0, 600, 900] → p50 = 600,
    // p90 = 600 + 0.8·300 = 840, mean = 500
    assert(got("1_view_to_click") == (3L, 600.0, 840.0, 500.0))
    // step 2 latencies sorted: [60, 1800] → p50 = 930,
    // p90 = 60 + 0.9·1740 = 1626, mean = 930
    assert(got("2_click_to_purchase") == (2L, 930.0, 1626.0, 930.0))
  }

  test("anchors are timestamp-derived: event file order cannot change them") {
    val rows = Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(10), 1L, "click", 0.0, "{}"),
      (3L, ts(40), 1L, "purchase", 7.0, "{}"),
      (4L, ts(3), 2L, "view", 0.0, "{}"),
      (5L, ts(9), 2L, "click", 0.0, "{}"))
    val a = EventQueries.qFunnelLatency(spark, writeFixture(rows)).collect().toSeq
    val b = EventQueries.qFunnelLatency(spark, writeFixture(rows.reverse)).collect().toSeq
    assert(a == b)
  }

  test("testdata invariant: step-2 population never exceeds step-1's") {
    val got = EventQueries.qFunnelLatency(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("2_click_to_purchase", 0L) <=
      got.getOrElse("1_view_to_click", Long.MaxValue))
    got.values.foreach(n => assert(n > 0))
  }
}
