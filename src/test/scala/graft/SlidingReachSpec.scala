package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Sliding sketch-merge reach (ev_sliding_reach): window membership on a
  * crafted timeline and exactness at fixture cardinality (HLL is exact in
  * sparse mode, so any fixture miss is a window-logic bug, not noise).
  */
class SlidingReachSpec extends SparkSpec {

  test("a user seen at hour h reaches windows h..h+23 and no others") {
    import spark.implicits._
    // user 1 at 00:00 Jan 1; user 2 at 00:00 Jan 3 (>24h later)
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:30:00"), 1L, "view", 0.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-03 00:30:00"), 2L, "view", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("srfix").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qSlidingReach(spark, dir).collect()
    // target hours = hours WITH events: exactly the two event hours,
    // each window contains only its own hour's sketch (the other event
    // hour is > 23h away)
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getLong(1) == 1L, s"n_hours_merged: $r")
      assert(r.getBoolean(3), s"sparse-mode HLL must be exact: $r")
    }
  }

  test("adjacent hours merge into each other's windows") {
    import spark.implicits._
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 05:00:00"), 1L, "view", 0.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 06:00:00"), 2L, "view", 0.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 06:10:00"), 1L, "view", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("srfix2").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qSlidingReach(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("2024-01-01 05:00:00") == 1L) // only hour 5's sketch
    assert(got("2024-01-01 06:00:00") == 2L) // hours 5 and 6 merge
  }
}
