package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._

/** SCD2 change-history intervals (ev_scd2): hand-traced run collapse on a
  * fixture stream plus the structural interval invariants on real data
  * (value parity vs DuckDB is the driver gate).
  */
class Scd2Spec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def writeEvents(rows: Seq[(Long, String, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd2fix").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("run collapse: versions, stitched validity, current flag on a fixture") {
    val dir = writeEvents(Seq(
      // user 1: A,A,B,A — three runs; the repeat A at the end is a NEW
      // version (SCD2 history, not a distinct-values table)
      (1L, "2024-01-01 10:00:00", 1L, "A"),
      (2L, "2024-01-01 10:05:00", 1L, "A"),
      (3L, "2024-01-01 10:10:00", 1L, "B"),
      (4L, "2024-01-01 10:20:00", 1L, "A"),
      // user 2: single event → one current row
      (5L, "2024-01-01 09:00:00", 2L, "C")))
    val got = EventQueries.qScd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5), r.getBoolean(6)))
    assert(got.toSeq == Seq(
      (1L, 1L, "A", "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2L, false),
      (1L, 2L, "B", "2024-01-01 10:10:00", "2024-01-01 10:20:00", 1L, false),
      (1L, 3L, "A", "2024-01-01 10:20:00", "current", 1L, true),
      (2L, 1L, "C", "2024-01-01 09:00:00", "current", 1L, true)),
      s"unexpected history: ${got.toSeq}")
  }

  test("interval invariants on real data: contiguous, versioned, one current per user") {
    val rows = EventQueries.qScd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4),
        r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val hist = rs.sortBy(_._2)
      assert(hist.map(_._2).toSeq == (1L to hist.length).toSeq,
        s"user $u versions must be 1..n")
      // valid_to of each closed row == valid_from of the next version
      hist.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3,
          s"user $u: interval gap ${a._4} -> ${b._3}")
        case _ =>
      }
      assert(hist.count(_._6) == 1 && hist.last._6,
        s"user $u: exactly the last version is current")
      assert(hist.last._4 == "current")
    }
    // lossless: run lengths add back up to each user's event count
    val counts = graft.queries.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byUser.foreach { case (u, rs) =>
      assert(rs.map(_._5).sum == counts(u), s"user $u: run lengths lossless")
    }
  }
}
