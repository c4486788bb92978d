package graft

import graft.streaming.ReachStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming reach-sketch ledger (ReachStream): stream ≡ batch through
  * the shared sliding-window kernel, cross-batch hour merging, and the
  * HLL idempotence that makes replayed appends harmless.
  */
class ReachStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("ledger estimates equal the batch sliding-reach kernel on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    // hours 05 and 06; user 1 spans batches within hour 05 (the ledger
    // must UNION the two partial hour sketches, not double-count)
    val b1 = Seq((ts(5, 0), 1L), (ts(5, 10), 2L))
    val b2 = Seq((ts(5, 40), 1L), (ts(6, 5), 3L))
    val ledger = tmp("reachledger")
    val input = MemoryStream[(Timestamp, Long)]
    val q = ReachStream.start(
      input.toDF().toDF("ts", "user_id"), ledger, tmp("reachckpt"))
    try {
      Seq(b1, b2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val got = ReachStream.estimates(spark, ledger).collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    // batch twin: one-shot hourly sketches over ALL rows, same kernel
    val all = (b1 ++ b2).toDF("ts", "user_id")
    val batch = graft.queries.EventQueries.slidingReachEst(
        all.groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(hll_sketch_agg(col("user_id")).as("sk")))
      .collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == batch, s"stream $got vs batch $batch")
    // sparse-mode HLL is exact at this cardinality: hour 05 window has
    // users {1,2}; hour 06 window unions both hours -> {1,2,3}
    val byHour = got.map { case (k, v) => k.toString.substring(11, 13) -> v }
    assert(byHour("05") == (2L, 1L), s"hour 05: ${byHour("05")}")
    assert(byHour("06") == (3L, 2L), s"hour 06: ${byHour("06")}")
  }

  test("replayed batch appends are idempotent: registers max, never add") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((ts(8, 0), 1L), (ts(8, 30), 2L))
    val ledger = tmp("reachreplay")
    val input = MemoryStream[(Timestamp, Long)]
    val q = ReachStream.start(
      input.toDF().toDF("ts", "user_id"), ledger, tmp("reachckpt2"))
    try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    val before = ReachStream.estimates(spark, ledger).collect().toSeq
    // simulate an at-least-once redelivery: append the identical batch
    // sketch row again, as a crashed-and-replayed foreachBatch would
    rows.toDF("ts", "user_id")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .withColumn("batch_id", lit(0L))
      .write.mode("append").parquet(ledger)
    val after = ReachStream.estimates(spark, ledger).collect().toSeq
    assert(after == before, "HLL union of an identical sketch must be a no-op")
  }
}
