package graft

import java.sql.Timestamp

import graft.streaming.DedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact dedup: first-arrival retention, cross-batch state,
  * stream ≡ batch invariant on fingerprint sets. */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("cross-batch duplicates dropped; first arrival survives") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val dir = java.nio.file.Files.createTempDirectory("dedup-stream").toString
    val q = DedupStream.dedup(docs)
      .select("doc_id", "text")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      // batch 1: two distinct texts plus an in-batch duplicate
      input.addData(
        (1L, ts(0), "alpha beta gamma"),
        (2L, ts(1), "delta epsilon"),
        (3L, ts(1), "alpha  BETA gamma")) // normalized dup of doc 1
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate (state must remember batch 1)
      // and one new text
      input.addData(
        (4L, ts(2), "delta epsilon"),
        (5L, ts(3), "zeta eta"))
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.table("dedup_out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 5L),
      s"first arrivals only (3 normalizes onto 1, 4 duplicates 2): $kept")
  }

  test("state evicts past the watermark: a long-later duplicate re-admits") {
    // the bounded-horizon contract: dedup guards the lateness window,
    // and once the watermark passes a fingerprint's state the same text
    // may legitimately re-enter (unbounded-horizon dedup is the batch
    // operator's job over the accumulated store)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val dir = java.nio.file.Files.createTempDirectory("dedup-stream-ev").toString
    val q = DedupStream.dedup(docs, lateness = "5 minutes")
      .select("doc_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("dedup_evict")
      .start()
    try {
      input.addData((1L, ts(0), "the one text"))
      q.processAllAvailable()
      // push the watermark an hour past doc 1's state
      input.addData((2L, Timestamp.valueOf("2026-01-01 11:00:00"), "other"))
      q.processAllAvailable()
      // same fingerprint, new event time, state long evicted → re-admitted
      input.addData((3L, Timestamp.valueOf("2026-01-01 11:01:00"), "the one text"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("dedup_evict").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L),
      s"doc 3 must re-admit after state eviction: $kept")
  }

  test("checkpoint restart: dedup state survives a stop/start cycle") {
    // the ops contract a production stream lives by — a redeploy (stop,
    // new query object, SAME checkpoint) must resume the state store,
    // not restart dedup from scratch. File sink (fault-tolerant +
    // exactly-once via its manifest) instead of the non-recoverable
    // memory sink.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val dir = java.nio.file.Files.createTempDirectory("dedup-restart").toString
    def startQuery() = DedupStream.dedup(docs, lateness = "2 hours")
      .select("doc_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("parquet").option("path", s"$dir/out")
      .start()
    val q1 = startQuery()
    try {
      input.addData((1L, ts(0), "alpha beta"), (2L, ts(1), "gamma delta"))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = startQuery() // same checkpoint → state store resumes
    try {
      input.addData(
        (3L, ts(2), "alpha  BETA"),   // normalized dup of doc 1, PRE-restart
        (4L, ts(3), "epsilon zeta")) // genuinely new
      q2.processAllAvailable()
    } finally q2.stop()
    val kept = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L),
      s"doc 3 must be dropped by state restored from the checkpoint: $kept")
  }

  test("stream equals batch dropDuplicates on fingerprint sets") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 60L).map { i =>
      // 20 distinct texts, each delivered 3 times at different minutes
      (i, ts((i % 50).toInt), s"text body number ${i % 20}")
    }
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val dir = java.nio.file.Files.createTempDirectory("dedup-stream-eq").toString
    val q = DedupStream.dedup(docs, lateness = "2 hours")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("dedup_eq")
      .start()
    try {
      // deliver in two chunks so dedup state spans micro-batches
      input.addData(rows.take(25): _*)
      q.processAllAvailable()
      input.addData(rows.drop(25): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamFps = spark.table("dedup_eq").select("fp").as[String].collect().sorted
    val batchFps = rows.toDF("doc_id", "ts", "text")
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .dropDuplicates("fp")
      .select("fp").as[String].collect().sorted
    assert(streamFps.toSeq == batchFps.toSeq)
    assert(streamFps.length == 20)
  }
}
