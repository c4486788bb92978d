package graft

import java.sql.Timestamp

import graft.streaming.SketchStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CMS ledger: the merged estimate over per-batch sketches must
  * equal a single direct-build sketch over all data (counter matrices
  * add), and ledger re-aggregation must be idempotent under replayed
  * appends.
  */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("ledger merge equals direct build; replayed batch ids dedup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val events = input.toDF().toDF("user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("cms-ledger").toString
    val q = SketchStream.start(events, s"$dir/ledger", s"$dir/ckpt")
    try {
      input.addData((1L, "view", ts(0)), (1L, "view", ts(1)), (2L, "view", ts(1)),
        (3L, "click", ts(2)))
      q.processAllAvailable()
      input.addData((1L, "view", ts(3)), (2L, "click", ts(4)), (2L, "click", ts(5)))
      q.processAllAvailable()
      input.addData((1L, "click", ts(6)), (4L, "view", ts(7)))
      q.processAllAvailable()
    } finally q.stop()

    val ledger = spark.read.parquet(s"$dir/ledger")
    assert(ledger.select(col("batch_id")).distinct().count() == 3,
      "one ledger generation per micro-batch")

    val probes = Seq(1L, 2L, 3L, 4L).toDF("user_id")
    val got = SketchStream.estimates(spark, s"$dir/ledger", probes)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    // direct single-build over the union of all batches
    import graft.queries.EventQueries.{CmsConf, CmsEps, CmsSeed}
    val all = Seq(
      (1L, "view"), (1L, "view"), (2L, "view"), (3L, "click"),
      (1L, "view"), (2L, "click"), (2L, "click"),
      (1L, "click"), (4L, "view")).toDF("user_id", "event_type")
    val direct = all.groupBy(col("event_type"))
      .agg(expr(s"count_min_sketch(user_id, ${CmsEps}d, ${CmsConf}d, $CmsSeed)").as("sk"))
      .crossJoin(broadcast(probes))
      .select(col("event_type"), col("user_id"),
        graft.functions.SketchFunctions.cmsEstimate(col("sk"), col("user_id")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == direct, s"merged-ledger estimates $got != direct $direct")
    // ground truth at this tiny scale: CMS with eps=0.001 is exact here
    assert(got(("view", 1L)) == 3 && got(("click", 2L)) == 2 &&
      got(("click", 1L)) == 1 && got(("view", 4L)) == 1)

    // replay defense: duplicate an existing ledger row under the SAME
    // batch_id (a restart re-append); estimates must not change
    val one = spark.read.parquet(s"$dir/ledger").filter(col("batch_id") === 0)
    one.write.mode("append").parquet(s"$dir/ledger")
    val replayed = SketchStream.estimates(spark, s"$dir/ledger", probes)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(replayed == got, "duplicated batch id must not double-count")
  }
}
