package graft

import graft.streaming.DriftStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming drift monitor ([[DriftStream]]): stream ≡ batch against the
  * td_drift report (shared kernel, same numbers), replay idempotence,
  * and the alerting property (a corrupted batch reads higher KL). */
class DriftStreamSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("first batch's marks equal the batch drift report; replay rewrites same rows") {
    val docs = graft.queries.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    val dir = java.nio.file.Files.createTempDirectory("driftstream").toString
    // reference = the even half — exactly td_drift's side A
    DriftStream.writeReference(docs.filter(col("doc_id") % 2 === 0), dir)

    val odd = docs.filter(col("doc_id") % 2 === 1)
      .as[(Long, String, String)].collect().toSeq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = DriftStream.start(spark,
      input.toDF().toDF("doc_id", "text", "source"), dir,
      java.nio.file.Files.createTempDirectory("driftckpt").toString)
    try {
      input.addData(odd)
      q.processAllAvailable()
    } finally q.stop()

    def markRows() = DriftStream.marks(spark, dir)
      .filter(col("batch_id") === 0)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    val got = markRows()
    // the batch report over the same halves — same kernel, same numbers
    val want = graft.queries.TextQueries.qDrift(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
      .toMap
    assert(got == want, s"stream $got != batch $want")

    // redelivery (at-least-once foreachBatch): same bytes, no growth
    DriftStream.processBatch(
      odd.toDF("doc_id", "text", "source"), dir, 0L)
    assert(markRows() == got, "replay must rewrite identical marks")

    // the alert: a corrupted batch (vocabulary replaced wholesale) reads
    // MUCH higher divergence than the in-distribution batch, per source
    val junk = odd.map { case (id, text, src) =>
      (id, text.split("\\s+").zipWithIndex
        .map { case (_, i) => s"zzq$i" }.mkString(" "), src)
    }
    DriftStream.processBatch(junk.toDF("doc_id", "text", "source"), dir, 1L)
    val alert = DriftStream.marks(spark, dir)
      .filter(col("batch_id") === 1)
      .collect().map(r => r.getString(1) -> r.getDouble(6)).toMap
    // only sources the batch actually carries can alert — a source with
    // zero batch tokens reads reference-vs-empty either way
    val present = got.filter(_._2._2 > 0).keySet
    assert(present.nonEmpty)
    present.foreach { src =>
      assert(alert(src) > 2 * got(src)._5,
        s"$src: corrupted-batch KL ${alert(src)} must dwarf ${got(src)._5}")
    }
  }
}
