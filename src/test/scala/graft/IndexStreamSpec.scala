package graft

import graft.queries.SearchQueries
import graft.streaming.IndexStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming BM25 index maintenance ([[IndexStream]]): documents stream
  * in across micro-batches, the index accumulates as per-batch deltas,
  * and serving off the merged deltas (and off the compacted bucketed
  * tables) equals the one-shot batch BM25 over the same corpus. Replayed
  * batches rewrite their own delta paths, so double delivery cannot
  * double-count document frequencies.
  */
class IndexStreamSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getDouble(3), r.getLong(4))).toSeq

  test("stream-maintained index serves the same BM25 top-k as batch") {
    val docs = graft.queries.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    assert(docs.nonEmpty)
    val batches = docs.grouped(math.max(1, docs.length / 3 + 1)).toSeq
    val indexDir = tmp("bm25stream")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = IndexStream.start(spark,
      input.toDF().toDF("doc_id", "text"), indexDir, tmp("bm25ckpt"))
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val streamed = rows(IndexStream.search(spark, indexDir))
    val batch = rows(SearchQueries.qBm25(spark, sfDir))
    assert(streamed == batch, s"stream/batch divergence:\n$streamed\nvs\n$batch")

    // merged document frequencies are the global ones, not per-batch
    val dfMerged = IndexStream.dfreq(spark, indexDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfBatch = SearchQueries.tokenizeDocs(
        graft.queries.Tables.documents(spark, sfDir).selectExpr("doc_id", "text"))
      .selectExpr("doc_id", "explode(array_distinct(w)) term")
      .groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfMerged == dfBatch)

    // a REDELIVERED batch (at-least-once foreachBatch after a crash)
    // overwrites its own delta paths: nothing double-counts
    IndexStream.writeDelta(batches.head.toDF("doc_id", "text"), indexDir, 0L)
    assert(rows(IndexStream.search(spark, indexDir)) == batch)
    assert(IndexStream.dfreq(spark, indexDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == dfBatch)

    // compaction folds deltas into bucketed serving tables; results
    // identical, scan pruned by the In(term, ...) probe
    val idx = IndexStream.compact(spark, indexDir)
    assert(rows(IndexStream.searchCompacted(spark, idx)) == batch)
    val plan = IndexStream.searchCompacted(spark, idx)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"),
      s"compacted probe should be bucket-pruned:\n$plan")

    // the compacted layout carries the impacts metadata (max_sat under
    // the MERGED avgdl), so MaxScore pruned serving works off a
    // stream-folded index exactly as off the built one — and stays
    // lossless vs exact scoring
    val pruned = rows(SearchQueries.maxscoreIndex(spark, idx)._2)
    assert(pruned == batch,
      s"maxscore off the compacted index must equal exact:\n$pruned\nvs\n$batch")

    // the POSITIONAL component rides the same deltas: phrase search off
    // the streamed index equals the batch phrase query, survives the
    // same redelivery, and its compaction serves bucket-pruned
    val phraseBatch = SearchQueries.qPhrase(spark, sfDir).collect().toSeq
    assert(IndexStream.searchPhrase(spark, indexDir).collect().toSeq
      == phraseBatch, "streamed positional index must equal batch phrase")
    val posTable = IndexStream.compactPositions(spark, indexDir)
    val compacted = spark.table(posTable)
    // tf ≡ |positions| by construction — the components cannot drift
    val drift = compacted.selectExpr("term", "doc_id", "size(positions) np")
      .join(spark.table(idx.postingsTable), Seq("term", "doc_id"))
      .filter(org.apache.spark.sql.functions.col("np") =!=
        org.apache.spark.sql.functions.col("tf"))
    assert(drift.count() == 0, "positional and frequency postings agree")
  }
}
