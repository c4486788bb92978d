package graft.streaming

import graft.queries.DedupQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming duplicated-span postings maintenance — the index-maintenance
  * tail of the substring dedup family (`dd_substring` /
  * `dd_substring_rewrite`): documents arrive as a stream and each
  * micro-batch appends its token-8-gram postings delta instead of
  * re-tokenizing the corpus. The coverage report serves MERGE-ON-READ:
  * a gram is duplicated iff its global count over the union of deltas
  * is ≥ 2, so spans that straddle batches (batch 3 repeats a gram batch
  * 1 introduced) are found exactly — per-batch work is O(batch tokens)
  * and old batches are never re-read at write time.
  *
  * Correctness of merge-on-read under the append-only ingest contract
  * (each doc_id arrives in exactly one micro-batch, the
  * [[IndexStream]]/[[EmbedStream]] contract): postings rows are keyed by
  * (doc_id, pos) and doc_ids never repeat across batches, so the union
  * of deltas IS the corpus postings relation and the report is
  * byte-identical to the batch query — enforced structurally by sharing
  * [[DedupQueries.substringCoverage]], the one kernel.
  *
  * Exactly-once across restarts without a transactional sink: each delta
  * lands under `<component>/batch=<id>` in overwrite mode, so a replayed
  * micro-batch rewrites the same paths byte-for-byte instead of
  * double-counting (the established replay discipline). Accumulated
  * batch directories fold with [[Compaction.foldBatchDirs]] like the
  * other streaming stores.
  */
object SpanStream {

  /** Start maintaining the postings at `dir` from a streaming
    * (doc_id long, text string) frame. */
  def start(s: SparkSession, input: DataFrame, dir: String,
      checkpointDir: String): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeDelta(batch, dir, batchId)
      }
      .start()

  /** One micro-batch's delta writes — exposed so specs (and the
    * batch-runnable gate twin `dd_substring_deltas`) can reproduce a
    * redelivered batch byte-for-byte. One tokenization pass feeds both
    * components. */
  def writeDelta(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val toks = batch
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .localCheckpoint()
    DedupQueries.substringNgrams(toks)
      .write.mode("overwrite").parquet(s"$dir/ng/batch=$batchId")
    toks.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .write.mode("overwrite").parquet(s"$dir/doclen/batch=$batchId")
    ()
  }

  /** Read a delta component, or an empty frame with `schema` before the
    * first micro-batch commits (empty-index base case). */
  private def component(s: SparkSession, dir: String,
      schema: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.parquet(dir)
    else s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** Merge-on-read views (the `batch=<id>` discovery column dropped —
    * delivery bookkeeping, not index schema). */
  def ngrams(s: SparkSession, dir: String): DataFrame =
    component(s, s"$dir/ng", "doc_id BIGINT, pos INT, g STRING")
      .select(col("doc_id"), col("pos"), col("g"))
  def doclens(s: SparkSession, dir: String): DataFrame =
    component(s, s"$dir/doclen", "doc_id BIGINT, n_tokens BIGINT")
      .select(col("doc_id"), col("n_tokens"))

  /** Duplicated-span coverage served off the streamed postings —
    * identical output to `dd_substring` over the same documents. */
  def coverage(s: SparkSession, dir: String): DataFrame =
    DedupQueries.substringCoverage(ngrams(s, dir), doclens(s, dir))
}
