package graft.streaming

import graft.queries.TextQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming distribution-drift monitor — the incremental twin of the
  * batch report ([[TextQueries.qDrift]]): a REFERENCE unigram
  * distribution is fixed once (yesterday's accepted snapshot), and every
  * arriving document micro-batch emits its per-source two-way smoothed
  * KL against it through the SAME kernel ([[TextQueries.smoothedKl]]),
  * so stream ≡ batch is structural. A source whose batches trend away
  * from the reference (vocabulary churn, spam injection, encoding
  * breakage) shows a rising `kl_batch_vs_ref` while the pipeline is
  * still ingesting — before any nightly batch report runs.
  *
  * Cost shape: the reference counts load once per monitor
  * (vocabulary-sized, cached); each micro-batch pays one
  * map-side-combinable (source, term) count over ITS OWN tokens plus a
  * vocabulary-sized join — O(batch + vocab), independent of corpus
  * size. Marks land under `dir/drift/batch=<id>` in overwrite mode, so
  * a replayed batch rewrites the same rows (the [[EmbedStream]]
  * discipline).
  */
object DriftStream {

  /** Fix the reference distribution: (source, term, c) counts of the
    * accepted snapshot. Run once per monitoring epoch — and INVALIDATE
    * any cached previous epoch's reference for this dir, or a monitor
    * in the same JVM would keep scoring drift against the stale
    * baseline (the overwrite below changes the files, not the cached,
    * persisted DataFrame). */
  def writeReference(docs: DataFrame, dir: String): Unit = {
    refCache.remove(dir).foreach(_.unpersist(true))
    TextQueries.driftCounts(docs)
      .write.mode("overwrite").parquet(s"$dir/reference")
  }

  private val refCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def reference(s: SparkSession, dir: String): DataFrame =
    refCache.getOrElseUpdate(dir,
      s.read.parquet(s"$dir/reference").persist())

  /** Start monitoring a streaming (doc_id, text, source) frame. */
  def start(s: SparkSession, input: DataFrame, dir: String,
      checkpointDir: String): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, dir, batchId)
      }
      .start()

  /** One micro-batch's drift marks — exposed so specs can replay a
    * delivered batch byte-for-byte. Emits one row per source seen in
    * EITHER relation: (batch_id, source, n_tokens_ref, n_tokens_batch,
    * vocab, kl_ref_vs_batch, kl_batch_vs_ref). */
  def processBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    val marks = TextQueries.smoothedKl(
        reference(s, dir), TextQueries.driftCounts(batch))
      .select(lit(batchId).as("batch_id"), col("source"),
        col("n_tokens_a").as("n_tokens_ref"),
        col("n_tokens_b").as("n_tokens_batch"),
        col("vocab"),
        col("kl_ab").as("kl_ref_vs_batch"),
        col("kl_ba").as("kl_batch_vs_ref"))
    marks.write.mode("overwrite").parquet(s"$dir/drift/batch=$batchId")
  }

  /** All emitted drift marks — the monitoring dashboard's input. */
  def marks(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/drift")
      .select(col("batch_id"), col("source"), col("n_tokens_ref"),
        col("n_tokens_batch"), col("vocab"),
        col("kl_ref_vs_batch"), col("kl_batch_vs_ref"))
}
