package graft.streaming

import graft.queries.VectorQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental embedding near-dup — the serving-time twin of
  * [[graft.queries.VectorQueries.qEmbIncremental]]: embedding batches
  * arrive as a stream, each micro-batch probes the corpus accumulated so
  * far for semantic near-duplicates
  * ([[VectorQueries.probeNewAgainstCorpus]]), the match report lands in
  * a report store, and the batch itself is appended to the corpus. The
  * nightly/continuous ingest loop a 100 TB corpus actually runs: each
  * arrival pays O(batch × cluster members), never old×old.
  *
  * Exactly-once across restarts WITHOUT a transactional sink: both
  * writes go to a `batch=<id>` subdirectory in overwrite mode, so a
  * replayed micro-batch (foreachBatch's at-least-once contract after a
  * crash) rewrites the same paths instead of duplicating rows —
  * idempotent by construction, the same discipline as the sketch
  * ledger's batch_id guard ([[SketchStream]]). Readers glob the parent
  * directory and see each batch exactly once.
  *
  * The first batch (no corpus yet) reports every vector as genuinely
  * new (cluster null, zero matches): an empty corpus has no seeds, so
  * the probe kernel returns an empty report and the stream fills in the
  * all-new rows — the decision the kernel deliberately leaves to its
  * caller.
  */
object EmbedStream {

  /** Start the probe-then-append loop. `input` is a streaming frame with
    * (vec_id long, embedding array&lt;float&gt;); reports land under
    * `reportDir/batch=&lt;id&gt;`, accepted vectors under
    * `corpusDir/batch=&lt;id&gt;`. */
  def start(s: SparkSession, input: DataFrame, corpusDir: String,
      reportDir: String, checkpointDir: String, c: Int = 16,
      t: Double = 0.35): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.select(col("vec_id"), col("embedding"))
          .localCheckpoint()
        // corpus = strictly EARLIER batches: a replayed batch must not see
        // its own previous (pre-crash) corpus write, or every vector
        // self-matches at cosine 1 and the rewritten report diverges from
        // the original — the id filter is what makes replay idempotent.
        // A present-but-empty corpus (e.g. an empty batch 0) is the same
        // as no corpus: no seeds exist, everything is genuinely new.
        val corpus = readCorpus(s, corpusDir, batchId).filterNot(_.isEmpty)
        val report =
          if (corpus.isEmpty)
            b.select(col("vec_id"),
              lit(null).cast("long").as("cluster_id"),
              lit(0L).as("n_matches"),
              lit(null).cast("long").as("best_old_id"),
              lit(null).cast("double").as("best_cos"))
          else
            VectorQueries.probeNewAgainstCorpus(b, corpus.get, c, t)
        report.write.mode("overwrite").parquet(s"$reportDir/batch=$batchId")
        b.write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
        ()
      }
      .start()

  /** The corpus accumulated by batches STRICTLY BEFORE `beforeBatch`, or
    * None before the first commit (also tolerates a half-written replay
    * victim: only `batch=*` subdirs that contain parquet are readable,
    * and overwrite-mode replay repairs them). */
  private def readCorpus(s: SparkSession, corpusDir: String,
      beforeBatch: Long): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val parts = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(st => st.getPath.getName.drop("batch=".length).toLongOption
        .exists(_ < beforeBatch))
      .filter(st => fs.listStatus(st.getPath)
        .exists(_.getPath.getName.endsWith(".parquet")))
      .map(_.getPath.toString)
    if (parts.isEmpty) None
    else Some(s.read.parquet(parts: _*).select(col("vec_id"), col("embedding")))
  }
}
