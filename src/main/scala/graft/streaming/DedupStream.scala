package graft.streaming

import graft.functions.TextFunctions.fingerprint
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental twin of
  * [[graft.queries.DedupQueries.qDedupExact]]: documents arrive as a
  * stream and only the FIRST copy of each fingerprint passes through.
  * A training-data pipeline runs this shape at the ingest edge, so a
  * re-crawled or re-delivered document never re-enters the corpus.
  *
  * Built on `dropDuplicatesWithinWatermark` over the md5 fingerprint:
  * the dedup state store keeps one (fingerprint) key per distinct
  * document seen inside the lateness horizon and EVICTS keys once the
  * watermark passes them — the knob that bounds state at 100 TB
  * (unbounded-horizon dedup belongs to the batch operator over the
  * accumulated store; the stream guards the recent window). Plain
  * `dropDuplicates(fp)` would NOT do this: without the event-time
  * column in the key subset its state is never evicted, which is
  * exactly the unbounded growth this operator exists to avoid. State is
  * partitioned by the fingerprint hash, so it shards with the shuffle
  * exactly like the batch hash-agg.
  *
  * Stream ≡ batch invariant (asserted in DedupStreamSpec): for docs
  * whose event times fall inside one watermark horizon, the retained
  * set equals the batch `dropDuplicates` on the same input — arrival
  * order decides WHICH physical copy survives (the stream's
  * first-arrival rule), while the batch twin's min-id rule is an
  * ordering choice over the same duplicate groups, so the invariant is
  * on fingerprint sets and group counts, not row identity.
  */
object DedupStream {

  /** Deduplicate a streaming doc frame (columns: `ts` event-time, `text`,
    * plus any payload). Keeps the first arrival per fingerprint within
    * the watermark horizon. */
  def dedup(docs: DataFrame, lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", fingerprint(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Running dedup statistics over the deduped stream: per-window counts
    * of retained documents (append-mode friendly — one row per closed
    * window). */
  def retainedCounts(deduped: DataFrame, window_ : String = "1 minute"): DataFrame =
    deduped
      .groupBy(window(col("ts"), window_))
      .agg(count(lit(1)).as("n_retained"))
}
