package graft.streaming

import graft.functions.SketchFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming frequency-sketch maintenance — the incremental twin of
  * [[graft.queries.EventQueries.qCmsTopUsers]]'s build→merge pipeline.
  *
  * Each micro-batch collapses to ONE count-min sketch row (a narrow
  * map-side-combinable aggregate inside the batch), appended to a
  * parquet "sketch ledger" keyed by batch id. Because CMS counter
  * matrices ADD, the ledger is a commutative, idempotent-to-reorder
  * state: the current sketch is `CmsMergeAgg` over the ledger rows, so
  * query cost is O(batches), re-aggregation never touches raw events,
  * and a failed batch simply re-appends under its batch id (parquet
  * append of the same id twice would double-count — foreachBatch runs
  * exactly-once per id within one checkpointed query, which is the
  * delivery contract this sink relies on; cross-restart replays are
  * guarded by the id column so readers can dedup defensively).
  *
  * This is the sketch-state architecture that scales: per-window
  * per-key counters (mapGroupsWithState) grow with key cardinality,
  * while the ledger grows with TIME only — one blob per batch per
  * group — and supports merge-on-read at any aggregation level.
  */
object SketchStream {

  import graft.queries.EventQueries.{CmsConf, CmsEps, CmsSeed}

  /** Start a streaming query that appends one (batch_id, event_type,
    * sketch) row per micro-batch per event type to `ledgerPath`. */
  def start(events: DataFrame, ledgerPath: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeDelta(batch, ledgerPath, id)
      }
      .start()

  /** One micro-batch's ledger row(s) — exposed (like SpanStream /
    * MinhashStream.writeDelta) so specs and the differential fuzzer
    * drive the exact kernel the stream runs. */
  def writeDelta(batch: DataFrame, ledgerPath: String, id: Long): Unit = {
    if (!batch.isEmpty) {
      batch
        .groupBy(col("event_type"))
        .agg(expr(
          s"count_min_sketch(user_id, ${CmsEps}d, ${CmsConf}d, $CmsSeed)").as("sk"))
        .withColumn("batch_id", lit(id))
        .write.mode("append").parquet(ledgerPath)
    }
    ()
  }

  /** Merge the ledger down to one sketch per event type (dedup by
    * batch_id first — replay defense), then estimate the given probe
    * users. Cost ∝ ledger rows, never raw events. */
  def estimates(s: SparkSession, ledgerPath: String, probes: DataFrame): DataFrame = {
    val ledger = s.read.parquet(ledgerPath)
      .groupBy(col("batch_id"), col("event_type"))
      .agg(first(col("sk")).as("sk")) // idempotent under duplicated appends
    val merged = ledger.groupBy(col("event_type"))
      .agg(SketchFunctions.cmsMerge(col("sk")).as("sk"))
    merged.crossJoin(broadcast(probes))
      .select(col("event_type"), col("user_id"),
        SketchFunctions.cmsEstimate(col("sk"), col("user_id")).as("est_n"))
  }
}
