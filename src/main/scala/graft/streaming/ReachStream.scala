package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the sliding-reach sketch cube — the
  * incremental twin of [[graft.queries.EventQueries.qSlidingReach]]'s
  * hourly build, in the [[SketchStream]] ledger architecture: each
  * micro-batch collapses to one HLL sketch row PER EVENT HOUR it
  * touches, appended to a parquet ledger keyed by (batch_id, h).
  *
  * HLL registers merge by element-wise max, so the ledger state is
  * commutative AND idempotent — unioning a replayed batch's identical
  * sketch a second time changes no register (stronger than the CMS
  * ledger, whose counters add and need the batch-id dedup). The served
  * cube is `hll_union_agg` per hour over the ledger — O(ledger rows),
  * never raw events — and the trailing-window report rides the SAME
  * [[graft.queries.EventQueries.slidingReachEst]] kernel as the batch
  * query, so stream ≡ batch is structural. At 100 TB the ledger grows
  * with time × active hours, not user cardinality: the dashboard's
  * every window merges ≤ 24 sketch rows regardless of corpus size. */
object ReachStream {

  /** Start appending one (batch_id, h, sk) row per event-hour per
    * micro-batch to `ledgerPath`. Input needs (ts, user_id). */
  def start(events: DataFrame, ledgerPath: String,
      checkpoint: String): StreamingQuery =
    events.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          batch
            .groupBy(date_trunc("hour", col("ts")).as("h"))
            .agg(hll_sketch_agg(col("user_id")).as("sk"))
            .withColumn("batch_id", lit(id))
            .write.mode("append").parquet(ledgerPath)
        }
        ()
      }
      .start()

  /** The merged hourly cube: one sketch per hour over however many
    * batches contributed to it. */
  def hourly(s: SparkSession, ledgerPath: String): DataFrame =
    s.read.parquet(ledgerPath)
      .groupBy(col("h"))
      .agg(hll_union_agg(col("sk")).as("sk"))

  /** Trailing-[[graft.queries.EventQueries.qSlidingReach]]-window
    * estimates off the ledger: (t, est_users, n_hours_merged). */
  def estimates(s: SparkSession, ledgerPath: String): DataFrame =
    graft.queries.EventQueries.slidingReachEst(hourly(s, ledgerPath))
}
