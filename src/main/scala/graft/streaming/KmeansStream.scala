package graft.streaming

import graft.queries.VectorQueries
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming mini-batch k-means (Sculley 2010, "Web-scale k-means
  * clustering", WWW — public paper): centroids DRIFT with arriving data
  * instead of staying frozen at their seed positions, which is the
  * index-quality maintenance loop a long-lived vector store needs — the
  * stored-IVF streams ([[EmbedStream]], [[graft.retrieval.IvfIndex]]
  * `refresh`) grow their lists under fixed centroids; this stream is how
  * those centroids get re-fit without a full Lloyd pass over the corpus.
  *
  * Per micro-batch (the aggregated mini-batch update):
  *   1. assign the batch to the current centroids (the shared
  *      [[VectorQueries.assignToSeeds]] kernel — rounded-cosine argmax,
  *      centroid-id tiebreak);
  *   2. per-centroid batch sums via one batch-sized posexplode
  *      aggregation — double sums of float coordinates are EXACT at
  *      these cardinalities (the vs_kmeans bit-parity argument), so the
  *      result is shuffle-order-free;
  *   3. the learning-rate update per touched centroid j:
  *      v_j += n_j;  η = n_j / v_j;  c_j ← (1−η)·c_j + η·mean_j —
  *      c·dim driver-side arithmetic on a table bounded by the codebook
  *      contract.
  *
  * State is the (centroid_id, vec, n) table, persisted per batch under
  * `dir/centroids/batch=<id>` in overwrite mode with a STRICTLY-BEFORE
  * read (a replayed batch recomputes from its predecessor's state, never
  * from its own pre-crash write — the [[EmbedStream]] replay discipline),
  * so redelivery rewrites the same bytes. The first batch seeds the
  * centroids deterministically ([[VectorQueries.seededCentroids]]) with
  * v = 0, so its update moves each seed to its batch-cluster mean.
  */
object KmeansStream {

  def start(s: SparkSession, input: DataFrame, dir: String,
      checkpointDir: String, c: Int = 16): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, dir, batchId, c)
      }
      .start()

  /** One micro-batch's centroid update — exposed so specs can replay a
    * delivered batch byte-for-byte. `batch` carries (vec_id, embedding:
    * array<float>). */
  def processBatch(batch: DataFrame, dir: String, batchId: Long,
      c: Int): Unit = {
    val s = batch.sparkSession
    val b = batch.select(col("vec_id"), col("embedding")).localCheckpoint()
    if (b.isEmpty) return
    val prev = latestState(s, dir, beforeBatch = batchId)
    val state: Array[(Long, Array[Double], Long)] = prev.getOrElse {
      VectorQueries.seededCentroids(b, c).collect().map { r =>
        (r.getLong(0), r.getSeq[Float](1).iterator.map(_.toDouble).toArray, 0L)
      }
    }
    import s.implicits._
    val seeds = state.toSeq.map { case (cid, cv, _) => (cid, cv) }
      .toDF("cid", "cv")
    // the state is double (drifted means); float→double upcast of the
    // batch is exact, and the codegen cosine wants matching element types
    val assigned = VectorQueries.assignToSeeds(
      b.withColumn("embedding", col("embedding").cast("array<double>")),
      seeds, state.length)
    // batch-sized explode only — the corpus never replays through here
    val sums = assigned
      .select(col("cluster_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cluster_id"), col("pos"))
      .agg(sum(col("x").cast("double")).as("sx"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        cid -> rows.map(r => (r.getInt(1), r.getDouble(2))).sortBy(_._1).map(_._2)
      }
    val counts = assigned.groupBy(col("cluster_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val updated = state.map { case (cid, cv, v) =>
      counts.get(cid) match {
        case Some(n) if n > 0 =>
          val vNew = v + n
          val eta = n.toDouble / vNew
          val sx = sums(cid)
          val moved = Array.tabulate(cv.length) { p =>
            (1.0 - eta) * cv(p) + eta * (sx(p) / n)
          }
          (cid, moved, vNew)
        case _ => (cid, cv, v) // untouched centroid: no drift, no count
      }
    }
    updated.toSeq.toDF("centroid_id", "vec", "n")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids/batch=$batchId")
  }

  /** The latest persisted state strictly before `beforeBatch` (pass
    * Long.MaxValue for "the live table"). */
  private[streaming] def latestState(s: SparkSession, dir: String,
      beforeBatch: Long): Option[Array[(Long, Array[Double], Long)]] = {
    val base = new org.apache.hadoop.fs.Path(s"$dir/centroids")
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return None
    val ids = fs.listStatus(base).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") => n.drop(6).toLong }
      .filter(_ < beforeBatch).toSeq
    if (ids.isEmpty) None
    else Some(
      s.read.parquet(s"$dir/centroids/batch=${ids.max}")
        .select(col("centroid_id"), col("vec"), col("n")).collect()
        .map { r: Row =>
          (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2))
        }.sortBy(_._1))
  }

  /** Drop superseded state snapshots, keeping the newest `keepLast`
    * batch dirs — the small-file hygiene pass for a long-lived monitor
    * (per-batch state is c·dim rows, but the directory count grows
    * forever without it). keepLast ≥ 2 is replay-safe: foreachBatch can
    * only redeliver the most recent uncommitted batch, which reads its
    * PREDECESSOR's state — always within the kept window. */
  def prune(s: SparkSession, dir: String, keepLast: Int = 2): Int = {
    require(keepLast >= 2, "keepLast < 2 breaks the replay read")
    val base = new org.apache.hadoop.fs.Path(s"$dir/centroids")
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return 0
    val ids = fs.listStatus(base).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") => n.drop(6).toLong }
      .toSeq.sorted
    val doomed = ids.dropRight(keepLast)
    doomed.foreach { id =>
      fs.delete(new org.apache.hadoop.fs.Path(base, s"batch=$id"), true)
    }
    doomed.size
  }

  /** The live centroid table — what an IVF rebuild/re-assignment reads. */
  def centroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    latestState(s, dir, Long.MaxValue)
      .getOrElse(Array.empty[(Long, Array[Double], Long)])
      .toSeq.toDF("centroid_id", "vec", "n")
  }
}
