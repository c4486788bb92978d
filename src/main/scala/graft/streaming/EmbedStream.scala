package graft.streaming

import graft.queries.VectorQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental embedding near-dup — the serving-time twin of
  * [[graft.queries.VectorQueries.qEmbIncremental]]: embedding batches
  * arrive as a stream, each micro-batch probes the corpus accumulated so
  * far for semantic near-duplicates, the match report lands in a report
  * store, and the batch (WITH its cluster assignment) is appended to the
  * corpus. The nightly/continuous ingest loop a 100 TB corpus actually
  * runs.
  *
  * Stored-index discipline: the seed centroids are fixed at the first
  * non-empty batch and persisted under `corpusDir/_seeds`, and every
  * corpus batch stores (vec_id, embedding, cluster_id) — so batch N's
  * probe assigns ONLY the arriving vectors and equi-joins the stored
  * assignments. Per-batch cost is O(batch × cluster members), and
  * crucially the corpus is never re-assigned: total work over the
  * stream's life is linear in arrivals, not quadratic. (Re-seeding after
  * drift = rebuild the store with [[VectorQueries.seededCentroids]], the
  * same retrain lifecycle as a stored IVF index.)
  *
  * Exactly-once across restarts WITHOUT a transactional sink: report and
  * corpus writes go to `batch=<id>` subdirectories in overwrite mode, so
  * a replayed micro-batch (foreachBatch's at-least-once contract after a
  * crash) rewrites the same paths instead of duplicating rows, and
  * [[reportFor]] reads only batches strictly BEFORE the current id — a
  * replayed batch never probes its own pre-crash corpus write. The seed
  * write is idempotent too: recomputed from the same first batch, it
  * overwrites with identical content.
  */
object EmbedStream {

  /** Start the probe-then-append loop. `input` is a streaming frame with
    * (vec_id long, embedding array&lt;float&gt;); reports land under
    * `reportDir/batch=&lt;id&gt;`, assigned vectors under
    * `corpusDir/batch=&lt;id&gt;`. */
  def start(s: SparkSession, input: DataFrame, corpusDir: String,
      reportDir: String, checkpointDir: String, c: Int = 16,
      t: Double = 0.35): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.select(col("vec_id"), col("embedding"))
          .localCheckpoint()
        val (report, assigned) = reportFor(s, b, corpusDir, batchId, c, t)
        report.write.mode("overwrite").parquet(s"$reportDir/batch=$batchId")
        assigned.write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
        ()
      }
      .start()

  /** One micro-batch's (report, assigned-batch-to-store) pair — exposed
    * so a replay can be reproduced byte-for-byte in tests. Seeds are
    * loaded from the store or initialized from THIS batch when none
    * exist yet (first arrival). */
  def reportFor(s: SparkSession, b: DataFrame, corpusDir: String,
      batchId: Long, c: Int = 16, t: Double = 0.35): (DataFrame, DataFrame) = {
    loadOrInitSeeds(s, corpusDir, b, c) match {
      case Some(sd) =>
        // the one probe kernel every caller shares: batch-only assignment
        // against the fixed seeds, match vs the STORED (vec_id,
        // cluster_id) assignments of strictly earlier batches — the
        // corpus is never re-assigned (see scaladoc: replay idempotence)
        val (report, assigned) = VectorQueries.probeAssignedCorpus(
          b, sd, readCorpus(s, corpusDir, batchId), c, t)
        (report, assigned.select(col("vec_id"), col("embedding"), col("cluster_id")))
      case None => // only when the batch itself is empty: nothing to seed
        val assigned = b.withColumn("cluster_id", lit(null).cast("long"))
          .select(col("vec_id"), col("cluster_id"), col("embedding"))
        val report = assigned.select(col("vec_id"), col("cluster_id"),
          lit(0L).as("n_matches"),
          lit(null).cast("long").as("best_old_id"),
          lit(null).cast("double").as("best_cos"))
        (report, assigned.select(col("vec_id"), col("embedding"), col("cluster_id")))
    }
  }

  /** Streaming ingest into a STORED IVF index (the scale tier of
    * [[start]]): each micro-batch (a) reports its top-k nearest corpus
    * neighbors through the narrow two-phase q8 probe
    * ([[graft.retrieval.IvfIndex.searchQ8Lists]]) over the lists
    * accumulated by strictly-earlier batches — the probe phase scans
    * only (vec_id, centroid_id, q8), never the float vectors — then
    * (b) appends itself to `indexDir/lists/batch=<id>` partitioned by
    * centroid_id, WITH q8 codes, so the store it probes and the store it
    * grows are the same partition-pruned IVF index. Centroids fix at the
    * first non-empty batch ([[graft.retrieval.IvfIndex.buildCentroids]]
    * on that batch; persisted in the [[graft.retrieval.IvfIndex.load]]
    * layout) — re-seeding after drift is the stored-index retrain
    * lifecycle, exactly as for [[start]]'s flat seeds. Replay discipline
    * is identical too: overwrite-mode batch dirs + strictly-before probe
    * reads make a replayed micro-batch byte-idempotent. */
  def startIvf(s: SparkSession, input: DataFrame, indexDir: String,
      reportDir: String, checkpointDir: String, c: Int = 16, k: Int = 5,
      nprobe: Int = 4, overfetch: Int = 8): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.select(col("vec_id"), col("embedding"))
          .localCheckpoint()
        val (report, assigned) =
          ivfReportFor(s, b, indexDir, batchId, c, k, nprobe, overfetch)
        report.write.mode("overwrite").parquet(s"$reportDir/batch=$batchId")
        assigned.write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$indexDir/lists/batch=$batchId")
        ()
      }
      .start()

  /** One IVF micro-batch's (top-k report, assigned-batch-to-store) pair —
    * exposed for byte-for-byte replay reproduction in tests. The batch
    * doubles as the query set; it is micro-batch-sized by construction
    * (the driver-side query seq is the same bounded shape every IVF
    * search call takes). */
  def ivfReportFor(s: SparkSession, b: DataFrame, indexDir: String,
      batchId: Long, c: Int = 16, k: Int = 5, nprobe: Int = 4,
      overfetch: Int = 8): (DataFrame, DataFrame) = {
    import graft.retrieval.IvfIndex
    import org.apache.spark.sql.types.{BinaryType, DoubleType, IntegerType, LongType, StructField, StructType}
    val emptyReport = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("query_id", LongType),
        StructField("neighbor_id", LongType),
        StructField("score", DoubleType), StructField("rank", IntegerType))))
    loadOrInitCentroids(s, indexDir, b, c) match {
      case Some(cents) =>
        val assigned = IvfIndex.withQ8(
          IvfIndex.assign(b, "vec_id", "embedding", cents), "embedding")
          .localCheckpoint()
        val report = readLists(s, indexDir, batchId) match {
          case Some(lists) =>
            val queries = b.collect()
              .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
            IvfIndex.searchQ8Lists(lists, "vec_id", "embedding", queries,
              cents, nprobe, k, overfetch)
          case None => emptyReport // no corpus yet
        }
        (report, assigned)
      case None => // only when the batch itself is empty: nothing to seed
        val assigned = b
          .withColumn("centroid_id", lit(null).cast(IntegerType))
          .withColumn("q8", lit(null).cast(BinaryType))
        (emptyReport, assigned)
    }
  }

  /** Small-file hygiene for the flat corpus store ([[start]]): fold the
    * `batch=<id>` dirs with id < upTo into one compacted dir
    * ([[graft.operators.Compaction.foldBatchDirs]] — layout-preserving,
    * replay-safe, crash-safe). Safe `upTo` = the highest batch id
    * present: only that batch can still replay, and its probes read
    * strictly-earlier batches, all of which fold. Run it between
    * micro-batches on the maintenance cadence. */
  def compactCorpus(s: SparkSession, corpusDir: String, upTo: Long,
      targetBytes: Long = 128L << 20): Boolean =
    graft.operators.Compaction.foldBatchDirs(s, corpusDir, upTo, targetBytes)

  /** [[compactCorpus]] for the stored IVF index ([[startIvf]]): folds
    * `indexDir/lists/batch=*`, preserving the centroid_id partitioning
    * the probes prune on — after the fold each centroid's list is ~one
    * file instead of one per micro-batch. */
  def compactIndex(s: SparkSession, indexDir: String, upTo: Long,
      targetBytes: Long = 128L << 20): Boolean = {
    // a pending retrain swap must be resolved BEFORE a fold plans
    // against the store listing: a crashed retrain commit can have left
    // a SUBSET of batch dirs (the rest only in its stage), and a fold
    // over that listing would fold the loss in — and make the stage
    // look resumable-with-duplication afterwards (the r13 review find).
    // If the pending swap cannot be resolved here (stale or incomplete
    // stage), SKIP this cadence — retrainIvf's repair owns it.
    if (retrainPending(s, indexDir) && !resumeStagedRetrain(s, indexDir))
      false
    else
      graft.operators.Compaction.foldBatchDirs(s, s"$indexDir/lists", upTo,
        targetBytes, partitionCols = Seq("centroid_id"))
  }

  /** Stored-index RETRAIN — the re-seeding-after-drift lifecycle the
    * scaladocs above promise: when list skew (max/mean) exceeds
    * `maxSkew`, rebuild the centroids from the ACCUMULATED lists,
    * re-assign every stored vector under them (q8 codes recomputed),
    * and swap the rewritten lists in through the compaction protocol
    * ([[graft.operators.Compaction.rewriteBatchDirs]] — staged, durable
    * marker, crash-resumable). Skew is the right trigger for the same
    * reason as [[graft.retrieval.IvfIndex.refresh]]: a hot list turns
    * every probe that touches it into a near-full scan; balanced drift
    * costs recall slowly and is the recall floor's job.
    *
    * CONTRACT: run while the INGEST stream is quiescent (stopped, or
    * between micro-batches with the last batch committed) — the rewrite
    * covers every batch dir, so a redelivered batch overwriting the
    * folded dir would lose the fold. Concurrent READS need no quiescence:
    * [[probeVector]] serves throughout via its epoch-stable snapshot
    * protocol — the data-sized rewrite is staged invisibly BEFORE the
    * marker, so the probe-visible mutation window (marker → centroid
    * overwrite → dir swap → epoch bump → marker clear) is metadata-only.
    * A `_retrain_pending` marker is written before
    * the first visible mutation and removed after the swap commits, so
    * a crash anywhere between (including between the centroid write and
    * the list swap, where probes see new geometry over old assignments —
    * degraded but verified-exact subsets) is REPAIRED unconditionally by
    * the next maintenance pass. The stage is SELF-CONTAINED: the
    * rebuilt centroids are persisted INSIDE `_retrain.tmp`
    * (`_staged/centroids`) before the marker, so a pending repair that
    * finds a complete stage RESUMES it — re-writes the centroids from
    * the stage and completes the swap — instead of discarding and
    * re-staging. Resume-first is the only LOSSLESS repair once the
    * crashed commit has begun deleting original `batch=` dirs (the
    * stage then holds those rows' only copy; ADVICE r12 high), and it
    * also closes the narrower tear where the crash landed between the
    * marker and the index-root centroid write (a discard-free commit of
    * old centroids over new assignments). Only when no complete stage
    * survives (crash pre-stage, or post-rename) does the repair fall
    * back to the deterministic full rebuild, which is lossless there —
    * a destructive commit cannot begin before a complete stage exists.
    * The marker bypasses the skew and thrash
    * gates, whose inputs are no longer self-consistent mid-swap (the
    * re-derived centroid count can differ from the count that produced
    * the stored lists). Returns true iff a retrain happened.
    *
    * `c` ≤ 0 (the default) re-derives the centroid count from the
    * CURRENT corpus under the scale rule
    * ([[VectorQueries.ivfCentroidCount]]) — the point of retraining a
    * grown index is rarely the same c it started with (the r6 sf1 gate
    * caught exactly this fixed-c recall cliff), and a hot list often
    * cannot be split without more centroids. */
  def retrainIvf(s: SparkSession, indexDir: String, c: Int = 0,
      maxSkew: Double = 4.0, targetBytes: Long = 128L << 20): Boolean = {
    import graft.retrieval.IvfIndex
    val (mfs, marker) = fsOf(s, s"$indexDir/_retrain_pending")
    // resume-first repair (see scaladoc): a pending marker with a
    // complete self-contained stage is a decided swap — commit it
    if (mfs.exists(marker) && resumeStagedRetrain(s, indexDir)) return true
    // a pending marker with a PRE-UPGRADE stage — fold marker +
    // _SUCCESS but NO _staged_inputs record, from a generation whose
    // commit gate was marker+_SUCCESS alone ('='-form, or dot-form
    // WITH staged centroids; see [[legacyStageCommitMayHaveBegun]]) —
    // is the one state this build cannot repair losslessly: the
    // crashed commit may already have deleted original dirs whose rows
    // survive ONLY in the stage, and with no input record there is no
    // way to tell. Silently
    // discarding it (the full rebuild's stageRewriteBatchDirs deletes
    // orphan tmp dirs) would commit the loss with no signal — refuse
    // and demand manual adjudication instead (ADVICE r13 low: the
    // ADVICE r12 high loss class otherwise persists across the stage
    // format boundary).
    if (mfs.exists(marker) && legacyStageCommitMayHaveBegun(s, indexDir))
      throw new IllegalStateException(
        s"retrainIvf($indexDir): _retrain_pending is set and a commit-" +
        "eligible PRE-UPGRADE retrain stage (fold marker + _SUCCESS, no " +
        "_staged_inputs record) survives in lists/_retrain.tmp. " +
        "Its commit may have begun deleting original batch dirs, so the " +
        "stage may hold those rows' only copy and this build cannot " +
        "resume it blind. Refusing to auto-rebuild (that would discard " +
        "the stage and silently lose the rows). Manually either (a) " +
        "verify the stage's vec_ids cover the store and complete the " +
        "swap, or (b) verify no original dir was deleted and remove " +
        "lists/_retrain.tmp + _retrain_pending.")
    // then complete any crashed FOLD swap before LISTING the lists: a
    // fold killed mid-commit leaves a subset of batch dirs (the rest
    // only in its complete compact.tmp stage), and planning the retrain
    // against that subset would rebuild from it and commit the loss
    // (found by the r13 crash-kill sweep)
    graft.operators.Compaction.repairStore(s, s"$indexDir/lists")
    readLists(s, indexDir, Long.MaxValue) match {
      case None => false
      case Some(lists) =>
        val pending = mfs.exists(marker)
        val counts = lists.groupBy(col("centroid_id")).count()
          .collect().map(_.getLong(1))
        val cents0 = IvfIndex.loadCentroids(s, indexDir)
        if (counts.isEmpty || cents0.isEmpty) return false
        val skew = counts.max.toDouble / (counts.sum.toDouble / cents0.length)
        if (!pending && skew <= maxSkew) return false
        val all = lists.select(col("vec_id"), col("embedding"))
          .localCheckpoint()
        val cEff =
          if (c > 0) c else VectorQueries.ivfCentroidCount(counts.sum)
        val rebuilt = IvfIndex.buildCentroids(all, "vec_id", "embedding", cEff)
        // ONE assignment pass serves both the thrash guard and the
        // staged rewrite (the full-corpus assign is the retrain's
        // dominant cost — don't pay it twice)
        val reassigned = IvfIndex.withQ8(
          IvfIndex.assign(all, "vec_id", "embedding", rebuilt), "embedding")
          .localCheckpoint()
        // thrash guard: if the deterministic rebuild cannot improve the
        // balance (the hot list is a genuinely hot natural cluster —
        // k-means re-finds it), skip the swap; repeated maintenance
        // passes then converge to no-ops instead of rewriting the store
        // every cadence for nothing
        val newCounts = reassigned
          .groupBy(col("centroid_id")).count().collect().map(_.getLong(1))
        val newSkew =
          newCounts.max.toDouble / (newCounts.sum.toDouble / rebuilt.length)
        // a pending repair must complete even if the rebuild no longer
        // beats the (mid-swap, inconsistent) measured skew
        if (!pending && newSkew >= skew) return false
        // STAGE the rewritten lists before the first visible mutation:
        // concurrent probes keep serving the old store through the
        // stage's data-sized write, and the marker window that follows
        // (centroid overwrite + dir swap + epoch bump) is metadata-only
        // — so [[probeVector]]'s epoch-stable snapshot protocol spins
        // for the swap's milliseconds, never the rewrite. The stage
        // lives under its OWN tmp name (`_retrain.tmp` — underscore-prefixed so raw parquet discovery of the lists dir ignores it): its content
        // pairs with centroids not yet written, so it must never be
        // resumable by a fold — a crash here leaves an orphan that the
        // next maintenance pass discards and re-stages, NOT a
        // committable fold stage (the silent-torn-geometry hazard a
        // shared compact.tmp would open).
        val staged = graft.operators.Compaction.stageRewriteBatchDirs(
          s, s"$indexDir/lists", Long.MaxValue, targetBytes,
          partitionCols = Seq("centroid_id"),
          rewrite = _ => reassigned, tmpName = "_retrain.tmp")
        // nothing staged (anomalous listing): bail BEFORE any visible
        // mutation — no marker, no centroid overwrite, no epoch bump; a
        // set pending marker stays set so the next pass keeps repairing
        // (ADVICE r12 low: the old path left torn geometry with the
        // repair marker cleared)
        if (!staged) return false
        // make the stage self-contained BEFORE the marker: its lists
        // pair with these centroids, and carrying them inside the stage
        // is what makes a crashed commit resumable (never torn, never
        // lossy — see scaladoc)
        IvfIndex.writeCentroids(s, rebuilt, s"$indexDir/lists/_retrain.tmp/_staged")
        mfs.create(marker, true).close()
        IvfIndex.writeCentroids(s, rebuilt, indexDir)
        val swapped = graft.operators.Compaction.commitStagedRewrite(
          s, s"$indexDir/lists", tmpName = "_retrain.tmp")
        // a failed commit keeps the marker: the next maintenance pass
        // resumes (complete stage) or re-stages (incomplete) — clearing
        // it here would strand new-centroids-over-old-assignments
        if (!swapped) return false
        bumpGeomEpoch(s, indexDir)
        mfs.delete(marker, false)
        dropStagedCentroidResidue(s, indexDir)
        true
    }
  }

  /** Complete the swap a crashed [[retrainIvf]] left behind, iff its
    * SELF-CONTAINED stage survives AND still matches the store: the
    * stage's fold marker + _SUCCESS + the centroids it was assigned
    * under (`_staged/centroids` inside `_retrain.tmp`) + the recorded
    * input batch ids (`_staged_inputs`). The pairing rides in one
    * directory, so the commit is consistent by construction; and
    * because a destructive commit only ever starts after this stage is
    * complete, resuming covers the mid-delete crash where the stage
    * holds the deleted rows' ONLY copy (ADVICE r12 high — the
    * discard-and-restage repair lost them).
    *
    * Staleness rule (the r13 review find): comparing the recorded
    * inputs S against the current batch ids L —
    *   - some of S missing from L ⇒ the crashed COMMIT began deleting
    *     (folds are gated on the pending marker, so nothing else
    *     deletes while it is set): resume is MANDATORY and lossless;
    *     ids added meanwhile (a restarted ingest) were assigned under
    *     the already-durable rebuilt centroids, so they stay
    *     consistent and finishFold never touches them (> m).
    *   - S intact but L gained ids ⇒ the store MOVED ON since staging
    *     (ingest appended, or a pre-gate fold replaced dirs): the
    *     stage is STALE — committing it would duplicate rows a fold
    *     already carried forward, or install its centroids over
    *     batches assigned under the old geometry. Not resumable; the
    *     caller's full retrain re-stages over the current store.
    *   - exact match ⇒ resume (cheapest lossless repair).
    * Returns true iff the swap committed. */
  private def resumeStagedRetrain(s: SparkSession, indexDir: String): Boolean = {
    import graft.retrieval.IvfIndex
    import org.apache.hadoop.fs.Path
    val tmpDir = s"$indexDir/lists/_retrain.tmp"
    val (fs, tmpP) = fsOf(s, tmpDir)
    val complete = fs.exists(tmpP) &&
      fs.listStatus(tmpP).exists(_.getPath.getName.startsWith("_folded_upto.")) &&
      fs.exists(new Path(tmpP, "_SUCCESS")) &&
      hasParquet(fs, new Path(tmpP, "_staged/centroids"))
    if (!complete) return false
    val staged = graft.operators.Compaction.stagedInputs(
      s, s"$indexDir/lists", "_retrain.tmp")
    if (staged.isEmpty) return false // no input record: never resume blind
    val current = graft.operators.Compaction.batchIds(s, s"$indexDir/lists")
    val missing = staged.get -- current
    val added = current -- staged.get
    val (_, foldBusy) =
      graft.operators.Compaction.storeState(s, s"$indexDir/lists")
    val commitBegan = missing.nonEmpty || foldBusy
    if (!commitBegan && added.nonEmpty) return false // stale: moved on
    val cents = IvfIndex.loadCentroids(s, s"$tmpDir/_staged")
    IvfIndex.writeCentroids(s, cents, indexDir) // idempotent overwrite
    val swapped = graft.operators.Compaction.commitStagedRewrite(
      s, s"$indexDir/lists", tmpName = "_retrain.tmp")
    if (swapped) {
      bumpGeomEpoch(s, indexDir)
      val (mfs, marker) = fsOf(s, s"$indexDir/_retrain_pending")
      mfs.delete(marker, false)
      dropStagedCentroidResidue(s, indexDir)
    }
    swapped
  }

  /** True iff `lists/_retrain.tmp` holds a PRE-UPGRADE stage whose
    * commit may have begun — a stage lacking the `_staged_inputs`
    * record that nonetheless shows commit-eligible evidence from an
    * older build generation:
    *   - the legacy `_folded_upto=<m>` ('='-form) marker + _SUCCESS
    *     (the pre-self-contained generation committed on exactly that
    *     pair), or
    *   - a dot-form marker + _SUCCESS + `_staged/centroids` (the
    *     intermediate generation that staged centroids but recorded no
    *     inputs — its commit gate was marker + _SUCCESS too).
    * THIS build writes `_staged_inputs` before its marker, so a
    * dot-form stage with NEITHER the record NOR staged centroids
    * provably never reached a destructive commit (its pending marker
    * is created after both) and stays safely discardable — the
    * crash-orphan case IvfRetrainConcurrencySpec pins. A stage whose
    * record exists but whose `_staged/centroids` were lost is likewise
    * safe: missing staged GEOMETRY blocks resume, but the record
    * proves which inputs the commit would have deleted, and
    * [[resumeStagedRetrain]]'s staleness rule already adjudicates it. */
  private def legacyStageCommitMayHaveBegun(
      s: SparkSession, indexDir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val (fs, tmpP) = fsOf(s, s"$indexDir/lists/_retrain.tmp")
    if (!fs.exists(tmpP)) return false
    val names = fs.listStatus(tmpP).map(_.getPath.getName)
    if (names.contains("_staged_inputs") || !names.contains("_SUCCESS"))
      return false
    val eqMarker = names.exists(_.startsWith("_folded_upto="))
    val dotMarker = names.exists(_.startsWith("_folded_upto."))
    eqMarker ||
      (dotMarker && hasParquet(fs, new Path(tmpP, "_staged/centroids")))
  }

  /** Best-effort removal of `_staged` centroid dirs that rode into live
    * `batch=` dirs with the commit's rename. Underscore-prefixed, so
    * parquet discovery never sees them — this is hygiene, not
    * correctness; a crash before it just leaves invisible residue (a
    * live dir can never satisfy [[resumeStagedRetrain]]'s stage check,
    * so stale residue never resurrects). */
  private def dropStagedCentroidResidue(s: SparkSession, indexDir: String): Unit = {
    val (fs, root) = fsOf(s, s"$indexDir/lists")
    if (!fs.exists(root)) return
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .foreach { st =>
        fs.delete(new org.apache.hadoop.fs.Path(st.getPath, "_staged"), true)
      }
  }

  /** Geometry epoch of a stored IVF index — bumped as the last mutation
    * of every committed [[retrainIvf]] swap (content-preserving folds do
    * NOT bump it). [[probeVector]] brackets its centroid+list reads with
    * this and the `_retrain_pending` marker to take a consistent
    * snapshot without quiescing the maintenance cadence. */
  def geomEpoch(s: SparkSession, indexDir: String): Long = {
    val (fs, root) = fsOf(s, indexDir)
    if (!fs.exists(root)) 0L
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("_epoch="))
      .flatMap(_.drop("_epoch=".length).toLongOption)
      .foldLeft(0L)(math.max)
  }

  /** Create the successor epoch file, then drop older ones — a racing
    * [[geomEpoch]] read takes the max, so it sees the old epoch until
    * the new file exists and the new one after, never neither. */
  private def bumpGeomEpoch(s: SparkSession, indexDir: String): Unit = {
    val (fs, root) = fsOf(s, indexDir)
    val next = geomEpoch(s, indexDir) + 1
    fs.create(new org.apache.hadoop.fs.Path(root, s"_epoch=$next"), true).close()
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("_epoch=") &&
        p.getName.drop("_epoch=".length).toLongOption.exists(_ < next))
      .foreach(p => fs.delete(p, false))
  }

  private def retrainPending(s: SparkSession, indexDir: String): Boolean = {
    val (fs, p) = fsOf(s, s"$indexDir/_retrain_pending")
    fs.exists(p)
  }

  /** One consistent reading of the index's mutation markers: geometry
    * epoch + retrain marker from ONE listing of the index root, plus
    * the lists store's fold stamp ([[graft.operators.Compaction
    * .storeStamp]]) — folds are content-preserving so they don't bump
    * the EPOCH, but their commit's delete→rename window shows a SUBSET
    * of batch dirs with no exception, so the probe bracket must watch
    * the stamp too. */
  private def indexState(s: SparkSession, indexDir: String): (Long, Long, Boolean) = {
    val (fs, root) = fsOf(s, indexDir)
    val names =
      if (fs.exists(root)) fs.listStatus(root).map(_.getPath.getName).toSeq
      else Seq.empty[String]
    val epoch = names.filter(_.startsWith("_epoch="))
      .flatMap(_.drop("_epoch=".length).toLongOption).foldLeft(0L)(math.max)
    val pending = names.contains("_retrain_pending")
    val (stamp, foldBusy) =
      graft.operators.Compaction.storeState(s, s"$indexDir/lists")
    // a fold's in-progress marker blocks like the retrain marker: a
    // probe born inside the delete→rename window would otherwise see
    // the bumped stamp on both sides of a subset listing
    (epoch, stamp, pending || foldBusy)
  }

  /** Serving-path single-vector search of the accumulated IVF store —
    * the dense twin of [[DedupStream.probeText]], wired behind
    * `POST /vsearch` on the shim: load the stored centroids, scan the
    * `nprobe` nearest lists' int8 codes, exact-rerank the overfetched
    * survivors in float (the [[graft.retrieval.IvfIndex.searchQ8Lists]]
    * kernel with a one-query batch). Cost is probed-lists-bounded,
    * never a corpus scan; returns (vec_id, cosine) best-first, empty
    * before the first committed batch.
    *
    * Safe to serve concurrently with [[compactIndex]] AND [[retrainIvf]]
    * (VERDICT r10 item 5): each attempt brackets the centroid + list
    * reads with (geometry epoch, fold stamp, `_retrain_pending`
    * marker) — all three unchanged/absent on both sides proves the
    * centroids and the assignments it read belong to one committed
    * store state. The epoch catches retrains (torn new-centroids /
    * old-assignments); the FOLD STAMP catches compaction commits, whose
    * delete→rename window shows a silent SUBSET of batch dirs that no
    * exception-based retry could see; dirs deleted after the listing
    * surface as FileNotFound and re-attempt like any unstable snapshot.
    * The retry budget is generous relative to the windows it waits out:
    * a retrain stages its data-sized rewrite BEFORE the marker, so both
    * mutation windows are metadata-only. Exhaustion — a pathologically
    * re-triggering maintenance loop, or a genuinely broken store —
    * throws with the last underlying failure attached as the cause.
    * Cost in the steady state: two metadata listings per bracket side;
    * on an object store, cache-worthy, documented trade for lock-free
    * maintenance. */
  def probeVector(s: SparkSession, indexDir: String, vec: Array[Float],
      k: Int = 5, nprobe: Int = 4, overfetch: Int = 8): Seq[(Long, Double)] = {
    import graft.operators.Compaction.causeChainHasFileNotFound
    val maxAttempts = 40
    var attempt = 0
    var lastEx: Throwable = null
    while (attempt < maxAttempts) {
      val (e1, st1, pending1) = indexState(s, indexDir)
      if (!pending1) {
        val res =
          try Some(probeVectorOnce(s, indexDir, vec, k, nprobe, overfetch))
          catch {
            case e: Throwable if causeChainHasFileNotFound(e) =>
              lastEx = e; None
          }
        res match {
          case Some(r) =>
            val (e2, st2, pending2) = indexState(s, indexDir)
            if (!pending2 && e2 == e1 && st2 == st1) return r
          case None => () // listing raced a swap: re-attempt
        }
      }
      attempt += 1
      Thread.sleep(25L * math.min(attempt, 8))
    }
    throw new IllegalStateException(
      s"probeVector: no stable geometry snapshot of $indexDir after " +
        s"$maxAttempts attempts — maintenance re-triggering in a loop, " +
        "or a broken store (see cause)", lastEx)
  }

  private def probeVectorOnce(s: SparkSession, indexDir: String,
      vec: Array[Float], k: Int, nprobe: Int,
      overfetch: Int): Seq[(Long, Double)] = {
    import graft.retrieval.IvfIndex
    val (fs, p) = fsOf(s, s"$indexDir/centroids")
    if (!hasParquet(fs, p)) return Nil
    val cents = IvfIndex.loadCentroids(s, indexDir)
    readLists(s, indexDir, Long.MaxValue) match {
      case None => Nil
      case Some(lists) =>
        // query id -1: the kernel excludes id == query_id self-matches,
        // and stored vec_ids are non-negative by the store contract
        IvfIndex.searchQ8Lists(lists, "vec_id", "embedding",
          Seq((-1L, vec)), cents, nprobe, k, overfetch)
          .orderBy(col("rank"))
          .collect()
          .map(r => (r.getLong(1), r.getDouble(2)))
          .toSeq
    }
  }

  /** Fixed centroids, initialized from the first non-empty batch (the
    * same idempotent-overwrite contract as [[loadOrInitSeeds]]). */
  private def loadOrInitCentroids(s: SparkSession, indexDir: String,
      b: DataFrame, c: Int): Option[Array[(Int, Array[Float])]] = {
    import graft.retrieval.IvfIndex
    val (fs, p) = fsOf(s, s"$indexDir/centroids")
    if (hasParquet(fs, p)) Some(IvfIndex.loadCentroids(s, indexDir))
    else if (b.isEmpty) None
    else {
      val cents = IvfIndex.buildCentroids(b, "vec_id", "embedding", c)
      IvfIndex.writeCentroids(s, cents, indexDir)
      Some(cents)
    }
  }

  /** The IVF lists accumulated by batches STRICTLY BEFORE `beforeBatch`
    * (each batch dir is partitioned by centroid_id, so a "has data" check
    * must look one level down), or None before the first commit. */
  private def readLists(s: SparkSession, indexDir: String,
      beforeBatch: Long): Option[DataFrame] = {
    val (fs, root) = fsOf(s, s"$indexDir/lists")
    if (!fs.exists(root)) return None
    val parts = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(st => st.getPath.getName.drop("batch=".length).toLongOption
        .exists(_ < beforeBatch))
      .filter(st => fs.listStatus(st.getPath).exists(sub =>
        sub.isDirectory && hasParquet(fs, sub.getPath)))
      .map(_.getPath.toString)
    if (parts.isEmpty) None
    else {
      // basePath: each batch dir nests centroid_id=* partitions, so the
      // multi-dir read needs the common root to infer one partitioning
      val lists = s.read.option("basePath", root.toString).parquet(parts: _*)
      if (lists.isEmpty) None else Some(lists)
    }
  }

  private def fsOf(s: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  private def hasParquet(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))

  /** The fixed seed set, initialized from the first non-empty batch (a
    * half-written seed dir from a crash is rewritten — content is
    * deterministic, so the overwrite is idempotent). */
  private def loadOrInitSeeds(s: SparkSession, corpusDir: String,
      b: DataFrame, c: Int): Option[DataFrame] = {
    val seedPath = s"$corpusDir/_seeds"
    val (fs, p) = fsOf(s, seedPath)
    if (hasParquet(fs, p)) Some(s.read.parquet(seedPath))
    else if (b.isEmpty) None
    else {
      val seeds = VectorQueries.seededCentroids(b, c).localCheckpoint()
      seeds.write.mode("overwrite").parquet(seedPath)
      Some(seeds)
    }
  }

  /** The assigned corpus accumulated by batches STRICTLY BEFORE
    * `beforeBatch`, or None before the first commit (tolerates a
    * half-written replay victim: only `batch=*` subdirs that contain
    * parquet are readable, and overwrite-mode replay repairs them). */
  private def readCorpus(s: SparkSession, corpusDir: String,
      beforeBatch: Long): Option[DataFrame] = {
    val (fs, root) = fsOf(s, corpusDir)
    if (!fs.exists(root)) return None
    val parts = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(st => st.getPath.getName.drop("batch=".length).toLongOption
        .exists(_ < beforeBatch))
      .filter(st => hasParquet(fs, st.getPath))
      .map(_.getPath.toString)
    if (parts.isEmpty) None
    else {
      val corpus = s.read.parquet(parts: _*)
        .select(col("vec_id"), col("cluster_id"), col("embedding"))
      if (corpus.isEmpty) None else Some(corpus)
    }
  }
}
