package graft.streaming

import graft.functions.TextFunctions.{fingerprint, jaccardShingles, minhashBands, minhashSignature, shingles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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

/** Streaming NEAR-duplicate maintenance — the incremental twin of
  * [[graft.queries.DedupQueries.qDedupMinhashLsh]] (the last dedup
  * family member without one; exact dedup has [[DedupStream]],
  * embedding near-dup has [[EmbedStream]]). The MinHash band index is
  * the materialized state: every micro-batch writes its band postings
  * and shingle sets as `batch=<id>` deltas (doc_ids never repeat
  * across batches, so the union of deltas IS the index — the
  * [[IndexStream]] ledger discipline, overwrite-by-path making
  * redelivered batches byte-identical no-ops), probes the NEW docs
  * against the STORED index (new→old, |batch|×collisions — the corpus
  * never re-pairs against itself) plus the within-batch self-join,
  * verifies candidates with exact Jaccard, and appends the verified
  * pairs. Union of pair deltas ≡ the batch LSH on the accumulated
  * corpus: every pair's later-arriving side lands in exactly one
  * batch, where it is found either cross-batch or within-batch —
  * asserted in DedupStreamSpec.
  *
  * At 100 TB: per-batch cost is O(batch × collisions); the band-key
  * probe and the candidate-bounded shingle fetch are doc_id-keyed
  * joins against the stored state, and the pair ledger compacts with
  * [[graft.operators.Compaction]] like the other streaming stores. */
object MinhashStream {

  private val NumHashes = 128
  private val Bands = 32
  private val Threshold = 0.8

  /** Start maintaining the near-dup index at `indexDir` from a
    * streaming (doc_id long, text string) frame. */
  def start(s: SparkSession, input: DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeDelta(batch, indexDir, batchId)
      }
      .start()

  /** One micro-batch: index the batch, probe it, append verified pairs.
    * Exposed so specs can reproduce a redelivered batch byte-for-byte. */
  def writeDelta(batch: DataFrame, indexDir: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    val sh = batch
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    val banded = minhashBands(
      sh.select(col("doc_id"), minhashSignature(col("sh"), NumHashes).as("sig")),
      NumHashes, Bands)
      .localCheckpoint()

    // probe the STRICTLY-BEFORE stored postings (the [[EmbedStream]]
    // replay discipline: a redelivered batch must not see its own
    // earlier write), so cross-batch and within-batch candidates
    // partition cleanly and a pair can never be found twice
    val storedBands = before(s, s"$indexDir/bands", batchId,
      "doc_id BIGINT, band_idx INT, band_key BIGINT")
    val cross = banded.as("a")
      .join(storedBands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key"))
      .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("old_id"))
    val within = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("old_id"))
    val cand = cross.unionByName(within).dropDuplicates("new_id", "old_id")

    // verify with exact Jaccard: batch-side shingles are in hand, the
    // old side is a doc_id-keyed fetch from the stored shingle state
    val oldSh = before(s, s"$indexDir/shingles", batchId,
      "doc_id BIGINT, sh ARRAY<STRING>").unionByName(sh)
    val pairs = cand
      .join(sh.select(col("doc_id").as("new_id"), col("sh").as("sh_a")), "new_id")
      .join(oldSh.select(col("doc_id").as("old_id"), col("sh").as("sh_b")), "old_id")
      .withColumn("jaccard", jaccardShingles(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= Threshold)
      .select(least(col("new_id"), col("old_id")).as("doc_a"),
        greatest(col("new_id"), col("old_id")).as("doc_b"),
        round(col("jaccard"), 4).as("jaccard"))

    pairs.write.mode("overwrite").parquet(s"$indexDir/pairs/batch=$batchId")
    banded.write.mode("overwrite").parquet(s"$indexDir/bands/batch=$batchId")
    sh.write.mode("overwrite").parquet(s"$indexDir/shingles/batch=$batchId")
    ()
  }

  private def empty(s: SparkSession, schema: String): DataFrame =
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  /** The component restricted to batches strictly before `beforeBatch`
    * — the probe-side view a replayed micro-batch must get. */
  private def before(s: SparkSession, dir: String, beforeBatch: Long,
      schema: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val cols = schema.split(",").map(_.trim.split(" ")(0))
    if (!fs.exists(p)) return empty(s, schema)
    val parts = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(_.getPath.getName.drop("batch=".length).toLongOption
        .exists(_ < beforeBatch))
      // an empty delta dir has no part files to infer a schema from
      .filter(st => fs.listStatus(st.getPath)
        .exists(_.getPath.getName.endsWith(".parquet")))
      .map(_.getPath.toString)
    if (parts.isEmpty) empty(s, schema)
    else s.read.parquet(parts: _*).select(cols.map(col).toIndexedSeq: _*)
  }

  /** Merge-on-read view of the accumulated verified near-dup pairs —
    * the batch query's (doc_a, doc_b, jaccard) contract. A batch with
    * no near-dups writes an empty delta, so this rides the
    * schema-tolerant strictly-before reader with an unbounded cutoff.
    * LAZY (no retry can protect a caller's action time), so
    * package-private like the winnow fingerprints view (r12): the
    * serving-path entry point is [[probeText]], which materializes
    * inside the fold-stable bracket; in-package callers quiesce or
    * own the bracket. */
  private[graft] def pairs(s: SparkSession, indexDir: String): DataFrame =
    before(s, s"$indexDir/pairs", Long.MaxValue,
      "doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE")

  /** Admission-check probe for ONE candidate document against the
    * accumulated index — the serving-path form of [[writeDelta]]'s
    * probe (wired behind `POST /neardup` on the shim): band the text
    * with the same signature kernel, broadcast its ≤[[Bands]] band keys
    * against the stored postings, fetch only candidate shingle sets,
    * verify exact Jaccard. Cost is collisions-bounded, never a corpus
    * scan of the text itself. Returns (doc_id, jaccard) matches ≥ the
    * threshold, best first.
    *
    * Safe to serve concurrently with [[compact]]: the dir listing and
    * the Parquet reads are not atomic, so a fold can delete a listed
    * `batch=` dir mid-probe (FileNotFound) — or delete it BEFORE the
    * listing, which shows a silent SUBSET of the store with no
    * exception at all. The probe re-attempts on both, the latter via
    * the fold stamp every commit bumps before its first delete
    * ([[graft.operators.Compaction.stableAcrossFolds]]). */
  def probeText(s: SparkSession, indexDir: String, text: String,
      threshold: Double = Threshold): Seq[(Long, Double)] =
    graft.operators.Compaction.stableAcrossFolds(
      s, Seq(s"$indexDir/bands", s"$indexDir/shingles"))(
      probeTextOnce(s, indexDir, text, threshold))

  private def probeTextOnce(s: SparkSession, indexDir: String, text: String,
      threshold: Double): Seq[(Long, Double)] = {
    import s.implicits._
    val one = Seq(text).toDF("text")
      .select(shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    if (one.isEmpty) return Nil
    val probe = minhashBands(
      one.select(col("sh"), minhashSignature(col("sh"), NumHashes).as("sig")),
      NumHashes, Bands)
      .localCheckpoint()
    val stored = before(s, s"$indexDir/bands", Long.MaxValue,
      "doc_id BIGINT, band_idx INT, band_key BIGINT")
    val cand = stored
      .join(broadcast(probe.select(col("band_idx"), col("band_key"))),
        Seq("band_idx", "band_key"))
      .select(col("doc_id")).distinct()
    val oldSh = before(s, s"$indexDir/shingles", Long.MaxValue,
      "doc_id BIGINT, sh ARRAY<STRING>")
    cand.join(oldSh, "doc_id")
      .crossJoin(broadcast(probe.select(col("sh").as("probe_sh")).limit(1)))
      .withColumn("jaccard", jaccardShingles(col("probe_sh"), col("sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq
  }

  /** Small-file hygiene for all three stores: fold `batch=<id>` dirs
    * with id < upTo ([[graft.operators.Compaction.foldBatchDirs]] —
    * layout-preserving, replay-safe; the fold lands as `batch=<max
    * folded id>`, so the strictly-before probe view keeps its
    * semantics). Safe `upTo` = the highest batch id present, same as
    * [[EmbedStream.compactCorpus]]. */
  def compact(s: SparkSession, indexDir: String, upTo: Long,
      targetBytes: Long = 128L << 20): Boolean = {
    val a = graft.operators.Compaction.foldBatchDirs(
      s, s"$indexDir/bands", upTo, targetBytes)
    val b = graft.operators.Compaction.foldBatchDirs(
      s, s"$indexDir/shingles", upTo, targetBytes)
    val c = graft.operators.Compaction.foldBatchDirs(
      s, s"$indexDir/pairs", upTo, targetBytes)
    a || b || c
  }
}

/** Streaming winnowing-fingerprint index maintenance — the incremental
  * twin of [[graft.queries.DedupQueries]]'s dd_winnowing (VERDICT r9
  * item 5; [[MinhashStream]] is the pattern — winnowing fingerprints
  * are the same posting-list shape, doc → selected prints).
  *
  * Each micro-batch runs the SELECTION stage (the linear-in-chars gram
  * explode + packed-window min — the expensive half, and a pure
  * per-document function) exactly once per arriving document and lands
  * the (doc_id, h) postings as a `batch=<id>` delta: doc_ids never
  * repeat across batches, so the union of deltas IS the batch
  * selection relation, and overwrite-by-path makes a redelivered batch
  * a byte-identical no-op (the [[IndexStream]] ledger discipline).
  *
  * The REPORT stays merge-on-read, deliberately: the boilerplate cull
  * (df ≤ 64) and the post-cull overlap denominators are CORPUS-GLOBAL —
  * a fingerprint can cross the df cap only after more docs arrive,
  * retroactively re-scoring earlier pairs — so any eagerly-emitted pair
  * delta would be wrong the moment the cull shifted (the max_sat-under-
  * merged-stats lesson from [[IndexStream.compact]]). [[report]] feeds
  * the accumulated postings through the SAME
  * `DedupQueries.winnowingReportFrom` kernel the batch query uses, so
  * stream and batch cannot disagree by construction; the spec pins the
  * fingerprint-set parity that makes that argument complete. */
object WinnowStream {

  /** Start maintaining the fingerprint index at `indexDir` from a
    * streaming (doc_id long, text string) frame. */
  def start(s: SparkSession, input: DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeDelta(batch, indexDir, batchId)
      }
      .start()

  /** One micro-batch: select the batch's fingerprints, append the
    * posting delta. Exposed so specs can reproduce a redelivered batch
    * byte-for-byte. */
  def writeDelta(batch: DataFrame, indexDir: String, batchId: Long): Unit = {
    graft.queries.DedupQueries
      .winnowingFingerprints(batch.select(col("doc_id"), col("text")))
      .write.mode("overwrite").parquet(s"$indexDir/prints/batch=$batchId")
    ()
  }

  private def empty(s: SparkSession): DataFrame =
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, h BIGINT"))

  /** Merge-on-read view of the accumulated selected fingerprints —
    * row-equal to `winnowingFingerprints` over the accumulated corpus.
    * The listing+footer read retries across a concurrent [[compact]]
    * (ADVICE r10); the returned frame is lazy, so a caller acting on it
    * while a fold is racing would still hit FileNotFoundException at
    * action time. That makes it an easy-to-misuse surface (ADVICE r11),
    * so it is package-private: external serving paths go through
    * [[report]] / [[probeText]], which materialize (or collect) INSIDE
    * the retry; in-package callers own the action-time retry. */
  private[graft] def fingerprints(s: SparkSession, indexDir: String): DataFrame =
    graft.operators.Compaction.retryFileGone {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/prints")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) empty(s)
      else {
        val parts = fs.listStatus(p).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
          .filter(st => fs.listStatus(st.getPath)
            .exists(_.getPath.getName.endsWith(".parquet")))
          .map(_.getPath.toString)
        if (parts.isEmpty) empty(s)
        else s.read.parquet(parts: _*).select(col("doc_id"), col("h"))
      }
    }

  /** The MOSS pair report over the accumulated index — the batch
    * query's (doc_a, doc_b, n_shared, overlap) contract, through the
    * shared report kernel (cull + denominators evaluated over the FULL
    * accumulated relation, see the object scaladoc). Materialized
    * (localCheckpoint) INSIDE a fold-stable bracket
    * ([[graft.operators.Compaction.stableAcrossFolds]]), so a
    * serving-path report racing a concurrent [[compact]] re-reads a
    * fresh listing whether the race surfaced as FileNotFound or as a
    * silent subset listing, and the returned frame no longer depends
    * on the store files at all (ADVICE r10, hardened r12).
    *
    * Block-manager hygiene (ADVICE r11): each call unpersists the
    * PREVIOUS call's checkpoint for the same store, so a long-lived
    * serving session holds at most one report generation per index
    * instead of accumulating storage without bound. Consequently a
    * caller owns the returned frame only until its next `report()` on
    * the same `indexDir` — consume (collect/write) before re-calling,
    * which is the shape every serving handler has anyway. */
  def report(s: SparkSession, indexDir: String): DataFrame =
    graft.operators.Compaction.stableAcrossFolds(
      s, Seq(s"$indexDir/prints")) {
      val fresh = graft.queries.DedupQueries
        .winnowingReportFrom(fingerprints(s, indexDir))
        .orderBy(col("doc_a"), col("doc_b"))
        .localCheckpoint()
      Option(lastReport.put(indexDir, fresh))
        .filter(_ ne fresh)
        .foreach(graft.operators.Checkpoints.unpersist(_))
      fresh
    }

  /** Previous [[report]] generation per store, unpersisted on refresh. */
  private val lastReport =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Admission-check probe for ONE candidate document against the
    * accumulated fingerprint index — the serving-path twin of
    * [[MinhashStream.probeText]] (wired behind `POST /fingerprint` on
    * the shim). The text runs the same selection kernel; its prints
    * equi-join the stored postings (collision-bounded, never a corpus
    * text scan); store-wide df for exactly the probe's prints falls out
    * of that join, so the boilerplate cull applies without touching any
    * other posting list — and the cull counts the probe itself
    * (culled iff store-df + 1 > cap), matching the report the batch
    * kernel would produce AFTER this doc is admitted. Returns
    * (doc_id, n_shared, overlap) for docs
    * sharing ≥ `minShared` comparable prints, best first — overlap here
    * is CONTAINMENT OF THE PROBE (n_shared / the probe's comparable
    * print count): the admission question is "how much of the NEW doc
    * is already covered", unlike the batch report's symmetric
    * min-denominator (documented divergence by design). Retries across
    * a concurrent [[compact]] like the MinHash probe. */
  def probeText(s: SparkSession, indexDir: String, text: String,
      minShared: Long = 2L,
      cap: Int = graft.queries.DedupQueries.WinnowMaxDf)
      : Seq[(Long, Long, Double)] =
    graft.operators.Compaction.stableAcrossFolds(
      s, Seq(s"$indexDir/prints"))(
      probeTextOnce(s, indexDir, text, minShared, cap))

  private def probeTextOnce(s: SparkSession, indexDir: String, text: String,
      minShared: Long, cap: Int): Seq[(Long, Long, Double)] = {
    import s.implicits._
    val probe = graft.queries.DedupQueries
      .winnowingFingerprints(Seq((0L, text)).toDF("doc_id", "text"))
      .select(col("h")).localCheckpoint()
    val nProbe = probe.count()
    if (nProbe == 0) return Nil
    val matched = fingerprints(s, indexDir)
      .join(broadcast(probe), "h")
      .localCheckpoint() // collision-bounded; reused by df + rollup
    // Store-wide df, computed ONLY for the probe's prints. The cull
    // counts the probe itself (`df + 1 > cap`): once this doc is
    // admitted, each shared print's df rises by one, so a print at
    // df == cap is ALREADY boilerplate from the admission decision's
    // point of view — this keeps the probe verdict consistent with the
    // batch report evaluated after admission (ADVICE r10: the
    // store-only cull disagreed with the post-admission report exactly
    // at the cap boundary).
    val dfs = matched.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val nBoiler = dfs.filter(col("df") + lit(1) > cap).count()
    val denom = nProbe - nBoiler // unmatched prints are comparable too
    if (denom <= 0) return Nil
    matched
      .join(broadcast(dfs.filter(col("df") + lit(1) <= cap).select(col("h"))), "h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .withColumn("overlap",
        round(col("n_shared").cast("double") / denom.toDouble, 4))
      .orderBy(col("overlap").desc, col("n_shared").desc, col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
  }

  /** Small-file hygiene ([[MinhashStream.compact]] contract). */
  def compact(s: SparkSession, indexDir: String, upTo: Long,
      targetBytes: Long = 128L << 20): Boolean =
    graft.operators.Compaction.foldBatchDirs(
      s, s"$indexDir/prints", upTo, targetBytes)
}
