package graft.streaming

import graft.ingest.IngestPipeline
import graft.model.RawDoc
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest: a file-drop directory consumed with Structured
  * Streaming, each micro-batch run through the (batch) IngestPipeline
  * with PER-REPO incremental refresh of the corpus store.
  *
  * Layout contract: `watchDir/<namespace>/<repo>/<path...>` — the repo
  * identity rides in the directory structure, so one stream serves any
  * number of repos (the streaming twin of S1+S2). The store keeps two
  * datasets under `corpusPath`:
  *
  *   - `raw/`   — the retained raw docs, partitioned by (namespace, repo);
  *                the batch's version of a file replaces the prior one
  *   - `nodes/` — the five-scope corpus, partitioned by
  *                (scope, namespace, repo)
  *
  * Refresh semantics (incremental view maintenance at repo granularity):
  * a micro-batch merges its files into the affected repos' raw set, then
  * rebuilds those repos' ENTIRE five-scope slice with the batch pipeline
  * and swaps it in via dynamic partition overwrite. The invariant is
  * strong and testable: after any sequence of batches, the store equals a
  * one-shot batch ingest of the union of delivered files (latest version
  * per file) — rollup/catalog nodes refresh as new chunks arrive instead
  * of keeping their first version, and updated files replace their old
  * text. Repo granularity is the honest unit here: the LLM rollup
  * summaries need their full group text regardless, so per-batch work is
  * ∝ size of the repos touched, never ∝ corpus size. Deletions ride as
  * tombstone drops (`<path>.deleted` → the path is removed on the next
  * batch; a fully-tombstoned repo's partitions are cleaned up).
  *
  * Update delivery caveat: Spark's file source remembers seen files BY
  * PATH — an overwritten file is never re-delivered, so through the
  * drop-dir source repos are add-only. [[processBatch]] itself is
  * update-correct (latest delivered version of a filePath wins) for any
  * source that does re-deliver: a Kafka doc stream, or stamped snapshot
  * drops mapped to the same logical filePath.
  *
  * At production scale the same shape runs against an ACID table format's
  * MERGE; with plain parquet, lineage is truncated (localCheckpoint)
  * before each overwrite so the writer never reads the files it replaces.
  */
object IngestStream {

  /** Parse the watch-dir layout into RawDoc rows. */
  private[streaming] def toRawDocs(files: DataFrame, watchDir: String): DataFrame = {
    val norm = watchDir.stripSuffix("/")
    val rel = regexp_replace(col("path"),
      "^file:" + java.util.regex.Pattern.quote(norm) + "/?", "")
    files.select(
      split(rel, "/").getItem(0).as("namespace"),
      split(rel, "/").getItem(1).as("repo"),
      lit("main").as("branch"),
      regexp_replace(rel, "^[^/]+/[^/]+/", "").as("filePath"),
      col("content").cast("string").as("text"))
  }

  /** The corpus as consumers read it (scope filter prunes directories). */
  def readCorpus(spark: SparkSession, corpusPath: String): DataFrame =
    spark.read.parquet(s"$corpusPath/nodes")

  /** Tombstone suffix: dropping `<path>.deleted` deletes `<path>` from
    * its repo on the next batch. Deletions DO flow through the drop-dir
    * source — the marker is a new path, so the path-keyed file source
    * delivers it even though it re-delivers nothing. Content is ignored
    * but must be NON-EMPTY: the binaryFile source silently skips
    * zero-byte files (measured, not documented upstream). */
  val DeletedSuffix = ".deleted"

  /** One micro-batch: merge raw docs (upserts + tombstones), rebuild
    * affected repos, swap in. Public on purpose — any re-delivering
    * source (a Kafka doc stream's foreachBatch, a backfill job) drives
    * the same refresh through it. */
  def processBatch(
      batchRaw: DataFrame,
      corpusPath: String,
      pipeline: IngestPipeline,
      runId: String): Unit = {
    val sess = batchRaw.sparkSession
    import sess.implicits._
    val rawPath = s"$corpusPath/raw"
    val nodesPath = s"$corpusPath/nodes"
    if (batchRaw.isEmpty) return
    val newRaw = batchRaw.localCheckpoint(true)
    val isDel = col("filePath").endsWith(DeletedSuffix)
    // a tombstone targets its stripped path; an upsert targets itself —
    // either way the (namespace, repo, filePath) key is superseded
    val targets = newRaw.select(col("namespace"), col("repo"),
      when(isDel, regexp_replace(col("filePath"),
        java.util.regex.Pattern.quote(DeletedSuffix) + "$", ""))
        .otherwise(col("filePath")).as("filePath"))
    val upserts = newRaw.filter(!isDel)
    val affected = newRaw.select("namespace", "repo").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    // OR-of-equalities on the partition columns → directory pruning: only
    // the affected repos' raw partitions are ever read
    val affectedPred = affected
      .map { case (n, r) => col("namespace") === n && col("repo") === r }
      .reduce(_ || _)
    val fs = new Path(corpusPath)
      .getFileSystem(sess.sparkContext.hadoopConfiguration)
    val mergedPlan =
      if (fs.exists(new Path(rawPath))) {
        val prior = sess.read.parquet(rawPath).filter(affectedPred)
          .select("namespace", "repo", "branch", "filePath", "text")
        // latest version per file: drop prior rows the batch supersedes
        prior.join(targets, Seq("namespace", "repo", "filePath"), "left_anti")
          .unionByName(upserts)
      } else upserts
    // truncate lineage so the overwrite below never reads its own target
    val merged = mergedPlan.localCheckpoint(true)

    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = sess.conf.getOption(modeKey)
    sess.conf.set(modeKey, "dynamic")
    try {
      merged.write.mode(SaveMode.Overwrite)
        .partitionBy("namespace", "repo").parquet(rawPath)
      val nodes = pipeline.buildCorpus(merged.as[RawDoc], runId).toDF()
      nodes.write.mode(SaveMode.Overwrite)
        .partitionBy("scope", "namespace", "repo").parquet(nodesPath)
    } finally prevMode match {
      case Some(v) => sess.conf.set(modeKey, v)
      case None => sess.conf.unset(modeKey)
    }

    // dynamic overwrite only writes partitions PRESENT in the data: a
    // repo whose last file was tombstoned produces no rows, so its stale
    // partitions must be removed explicitly
    val remaining = merged.select("namespace", "repo").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    affected.filterNot(remaining).foreach { case (n, r) =>
      fs.delete(new Path(s"$rawPath/namespace=$n/repo=$r"), true)
      graft.model.Node.Scopes.foreach { sc =>
        fs.delete(new Path(s"$nodesPath/scope=$sc/namespace=$n/repo=$r"), true)
      }
    }
  }

  /** Manifest-source variant: the watch dir receives JSON-lines manifest
    * files, one row per operation —
    * `{"op":"put"|"delete","namespace":…,"repo":…,"branch":…,
    *   "filePath":…,"text":…}` — which removes BOTH binaryFile-source
    * caveats: updates re-deliver naturally (every manifest is a new
    * file) and deletions are explicit ops instead of marker files. Ops
    * map onto the same [[processBatch]] merge (deletes ride as tombstone
    * rows); `filePath`s ending in the tombstone suffix are reserved. */
  def startManifest(
      spark: SparkSession,
      manifestDir: String,
      corpusPath: String,
      pipeline: IngestPipeline,
      runId: String,
      checkpoint: String): StreamingQuery = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("op", StringType),
      StructField("namespace", StringType),
      StructField("repo", StringType),
      StructField("branch", StringType),
      StructField("filePath", StringType),
      StructField("text", StringType)))
    val ops = spark.readStream.schema(schema).json(manifestDir)
    ops.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val raw = batch
          .filter(col("op").isin("put", "delete") &&
            col("namespace").isNotNull && col("repo").isNotNull &&
            col("filePath").isNotNull)
          .select(
            col("namespace"), col("repo"),
            coalesce(col("branch"), lit("main")).as("branch"),
            when(col("op") === "delete",
              concat(col("filePath"), lit(DeletedSuffix)))
              .otherwise(col("filePath")).as("filePath"),
            coalesce(col("text"), lit("")).as("text"))
        processBatch(raw, corpusPath, pipeline, s"$runId-m$batchId")
      }
      .start()
  }

  def start(
      spark: SparkSession,
      watchDir: String,
      corpusPath: String,
      pipeline: IngestPipeline,
      runId: String,
      checkpoint: String): StreamingQuery = {
    val files = spark.readStream
      .format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType))))
      .option("recursiveFileLookup", "true")
      .load(watchDir)
    files.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(toRawDocs(batch, watchDir), corpusPath, pipeline,
          s"$runId-$batchId")
      }
      .start()
  }
}
