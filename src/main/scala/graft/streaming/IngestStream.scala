package graft.streaming

import graft.ingest.IngestPipeline
import graft.model.RawDoc
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest: a file-drop directory consumed with Structured
  * Streaming, each micro-batch run through the (batch) IngestPipeline and
  * appended to the corpus store incrementally.
  *
  * Layout contract: `watchDir/<namespace>/<repo>/<path...>` — the repo
  * identity rides in the directory structure, so one stream serves any
  * number of repos (the streaming twin of S1+S2).
  *
  * Idempotence: node row ids are content-position stable (P7 sha1), so
  * re-dropped or re-listed files dedup with a left-anti join against the
  * store's existing ids before append — exactly-once corpus rows on
  * at-least-once file delivery. At scale the anti join reads only the
  * store's rowId column (column pruning) and AQE broadcasts the (small)
  * new-batch side.
  *
  * Caveat (documented, not hidden): rollup-scope nodes (file/module/
  * repo/catalog) keyed by the same group across batches keep their FIRST
  * version — refreshing a rollup as new chunks arrive needs an upsert
  * store (Delta MERGE or scope+repo partition overwrite), which is
  * round-2 work (NOTES.md). Chunk-scope rows are exact under this
  * contract.
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
        val sess = batch.sparkSession
        import sess.implicits._
        val raw = toRawDocs(batch, watchDir).as[RawDoc]
        val nodes = pipeline.buildCorpus(raw, s"$runId-$batchId").toDF()
        val fresh =
          if (new org.apache.hadoop.fs.Path(corpusPath)
            .getFileSystem(sess.sparkContext.hadoopConfiguration)
            .exists(new org.apache.hadoop.fs.Path(corpusPath))) {
            val existing = sess.read.parquet(corpusPath).select("rowId")
            nodes.join(existing, Seq("rowId"), "left_anti")
          } else nodes
        fresh.write.mode(SaveMode.Append).partitionBy("scope").parquet(corpusPath)
      }
      .start()
  }
}
