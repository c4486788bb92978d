package graft.streaming

import graft.multimodal.{AudioProbe, ImageProbe, Media, VideoProbe}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming media-metadata extraction — the multimodal family's
  * streaming twin (every other family has one): blobs arrive as a
  * stream and each micro-batch probes container headers ONCE at the
  * ingest edge, appending a typed metadata ledger the curation queries
  * (mm_image_dims / mm_audio_meta / mm_video_meta shapes) read instead
  * of re-parsing 100 TB of payload bytes nightly.
  *
  * Modality is sniffed from magic bytes — PNG/JPEG/GIF → image,
  * RIFF/WAVE → audio, ISO-BMFF ftyp → video — via the SAME pure-JVM
  * probes as the batch queries, so stream and batch can only disagree
  * on delivery, not parsing. Unparseable blobs land in the ledger as
  * kind = "corrupt" (a curation pipeline wants the reject COUNTED, not
  * silently dropped). Deltas follow the [[IndexStream]] ledger
  * discipline: one `batch=<id>` dir per micro-batch in overwrite mode,
  * so a redelivered batch rewrites the same path byte-for-byte, and
  * media_ids never repeat across batches — the union of deltas IS the
  * metadata table. Per-batch cost is O(batch); payload bytes never
  * shuffle (the probe is a mapPartitions over the arriving rows). */
object MediaStream {

  /** One ledger row per arrived blob; the unmatched modality's fields
    * stay null (typed parquet schema, not a stringly map). */
  case class MediaMeta(
      media_id: Long, kind: String, format: String,
      width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], channels: Option[Int],
      duration_ms: Option[Long])

  /** Probe one blob through the magic-byte dispatch. */
  def probeAny(id: Long, blob: Array[Byte]): MediaMeta =
    ImageProbe.probe(blob)
      .map(d => MediaMeta(id, "image", d.format,
        Some(d.width), Some(d.height), None, None, None))
      .orElse(AudioProbe.probe(blob).map(m =>
        MediaMeta(id, "audio", m.format, None, None,
          Some(m.sampleRate), Some(m.channels), Some(m.durationMs))))
      .orElse(VideoProbe.probe(blob).map(m =>
        MediaMeta(id, "video", m.format, None, None, None, None,
          Some(m.durationMs))))
      .getOrElse(MediaMeta(id, "corrupt", "unknown",
        None, None, None, None, None))

  /** The batched probe over a (media_id, blob) frame — shared by the
    * stream below and any batch caller (same batch shape as
    * [[Media.probeDims]]). */
  def probeBatch(blobs: DataFrame): Dataset[MediaMeta] = {
    val s = blobs.sparkSession
    import s.implicits._
    blobs.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) => probeAny(id, blob) })
  }

  /** Start maintaining the metadata ledger at `ledgerDir` from a
    * streaming (media_id long, blob binary) frame. */
  def start(s: SparkSession, input: DataFrame, ledgerDir: String,
      checkpointDir: String): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeDelta(batch, ledgerDir, batchId)
      }
      .start()

  /** One micro-batch's delta — exposed so specs can reproduce a
    * redelivered batch byte-for-byte. */
  def writeDelta(batch: DataFrame, ledgerDir: String, batchId: Long): Unit = {
    probeBatch(batch).write.mode("overwrite")
      .parquet(s"$ledgerDir/batch=$batchId")
    ()
  }

  /** Merge-on-read view of the accumulated metadata ledger. Reads ONLY
    * `batch=<id>` dirs (never a naive root read): a crashed compact can
    * leave `compact.tmp` beside the deltas until the next maintenance
    * pass resumes it, and naive partition discovery would throw on the
    * mixed layout — the same listing discipline as the MinHash and IVF
    * stores. */
  def metadata(s: SparkSession, ledgerDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val empty = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "media_id BIGINT, kind STRING, format STRING, width INT, " +
          "height INT, sample_rate INT, channels INT, duration_ms BIGINT"))
    if (!fs.exists(p)) return empty
    val parts = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(st => fs.listStatus(st.getPath)
        .exists(_.getPath.getName.endsWith(".parquet")))
      .map(_.getPath.toString)
    if (parts.isEmpty) empty
    else s.read.parquet(parts: _*)
      .select(col("media_id"), col("kind"), col("format"), col("width"),
        col("height"), col("sample_rate"), col("channels"), col("duration_ms"))
  }

  /** Small-file hygiene, same contract as the other streaming stores. */
  def compact(s: SparkSession, ledgerDir: String, upTo: Long,
      targetBytes: Long = 128L << 20): Boolean =
    graft.operators.Compaction.foldBatchDirs(s, ledgerDir, upTo, targetBytes)

  /** Shared landmarks an /audiomatch probe must hit to match. */
  val MatchMinShared = 5

  /** Maintain the audio-fingerprint posting store at `indexDir` from a
    * streaming (media_id long, blob binary) frame — the audio twin of
    * the MinHash band store: each micro-batch appends its recordings'
    * (media_id, landmark-hash) postings as one `batch=<id>` delta
    * (overwrite mode — a redelivered batch rewrites the same path
    * byte-for-byte), and the union of deltas IS the match index
    * [[probeAudio]] serves against. Non-audio/corrupt blobs contribute
    * no postings (audioLandmarkIndex drops them). */
  def startLandmarks(s: SparkSession, input: DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeLandmarkDelta(batch, indexDir, batchId)
      }
      .start()

  /** One micro-batch's posting delta — exposed for replay specs. */
  def writeLandmarkDelta(batch: DataFrame, indexDir: String,
      batchId: Long): Unit = {
    Media.audioLandmarkIndex(batch).write.mode("overwrite")
      .parquet(s"$indexDir/batch=$batchId")
    ()
  }

  /** Merge-on-read view of the accumulated posting store. */
  def landmarkIndex(s: SparkSession, indexDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val empty = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "media_id BIGINT, h BIGINT"))
    if (!fs.exists(p)) return empty
    val parts = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(st => fs.listStatus(st.getPath)
        .exists(_.getPath.getName.endsWith(".parquet")))
      .map(_.getPath.toString)
    if (parts.isEmpty) empty
    else s.read.parquet(parts: _*).select(col("media_id"), col("h"))
  }

  /** Identify ONE clip against the accumulated store — the serving-path
    * form behind `POST /audiomatch` (the audio twin of
    * MinhashStream.probeText): fingerprint the clip with the same
    * landmark kernel, broadcast its print-bounded hash set against the
    * stored postings, count shared landmarks per stored recording, keep
    * matches with ≥ `minShared`, best first. Cost is
    * postings-collision-bounded, never a blob scan. Re-attempts across
    * a concurrent [[compact]] fold on the same fold-stable bracket as
    * the MinHash probe ([[graft.operators.Compaction
    * .stableAcrossFolds]] — FileNotFound AND the silent-subset listing
    * race). Returns (media_id, n_shared). */
  def probeAudio(s: SparkSession, indexDir: String, blob: Array[Byte],
      minShared: Int = MatchMinShared): Seq[(Long, Long)] =
    graft.operators.Compaction.stableAcrossFolds(s, Seq(indexDir))(
      probeAudioOnce(s, indexDir, blob, minShared))

  private def probeAudioOnce(s: SparkSession, indexDir: String,
      blob: Array[Byte], minShared: Int): Seq[(Long, Long)] = {
    import s.implicits._
    // the probe's print is bounded by peaks² within the pairing window
    // (~tens of hashes) — the one driver-side collect here
    val print = Media.audioLandmarkIndex(
      Seq((0L, blob)).toDF("media_id", "blob"))
      .select(col("h")).collect().map(_.getLong(0)).toSeq
    if (print.isEmpty) return Nil
    landmarkIndex(s, indexDir)
      .join(broadcast(print.toDF("h")), Seq("h"))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("n_shared").desc, col("media_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
  }
}
