package graft

import graft.multimodal.{AudioProbe, ImageProbe, VideoProbe}
import graft.streaming.MediaStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming media-metadata ledger (MediaStream): magic-byte modality
  * dispatch over real container bytes, stream ≡ batch probe parity
  * across micro-batches, corrupt-blob accounting, replay idempotence
  * and ledger compaction. */
class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def blobs: Seq[(Long, Array[Byte])] = Seq(
    1L -> ImageProbe.pngBytes(320, 200, "png payload".getBytes),
    2L -> ImageProbe.jpegBytes(64, 48, "jpeg payload".getBytes),
    3L -> AudioProbe.wavBytes(44100, 2, 44100L * 3),
    4L -> VideoProbe.mp4Bytes(1000L, 12345L),
    5L -> "not a media container at all".getBytes,
    6L -> ImageProbe.pngBytes(17, 19, Array.emptyByteArray))

  test("stream ledger equals the batch probe; corrupt blobs are counted") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("media-stream").toString
    val input = MemoryStream[(Long, Array[Byte])]
    val frame = input.toDF().toDF("media_id", "blob")
    val q = MediaStream.start(spark, frame, s"$dir/ledger", s"$dir/ckpt")
    try {
      input.addData(blobs.take(3): _*)
      q.processAllAvailable()
      input.addData(blobs.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6)), Option(r.get(7)))).toSet
    val stream = rows(MediaStream.metadata(spark, s"$dir/ledger")
      .select("media_id", "kind", "format", "width", "height",
        "sample_rate", "channels", "duration_ms"))
    val batch = rows(MediaStream.probeBatch(blobs.toDF("media_id", "blob")).toDF()
      .select("media_id", "kind", "format", "width", "height",
        "sample_rate", "channels", "duration_ms"))
    assert(stream == batch, s"stream $stream != batch $batch")
    // spot-check the dispatch: one of each modality plus the reject
    val kinds = stream.groupBy(_._2).view.mapValues(_.size).toMap
    assert(kinds == Map("image" -> 3, "audio" -> 1, "video" -> 1, "corrupt" -> 1))
    val png = stream.find(_._1 == 1L).get
    assert(png._3 == "png" && png._4.contains(320) && png._5.contains(200))
    val wav = stream.find(_._1 == 3L).get
    assert(wav._6.contains(44100) && wav._7.contains(2) && wav._8.contains(3000L))
  }

  test("landmark store: streamed postings identify a cropped clip; garbage misses") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("media-lm").toString
    val input = MemoryStream[(Long, Array[Byte])]
    val q = MediaStream.startLandmarks(spark,
      input.toDF().toDF("media_id", "blob"), s"$dir/idx", s"$dir/ckpt")
    try {
      // two recordings in batch 1, one more (plus a non-audio blob the
      // index must skip) in batch 2
      input.addData(
        10L -> AudioProbe.wavBytes(8000, 1, 2000, seed = 70L),
        11L -> AudioProbe.wavBytes(16000, 2, 1500, seed = 71L))
      q.processAllAvailable()
      input.addData(
        12L -> AudioProbe.wavBytes(44100, 1, 3000, seed = 72L),
        13L -> ImageProbe.pngBytes(8, 8, "x".getBytes))
      q.processAllAvailable()
    } finally q.stop()
    // a cropped re-encode of recording 11 (same content, other container)
    val clip = AudioProbe.wavBytes(8000, 1, 900, seed = 71L)
    val hits = MediaStream.probeAudio(spark, s"$dir/idx", clip)
    assert(hits.map(_._1) == Seq(11L), s"clip identifies its source: $hits")
    assert(hits.head._2 >= MediaStream.MatchMinShared.toLong)
    assert(MediaStream.probeAudio(spark, s"$dir/idx", "junk".getBytes).isEmpty)
    // the non-audio blob contributed no postings
    assert(MediaStream.landmarkIndex(spark, s"$dir/idx")
      .filter(org.apache.spark.sql.functions.col("media_id") === 13L).count() == 0)
    // serving before the first commit: empty store, empty hits
    assert(MediaStream.probeAudio(spark,
      java.nio.file.Files.createTempDirectory("media-lm-empty").toString,
      clip).isEmpty)
  }

  test("replayed batch is byte-identical; ledger folds through compaction") {
    val dir = java.nio.file.Files.createTempDirectory("media-replay").toString
    MediaStream.writeDelta(blobs.take(3).toDF("media_id", "blob"), s"$dir/l", 0L)
    MediaStream.writeDelta(blobs.drop(3).toDF("media_id", "blob"), s"$dir/l", 1L)
    val first = MediaStream.metadata(spark, s"$dir/l").collect()
      .map(_.toSeq).toSet
    MediaStream.writeDelta(blobs.drop(3).toDF("media_id", "blob"), s"$dir/l", 1L)
    assert(MediaStream.metadata(spark, s"$dir/l").collect()
      .map(_.toSeq).toSet == first, "replay changed the ledger")
    assert(MediaStream.compact(spark, s"$dir/l", upTo = 2L))
    assert(MediaStream.metadata(spark, s"$dir/l").collect()
      .map(_.toSeq).toSet == first, "compaction changed the ledger")
  }
}
