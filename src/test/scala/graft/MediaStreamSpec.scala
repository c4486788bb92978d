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
