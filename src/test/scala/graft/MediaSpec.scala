package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Multimodal plumbing: binary schema, stub decoder determinism, batched
  * featurization (FIXTURES-style fixed inputs, exact expectations). */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  def mediaOf(rows: (Long, String, String)*) =
    rows.toDF("media_id", "kind", "txt")
      .select(col("media_id"), col("kind"), col("txt").cast("binary").as("blob"))

  test("media table carries binary blobs + typed metadata") {
    withTempDir { dir =>
      Seq((0L, "hello world", "en", "src-a", 11L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val m = Media.mediaTable(spark, dir)
      assert(m.schema("blob").dataType == BinaryType)
      assert(m.schema("media_id").dataType == LongType)
      val meta = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(meta("source").dataType == StringType)
      val row = m.head()
      assert(row.getAs[String]("kind") == "image") // doc_id 0 % 3
      assert(new String(row.getAs[Array[Byte]]("blob"), "UTF-8") == "hello world")
    }
  }

  test("stub decoder: fixed 64-byte frames, lossless coverage") {
    val blob = Array.tabulate[Byte](150)(i => (i % 251).toByte)
    val frames = Media.decodeFrames(blob).toSeq
    assert(frames.map(_.length) == Seq(64, 64, 22))
    assert(frames.flatten.toSeq == blob.toSeq)
  }

  test("featurize: byte histogram + frame count + sample, exact values") {
    // 100 bytes: 30 dark (<64), 50 mid (64..127), 20 high
    val txt = "\n".repeat(30) + "A".repeat(50) + "\u00e9".repeat(10)
    // NB U+00E9 is 2 UTF-8 bytes (0xc3 0xa9), both >= 128 -> 20 high bytes
    val feats = Media.featurize(mediaOf((7L, "audio", txt))).collect().head
    assert(feats.n_bytes == 100)
    assert(feats.n_frames == 2)
    assert(feats.dark_frac == 0.3)
    assert(feats.mid_frac == 0.5)
    // samples at byte offsets 0, 32, 64, 96
    assert(feats.sample == "\nAA" + 0xc3.toChar)
  }

  test("featurize is deterministic and batch-size independent") {
    val rows = (0L until 200L).map(i => (i, "video", s"payload-$i-" + "x" * (i % 97).toInt))
    val out1 = Media.featurize(mediaOf(rows: _*)).collect().sortBy(_.media_id)
    val out2 = Media.featurize(mediaOf(rows: _*).repartition(7)).collect().sortBy(_.media_id)
    assert(out1.toSeq == out2.toSeq)
  }

  def withTempDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("media-spec").toFile
    try f(dir.getAbsolutePath)
    finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
