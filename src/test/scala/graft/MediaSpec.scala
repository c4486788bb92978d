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

  test("resize: 2x2 average pool of the first frame, zero-padded, hand-checked") {
    // 64 bytes = 8x8 grid of increasing values: cell (r, c) = r*8 + c +
    // 32 (printable); the 2x2 floor-mean at block (br, bc) is
    // (4*(2*br*8 + 2*bc) + 0+1+8+9)/4 = 16*br + 2*bc + 4 + 32
    val full = (0 until 64).map(i => (i + 32).toChar).mkString
    val short = full.take(10) // pads with 0 beyond byte 10
    val m = mediaOf((0L, "image", full), (1L, "audio", short))
    val got = Media.resize(m).collect().map(t => t.media_id -> t.thumb).toMap
    val wantFull = for (b <- 0 until 16)
      yield 16 * (b / 4) + 2 * (b % 4) + 4 + 32
    assert(got(0L) == wantFull, s"full-frame thumb ${got(0L)}")
    // short blob: only bytes 0..9 present — block (0,0) averages
    // (32+33+40+41)/4 = 36.5 -> 36; blocks past the padded data are 0
    assert(got(1L).head == 36 && got(1L).last == 0, s"padded thumb ${got(1L)}")
    assert(got(1L).length == 16)
  }

  test("blob near-dup: one-byte edits pair up, disjoint payloads never do") {
    withTempDir { dir =>
      val base = ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 4).trim
      Seq(
        (0L, base),                       // original
        (1L, base.dropRight(1) + "x"),    // one-byte edit → near-dup of 0
        (2L, base.take(210)),             // truncated copy → near-dup of 0
        (3L, "zq" * 120))                 // disjoint byte content
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
        .withColumn("n_chars", length(col("text")))
        .write.parquet(s"$dir/documents.parquet")
      val pairs = graft.queries.MultimodalQueries.qBlobNeardup(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((0L, 1L)), s"one-byte edit must pair: $pairs")
      assert(pairs.contains((0L, 2L)), s"truncation must pair: $pairs")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
        s"disjoint blob must stay unpaired: $pairs")
      // clusters: {0,1,2} collapse to keep_id 0; singleton 3 never appears
      val clusters = graft.queries.MultimodalQueries.qBlobClusters(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(clusters.toSeq == Seq((0L, 3L, 2L)),
        s"edit+truncation family must form one cluster: ${clusters.toSeq}")
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

  test("image probe: PNG/JPEG round-trip through real container bytes") {
    import graft.multimodal.ImageProbe
    val payload = "some pixel-ish payload ÿ bytes".getBytes("ISO-8859-1")
    val png = ImageProbe.probe(ImageProbe.pngBytes(640, 480, payload))
    assert(png.contains(ImageProbe.Dims("png", 640, 480)))
    val jpg = ImageProbe.probe(ImageProbe.jpegBytes(1920, 1080, payload))
    assert(jpg.contains(ImageProbe.Dims("jpeg", 1920, 1080)))
  }

  test("image probe: GIF header and malformed/truncated inputs") {
    import graft.multimodal.ImageProbe
    // GIF89a, 320x200 little-endian
    val gif = Array[Byte]('G', 'I', 'F', '8', '9', 'a',
      0x40, 0x01, 0xc8.toByte, 0x00, 0x00, 0x00)
    assert(ImageProbe.probe(gif).contains(ImageProbe.Dims("gif", 320, 200)))
    assert(ImageProbe.probe(Array.emptyByteArray).isEmpty)
    assert(ImageProbe.probe("not an image at all".getBytes("UTF-8")).isEmpty)
    // PNG signature but truncated before IHDR dims
    assert(ImageProbe.probe(ImageProbe.pngBytes(10, 10, Array.emptyByteArray)
      .take(18)).isEmpty)
    // JPEG SOI but EOI before any SOF
    assert(ImageProbe.probe(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    // JPEG with a non-FF byte where a marker must be
    assert(ImageProbe.probe(Array(0xff, 0xd8, 0x00, 0x00, 0x00).map(_.toByte)).isEmpty)
  }

  test("property: probe round-trips seeded random dims/payloads; never throws on garbage") {
    import graft.multimodal.ImageProbe
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val payload = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt(256).toByte)
      // PNG dims up to Int.MaxValue-ish; JPEG dims are u16
      val (wp, hp) = (1 + rnd.nextInt(1 << 20), 1 + rnd.nextInt(1 << 20))
      assert(ImageProbe.probe(ImageProbe.pngBytes(wp, hp, payload))
        .contains(ImageProbe.Dims("png", wp, hp)))
      val (wj, hj) = (1 + rnd.nextInt(65535), 1 + rnd.nextInt(65535))
      assert(ImageProbe.probe(ImageProbe.jpegBytes(wj, hj, payload))
        .contains(ImageProbe.Dims("jpeg", wj, hj)),
        s"jpeg $wj x $hj payload ${payload.length}")
    }
    // arbitrary garbage (including signature-prefixed garbage) never throws
    for (_ <- 0 until 500) {
      val junk = Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt(256).toByte)
      ImageProbe.probe(junk)
      ImageProbe.probe(Array[Byte](0xff.toByte, 0xd8.toByte) ++ junk)
      ImageProbe.probe(
        Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++ junk)
      // truncations of valid containers parse or reject, never throw
      val png = ImageProbe.pngBytes(640, 480, junk)
      ImageProbe.probe(png.take(rnd.nextInt(png.length + 1)))
      val jpg = ImageProbe.jpegBytes(640, 480, junk)
      ImageProbe.probe(jpg.take(rnd.nextInt(jpg.length + 1)))
    }
  }

  test("probeDims: batched probe over the synthesized image table") {
    withTempDir { dir =>
      (0L until 20L).map(i => (i, s"doc body $i " + "z" * 200, "en", "src", 10L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val dims = Media.probeDims(Media.imageTable(spark, dir))
        .collect().sortBy(_.media_id)
      assert(dims.length == 20, "no blob may fail the probe")
      dims.foreach { d =>
        assert(d.format == (if (d.media_id % 2 == 0) "png" else "jpeg"))
        assert(d.width == 16 + (d.media_id % 317).toInt)
        assert(d.height == 16 + (d.media_id % 211).toInt)
      }
    }
  }

  test("audio probe: WAV round-trip, word-aligned chunk walk, garbage safety") {
    import graft.multimodal.AudioProbe
    // round-trip across rates/channels/lengths
    for (rate <- Seq(8000, 16000, 44100); ch <- Seq(1, 2); n <- Seq(1L, 999L, 4321L)) {
      val m = AudioProbe.probe(AudioProbe.wavBytes(rate, ch, n))
      assert(m.nonEmpty, s"($rate,$ch,$n)")
      assert(m.get == AudioProbe.Meta("wav", rate, ch, n, n * 1000L / rate))
    }
    // an extra chunk with an ODD size before fmt/data must be skipped
    // with its pad byte (word alignment)
    val base = AudioProbe.wavBytes(8000, 1, 10)
    val fmtData = base.slice(12, base.length)
    val listChunk = "LIST".getBytes ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0)
    val riffSize = 4 + listChunk.length + fmtData.length
    val rebuilt = "RIFF".getBytes ++
      Array[Byte]((riffSize & 0xff).toByte, ((riffSize >> 8) & 0xff).toByte,
        ((riffSize >> 16) & 0xff).toByte, ((riffSize >> 24) & 0xff).toByte) ++
      "WAVE".getBytes ++ listChunk ++ fmtData
    assert(AudioProbe.probe(rebuilt).contains(
      AudioProbe.Meta("wav", 8000, 1, 10, 1)))
    // garbage: truncations, sign-flips, random bytes — None, no throw
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      AudioProbe.probe(junk) // must not throw
    }
    assert(AudioProbe.probe(base.take(30)).isEmpty, "truncated header")
    assert(AudioProbe.probe("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("probeAudio: batched probe over the synthesized audio table") {
    withTempDir { dir =>
      import spark.implicits._
      (0L until 20L).map(i => (i, s"doc $i", "en", "src", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val metas = Media.probeAudio(Media.audioTable(spark, dir))
        .collect().sortBy(_.media_id)
      assert(metas.length == 20)
      metas.foreach { m =>
        val rate = (m.media_id % 3) match {
          case 0 => 8000; case 1 => 16000; case _ => 44100
        }
        assert(m.sample_rate == rate)
        assert(m.channels == 1 + (m.media_id % 2).toInt)
        assert(m.n_samples == 1000L + m.media_id % 5000)
        assert(m.duration_ms == m.n_samples * 1000L / rate)
      }
    }
  }

  test("video probe: MP4 box walk round-trip, hostile sizes, garbage safety") {
    import graft.multimodal.VideoProbe
    for (ts <- Seq(600L, 1000L, 90000L); dur <- Seq(0L, 1L, 7019100L)) {
      val m = VideoProbe.probe(VideoProbe.mp4Bytes(ts, dur))
      assert(m.contains(VideoProbe.Meta("mp4", ts, dur, dur * 1000L / ts)),
        s"($ts,$dur) -> $m")
    }
    // a hostile box size that would walk past the buffer must fail clean
    val bad = VideoProbe.mp4Bytes(600, 600)
    bad(16) = 0x7f.toByte // moov size := huge
    assert(VideoProbe.probe(bad).isEmpty, "oversized box must not over-read")
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      VideoProbe.probe(Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte))
    }
    assert(VideoProbe.probe("....ftyp".getBytes).isEmpty, "truncated header")
  }

  test("video probe: largesize (size==1), to-EOF (size==0), mvhd v1") {
    import graft.multimodal.VideoProbe
    // 64-bit largesize moov + v1 mvhd (64-bit duration), plain trailing box
    for (ts <- Seq(600L, 90000L); dur <- Seq(0L, 7019100L, 1L << 33)) {
      val m = VideoProbe.probe(VideoProbe.mp4BytesWide(ts, dur))
      assert(m.contains(VideoProbe.Meta("mp4", ts, dur, dur * 1000L / ts)),
        s"wide ($ts,$dur) -> $m")
    }
    // trailing free box written with size==0 (extends to EOF)
    val eof = VideoProbe.probe(VideoProbe.mp4BytesWide(1000, 42, toEof = true))
    assert(eof.contains(VideoProbe.Meta("mp4", 1000, 42, 42L)), s"to-eof -> $eof")

    // hostile largesize near 2^63: must fail clean, no index wrap
    val wrap = VideoProbe.mp4BytesWide(600, 600)
    val bb = java.nio.ByteBuffer.wrap(wrap)
    bb.putLong(24, 0x7fffffffffffff00L) // moov largesize := huge positive
    assert(VideoProbe.probe(wrap).isEmpty, "largesize overflow must not wrap")
    bb.putLong(24, -8L) // negative 64-bit size
    assert(VideoProbe.probe(wrap).isEmpty, "negative largesize must fail")
    bb.putLong(24, 15L) // smaller than its own 16-byte header
    assert(VideoProbe.probe(wrap).isEmpty, "largesize < header must fail")

    // truncated largesize header: size==1 with fewer than 16 bytes left
    val trunc = VideoProbe.mp4Bytes(600, 600).take(16) ++
      Array[Byte](0, 0, 0, 1) ++ "moov".getBytes ++ Array[Byte](0, 0, 0)
    assert(VideoProbe.probe(trunc).isEmpty, "truncated largesize header")

    // hostile v1 duration that would overflow duration*1000
    val hostile = VideoProbe.mp4BytesWide(600, Long.MaxValue / 500)
    assert(VideoProbe.probe(hostile).isEmpty, "v1 duration*1000 overflow guard")
  }

  def withTempDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("media-spec").toFile
    try f(dir.getAbsolutePath)
    finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
