package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for the training-data pipeline: media
  * payloads ride as opaque `BinaryType` columns with typed metadata
  * alongside, and decode/feature-extract/frame-sample run as batched
  * `mapPartitions` stages — the Scala twin of `mapInPandas` (same batch
  * iterator shape, same "decoder is a black box behind the batch
  * boundary" contract).
  *
  * The decode step is a DETERMINISTIC STUB (this container ships no
  * image/audio codecs): "frames" are fixed 64-byte slices of the blob and
  * "pixels" are raw byte values. Everything around the stub — the binary
  * schema, the batching, the feature shape, partition parallelism — is the
  * real production plumbing; swapping in a JNI/FFmpeg decoder changes only
  * [[Media.decodeFrames]].
  *
  * At 100 TB: blobs never shuffle (all operators here are maps); the only
  * movement is the initial scan, so partition sizing
  * (`spark.sql.files.maxPartitionBytes`) is the sole scale knob.
  */
object Media {

  val FrameBytes = 64
  val SampleStride = 32
  val SampleMax = 8
  val BatchSize = 64

  /** The media table: documents' text re-encoded as an opaque binary blob
    * plus a modality tag — the harness stand-in for real image/audio/video
    * payload columns. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("blob"),
        struct(
          col("source"),
          length(col("text")).as("n_bytes")).as("meta"))

  /** Image table with REAL container bytes: documents wrapped in
    * structurally valid PNG (even ids) / JPEG (odd ids) containers whose
    * encoded dimensions derive from the id — so [[probeDims]] exercises
    * genuine header parsing and the DuckDB oracle can recompute the
    * dimensions arithmetically. Construction is per-row imperative →
    * Dataset map (a production deployment replaces this source with its
    * object-store scan; probe and plumbing stay). */
  def imageTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(128)
        val w = 16 + (id % 317).toInt
        val h = 16 + (id % 211).toInt
        val blob =
          if (id % 2 == 0) ImageProbe.pngBytes(w, h, payload)
          else ImageProbe.jpegBytes(w, h, payload)
        (id, blob)
      })
      .toDF("media_id", "blob")
  }

  /** Probed image header per blob. */
  case class ImageDims(media_id: Long, format: String, width: Int, height: Int)

  /** Batched header probe over (media_id, blob) rows — same mapPartitions
    * batch shape as [[featurize]]; unparseable blobs are dropped (the
    * filter step a curation pipeline applies to corrupt files). */
  def probeDims(images: DataFrame): Dataset[ImageDims] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, blob) =>
            ImageProbe.probe(blob).map(d =>
              ImageDims(id, d.format, d.width, d.height))
          }
        }
      }
  }

  /** Audio table with REAL container bytes — the audio twin of
    * [[imageTable]]: 16-bit PCM WAV whose rate/channels/length derive
    * from the id, so [[probeAudio]] exercises genuine RIFF parsing and
    * the DuckDB oracle recomputes the metadata arithmetically. */
  def audioTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val rate = (id % 3) match {
          case 0 => 8000; case 1 => 16000; case _ => 44100
        }
        val channels = 1 + (id % 2).toInt
        val nSamples = 1000L + id % 5000
        (id, AudioProbe.wavBytes(rate, channels, nSamples))
      })
      .toDF("media_id", "blob")
  }

  /** Probed audio metadata per blob. */
  case class AudioMeta(media_id: Long, format: String, sample_rate: Int,
                       channels: Int, n_samples: Long, duration_ms: Long)

  /** Batched audio probe — same shape as [[probeDims]]. */
  def probeAudio(audio: DataFrame): Dataset[AudioMeta] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, blob) =>
            AudioProbe.probe(blob).map(m =>
              AudioMeta(id, m.format, m.sampleRate, m.channels,
                m.nSamples, m.durationMs))
          }
        }
      }
  }

  /** [[audioTable]] with per-recording CONTENT: the sample ramp is
    * seeded by the id, so two blobs carry the same audio iff they share
    * a seed — the corpus a fingerprinting pass is actually pointed at
    * (the unseeded table's identical streams would fingerprint
    * identically, which is vacuous). */
  def audioSeededTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val rate = (id % 3) match {
          case 0 => 8000; case 1 => 16000; case _ => 44100
        }
        val channels = 1 + (id % 2).toInt
        val nSamples = 1000L + id % 5000
        (id, AudioProbe.wavBytes(rate, channels, nSamples, seed = id))
      })
      .toDF("media_id", "blob")
  }

  /** Landmark framing: PCM prefix length, frame width (values), peak
    * pairing window (frames) — all in integer sample space so the
    * fingerprint is exact on both engines. */
  val LmMaxVals = 1024
  val LmFrame = 64
  val LmMaxDt = 8

  /** Per-recording constellation fingerprint rollup. fp_min/fp_max are
    * None when no peak pair lands inside the pairing window. */
  case class AudioLandmarks(media_id: Long, n_frames: Int, n_peaks: Int,
      n_landmarks: Int, fp_sum: Long, fp_min: Option[Long],
      fp_max: Option[Long])

  /** Shazam-style landmark fingerprinting (Wang 2003, "An
    * Industrial-Strength Audio Search Algorithm", ISMIR — public): hash
    * PAIRS of spectral peaks with their time offset, so the fingerprint
    * survives cropping and local noise. No FFT ships in this container,
    * so the "spectrum" is the frame-energy series over the decoded PCM
    * prefix (integer sums — exact on every engine); peaks are strict
    * local maxima; each peak pairs with every later peak within
    * [[LmMaxDt]] frames and hashes (e₁ mod 997, e₂ mod 997, Δt) into one
    * integer. Swapping a real STFT in changes only the energy row — the
    * peak/pair/hash plumbing is the production shape.
    *
    * Same batched-map contract as [[probeAudio]]: blobs never shuffle,
    * undecodable blobs drop. */
  /** The per-blob landmark kernel: decoded PCM prefix → (n_frames,
    * n_peaks, pair hashes). Shared by the rollup and the match index. */
  private def landmarkHashes(blob: Array[Byte]): Option[(Int, Int, Seq[Long])] =
    AudioProbe.pcm16Prefix(blob, LmMaxVals).map { vals =>
      val nf = vals.length / LmFrame
      val e = Array.tabulate(nf) { f =>
        var s = 0L; var i = f * LmFrame
        while (i < (f + 1) * LmFrame) { s += vals(i); i += 1 }
        s
      }
      val peaks = (1 until math.max(nf - 1, 1))
        .filter(f => e(f) > e(f - 1) && e(f) > e(f + 1))
      // EXACT energies in the hash (e < 2²¹, so e₁·2²⁶ + e₂·2⁴ + Δt
      // fits a long): a quantized hash (e mod 997) collided across
      // different recordings once the corpus carried thousands of them
      val hashes = for {
        i <- peaks.indices
        j <- (i + 1) until peaks.length
        if peaks(j) - peaks(i) <= LmMaxDt
      } yield e(peaks(i)) * 67108864L + e(peaks(j)) * 16L +
        (peaks(j) - peaks(i))
      (nf, peaks.length, hashes)
    }

  def audioLandmarks(audio: DataFrame): Dataset[AudioLandmarks] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, blob) =>
            landmarkHashes(blob).map { case (nf, np, hashes) =>
              AudioLandmarks(id, nf, np, hashes.length,
                hashes.sum, hashes.minOption, hashes.maxOption)
            }
          }
        }
      }
  }

  /** The match-index relation: one (media_id, hash) row per DISTINCT
    * landmark hash — the posting a Shazam-style store keys by. */
  def audioLandmarkIndex(audio: DataFrame): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, blob) =>
            landmarkHashes(blob).toSeq
              .flatMap(_._3.distinct.map(h => (id, h)))
          }
        }
      }
      .toDF("media_id", "h")
  }

  /** A corpus WITH re-uploads: every [[DupGroup]] consecutive ids share
    * the same recording content (seed = id / group) under varying
    * container parameters — the ground truth an audio near-dup join is
    * graded against. */
  val DupGroup = 5
  def audioDupTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val rate = (id % 3) match {
          case 0 => 8000; case 1 => 16000; case _ => 44100
        }
        val channels = 1 + (id % 2).toInt
        val nSamples = 1000L + id % 5000
        (id, AudioProbe.wavBytes(rate, channels, nSamples,
          seed = id / DupGroup))
      })
      .toDF("media_id", "blob")
  }

  /** Video table with REAL container bytes — ISO-BMFF twin of
    * [[audioTable]]: minimal valid MP4s whose mvhd timescale/duration
    * derive from the id. */
  def videoTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val timescale = (id % 3) match {
          case 0 => 600L; case 1 => 1000L; case _ => 90000L
        }
        val duration = (600L + id % 7200) * timescale / 100
        (id, VideoProbe.mp4Bytes(timescale, duration))
      })
      .toDF("media_id", "blob")
  }

  /** Probed video metadata per blob. */
  case class VideoMeta(media_id: Long, format: String, timescale: Long,
                       duration: Long, duration_ms: Long)

  /** Batched video probe — same shape as [[probeDims]]/[[probeAudio]]. */
  def probeVideo(video: DataFrame): Dataset[VideoMeta] = {
    val spark = video.sparkSession
    import spark.implicits._
    video.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, blob) =>
            VideoProbe.probe(blob).map(m =>
              VideoMeta(id, m.format, m.timescale, m.duration, m.durationMs))
          }
        }
      }
  }

  /** STUB DECODER — deterministic fake: a real implementation would hand
    * the blob to an image/audio codec; here frames are fixed-width byte
    * slices so tests and oracles are exact. */
  def decodeFrames(blob: Array[Byte]): Iterator[Array[Byte]] =
    blob.grouped(FrameBytes)

  /** One 60-bit perceptual signature per media item. */
  case class MediaHash(media_id: Long, kind: String, phash: Long)

  /** Perceptual dHash (Krawetz's difference hash — public recipe:
    * downsample, then one bit per horizontal gradient sign) through the
    * batched decode boundary: nearest-neighbor-resize the blob to a
    * [[HashCols]]×[[HashRows]] grid (cell k samples byte ⌊k·L/70⌋), then
    * bit(r,c) = 1 iff cell(r,c) < cell(r,c+1) — 6 comparisons × 10 rows
    * = 60 bits, sized for the 4×15-bit banding kernel every 60-bit
    * signature here shares. Gradient SIGNS are invariant under any
    * strictly monotone brightness/contrast map, which is what lets the
    * hash match a re-encoded copy that byte-level hashing
    * ([[graft.queries.MultimodalQueries]]'s blob simhash) misses.
    * Empty blobs hash to 0. */
  def dhash(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, kind, blob) =>
            val L = blob.length
            var h = 0L
            if (L > 0) {
              val cell = new Array[Int](HashRows * HashCols)
              var k = 0
              while (k < cell.length) {
                cell(k) = blob((k.toLong * L / cell.length).toInt) & 0xff
                k += 1
              }
              var r = 0
              while (r < HashRows) {
                var c = 0
                while (c < HashCols - 1) {
                  if (cell(r * HashCols + c) < cell(r * HashCols + c + 1))
                    h |= 1L << (r * (HashCols - 1) + c)
                  c += 1
                }
                r += 1
              }
            }
            MediaHash(id, kind, h)
          }
        }
      }
  }

  val HashRows = 10
  val HashCols = 7

  /** A deterministic "decode → re-encode" twin of every blob: +32 global
    * brightness plus a per-byte jitter of ((id·31 + j·7) mod 3) − 1 —
    * the harness stand-in for the lossy round-trip (format conversion,
    * quality change) that leaves an image visually identical but
    * byte-distinct. ASCII payloads stay under 255, so the brightness
    * shift never saturates and only the ±1 jitter can flip a gradient
    * sign — the realistic near-but-not-equal dHash neighborhood the
    * pair query thresholds on. Ids shift by `idOffset` so originals and
    * re-encodes coexist in one relation. */
  def reencoded(media: DataFrame, idOffset: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, kind, blob) =>
            val out = new Array[Byte](blob.length)
            var j = 0
            while (j < blob.length) {
              val jitter = ((id * 31 + j.toLong * 7) % 3).toInt - 1
              out(j) = ((blob(j) & 0xff) + 32 + jitter).toByte
              j += 1
            }
            (id + idOffset, kind, out)
          }
        }
      }
      .toDF("media_id", "kind", "blob")
  }

  /** Per-item features computed behind the batch boundary. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      n_frames: Long,
      dark_frac: Double,
      mid_frac: Double,
      sample: String)

  /** One 4×4 thumbnail per media item. */
  case class MediaThumb(media_id: Long, kind: String, thumb: Seq[Int])

  /** RESIZE through the stub decoder: the first frame's 64 bytes as an
    * 8×8 grid, 2×2 average-pooled (floor) to a 4×4 thumbnail — the
    * downsample every image pipeline runs before featurization,
    * expressed on the deterministic fake so tests and the DuckDB oracle
    * are exact. A real deployment swaps [[decodeFrames]] for a codec and
    * this pooling for the library resize; the batched mapPartitions
    * boundary (the mapInPandas batch shape) is the part that carries to
    * 100 TB unchanged. Short blobs zero-pad the frame, matching the
    * decoder contract's fixed frame width. */
  def resize(media: DataFrame): Dataset[MediaThumb] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, kind, blob) =>
            val frame = new Array[Int](FrameBytes)
            var i = 0
            while (i < FrameBytes) {
              frame(i) = if (i < blob.length) blob(i) & 0xff else 0
              i += 1
            }
            val thumb = for (b <- 0 until 16) yield {
              val p = (b / 4) * 16 + (b % 4) * 2
              (frame(p) + frame(p + 1) + frame(p + 8) + frame(p + 9)) / 4
            }
            MediaThumb(id, kind, thumb)
          }
        }
      }
  }

  /** Feature extraction: batched mapPartitions over (id, kind, blob) rows.
    * Batch shape mirrors mapInPandas: the decoder sees `BatchSize` blobs at
    * a time, so a vectorized/codec backend can amortize per-call cost. */
  def featurize(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, kind, blob) =>
            var dark = 0L
            var mid = 0L
            var n = 0L
            decodeFrames(blob).foreach { frame =>
              var i = 0
              while (i < frame.length) {
                val v = frame(i) & 0xff
                if (v < 64) dark += 1 else if (v < 128) mid += 1
                i += 1
              }
              n += frame.length
            }
            val nFrames = (blob.length + FrameBytes - 1) / FrameBytes
            val sampled = new StringBuilder
            var k = 0
            while (k < SampleMax && k * SampleStride < blob.length) {
              sampled.append((blob(k * SampleStride) & 0xff).toChar)
              k += 1
            }
            // half-up rounding to match SQL round() (rint would tie-to-even)
            def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
            val denom = if (n == 0) 1.0 else n.toDouble
            MediaFeatures(id, kind, blob.length.toLong, nFrames.toLong,
              r4(dark / denom), r4(mid / denom), sampled.toString)
          }
        }
      }
  }
}
