package graft

import graft.multimodal.{AudioProbe, Media}
import org.apache.spark.sql.functions._

/** Constellation fingerprinting (mm_audio_landmarks): PCM decode parity
  * against the synthesis arithmetic, fingerprint identity/difference by
  * content, and the defensive-decode contract.
  */
class AudioLandmarksSpec extends SparkSpec {

  test("pcm16Prefix decodes exactly the synthesized sample stream") {
    val b = AudioProbe.wavBytes(8000, 2, 700, seed = 42L)
    val got = AudioProbe.pcm16Prefix(b, 1024).get
    assert(got.length == 1024, "2 channels x 700 samples caps at maxVals")
    got.zipWithIndex.foreach { case (v, i) =>
      assert(v == ((i.toLong * 257 + 11 + 42L * 31) % 32768).toInt, s"val $i")
    }
    val mono = AudioProbe.pcm16Prefix(AudioProbe.wavBytes(8000, 1, 700), 1024).get
    assert(mono.length == 700, "short mono stream decodes in full")
  }

  test("undecodable blobs drop; non-16-bit PCM refuses") {
    assert(AudioProbe.pcm16Prefix("not a wav".getBytes, 16).isEmpty)
    assert(AudioProbe.pcm16Prefix(
      AudioProbe.wavBytes(8000, 1, 100).take(30), 16).isEmpty,
      "truncated header")
    // flip the fmt bit depth to 8: the 16-bit decoder must refuse
    val b = AudioProbe.wavBytes(8000, 1, 100)
    b(34) = 8 // fmt bits-per-sample LE16 low byte
    assert(AudioProbe.pcm16Prefix(b, 16).isEmpty)
  }

  test("fingerprints identify content: same seed matches, different differs") {
    import spark.implicits._
    val rows = Seq(
      (1L, AudioProbe.wavBytes(8000, 1, 2000, seed = 7L)),
      (2L, AudioProbe.wavBytes(44100, 2, 3000, seed = 7L)), // same content, other container params
      (3L, AudioProbe.wavBytes(8000, 1, 2000, seed = 8L)),
      (4L, "garbage".getBytes)) // dropped
    val got = Media.audioLandmarks(rows.toDF("media_id", "blob")).collect()
      .map(l => l.media_id -> ((l.n_peaks, l.n_landmarks, l.fp_sum,
        l.fp_min, l.fp_max))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "undecodable blob dropped")
    assert(got(1L) == got(2L),
      "same sample content fingerprints identically regardless of container")
    assert(got(1L) != got(3L), "different content fingerprints apart")
    assert(got(1L)._2 > 0, "landmarks actually fire")
  }
}
