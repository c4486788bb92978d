package graft

import graft.multimodal.{AudioProbe, Media}
import org.apache.spark.sql.functions._

/** Constellation fingerprinting (mm_audio_landmarks): PCM decode parity
  * against the synthesis arithmetic, fingerprint identity/difference by
  * content, and the defensive-decode contract.
  */
class AudioLandmarksSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pcm16Prefix decodes exactly the synthesized sample stream") {
    val b = AudioProbe.wavBytes(8000, 2, 700, seed = 42L)
    val got = AudioProbe.pcm16Prefix(b, 1024).get
    assert(got.length == 1024, "2 channels x 700 samples caps at maxVals")
    got.zipWithIndex.foreach { case (v, i) =>
      assert(v == ((i.toLong * (257 + 2 * (42L % 25)) + 11 + 42L * 31 +
        ((i >> 6).toLong * (42L % 1021)) % 1021) % 32768).toInt, s"val $i")
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

  test("matching recovers exactly the re-upload groups on sf0.001") {
    val ids = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val wantPairs = ids.groupBy(_ / Media.DupGroup).values.flatMap { g =>
      for (a <- g; b <- g if a < b) yield (a, b)
    }.toSet
    val got = graft.queries.MultimodalQueries.qAudioMatches(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == wantPairs,
      s"only-got=${got -- wantPairs} missed=${wantPairs -- got}")
  }

  test("a cropped recording's landmarks are a matching subset of the full one") {
    import spark.implicits._
    val rows = Seq(
      (1L, AudioProbe.wavBytes(8000, 1, 2000, seed = 7L)),
      (2L, AudioProbe.wavBytes(8000, 1, 800, seed = 7L))) // prefix crop
    val idx = Media.audioLandmarkIndex(rows.toDF("media_id", "blob"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val full = idx.filter(_._1 == 1L).map(_._2).toSet
    val crop = idx.filter(_._1 == 2L).map(_._2).toSet
    assert(crop.nonEmpty && crop.subsetOf(full),
      "peak-pair hashes survive cropping — the reason landmarks beat whole-file hashes")
    assert(crop.size >= 5, s"enough shared landmarks to match: ${crop.size}")
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
