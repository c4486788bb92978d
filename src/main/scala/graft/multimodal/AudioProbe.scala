package graft.multimodal

/** Pure-JVM audio container probe — the audio twin of [[ImageProbe]]:
  * real RIFF/WAVE header parsing (fmt chunk for sample rate / channels /
  * bit depth, data chunk for sample count) with no native codec. This is
  * the part of audio decoding a curation pipeline runs at corpus scale:
  * duration/sample-rate filters, channel inventories, corrupt-container
  * triage. PCM sample decoding stays behind the same batch boundary for
  * a codec-backed deployment. Defensive like ImageProbe: malformed or
  * truncated bytes → None, never an exception.
  */
object AudioProbe {

  /** Probed container metadata. `durationMs` derives from the data chunk
    * length: floor(nSamples · 1000 / sampleRate). */
  case class Meta(format: String, sampleRate: Int, channels: Int,
                  nSamples: Long, durationMs: Long)

  private def u8(b: Byte): Int = b & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b(i)) | (u8(b(i + 1)) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b(i)).toLong | (u8(b(i + 1)).toLong << 8) |
      (u8(b(i + 2)).toLong << 16) | (u8(b(i + 3)).toLong << 24)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
      b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

  /** RIFF/WAVE walk: "RIFF" <size> "WAVE", then chunks of
    * (<fourcc> <le32 size> <payload, word-aligned>). Requires a PCM or
    * IEEE-float fmt chunk before data; sample count = dataBytes /
    * (channels × bytesPerSample). */
  def probe(b: Array[Byte]): Option[Meta] = {
    if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12
    var rate = 0
    var channels = 0
    var bits = 0
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue) return None
      val payload = i + 8
      if (tag(b, i, "fmt ")) {
        if (size < 16 || payload + 16 > b.length) return None
        val codec = le16(b, payload)
        if (codec != 1 && codec != 3) return None // PCM / IEEE float only
        channels = le16(b, payload + 2)
        rate = le32(b, payload + 4).toInt
        bits = le16(b, payload + 14)
        if (channels <= 0 || rate <= 0 || bits <= 0 || bits % 8 != 0) return None
      } else if (tag(b, i, "data")) {
        if (rate == 0) return None // fmt must precede data
        val bytesPerFrame = channels.toLong * (bits / 8)
        val nSamples = size / bytesPerFrame
        return Some(Meta("wav", rate, channels, nSamples,
          nSamples * 1000L / rate))
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i = payload + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Synthesize a structurally valid 16-bit PCM WAV container with
    * deterministic sample bytes — the test/bench stand-in for real
    * recordings (same role as ImageProbe.pngBytes). `seed` varies the
    * ramp STEP, its offset, and a per-frame PHASE term so different
    * "recordings" carry different content (seed 0 keeps the historical
    * byte stream); the oracle reconstructs the same values
    * arithmetically. Each knob closes a discovered self-similarity: a
    * pure offset shift aliases in frame-energy space (Δseed = 512
    * realigns the wrap pattern — 3.3M cross-content landmark collisions
    * at sf1's 10k seeds); with a seed-dependent step, offsets of
    * 64·step are TIME-SHIFTED copies of the same periodic ramp, which a
    * shift-invariant fingerprint correctly matches; the (i≫6)-keyed
    * phase term (prime modulus 1021) makes frame sequences non-periodic
    * per content, pushing the first shift-equivalent seed pair past
    * lcm(25, 1021) = 25 525 — beyond the sf1 seed range. */
  def wavBytes(sampleRate: Int, channels: Int, nSamples: Long,
      seed: Long = 0L): Array[Byte] = {
    val dataBytes = (nSamples * channels * 2).toInt
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataBytes); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(channels.toShort)
    buf.putInt(sampleRate); buf.putInt(sampleRate * channels * 2)
    buf.putShort((channels * 2).toShort); buf.putShort(16)
    buf.put("data".getBytes); buf.putInt(dataBytes)
    val step = 257 + 2 * (seed % 25)
    val phase = seed % 1021
    var i = 0
    while (i < dataBytes / 2) { // deterministic triangle-ish samples
      buf.putShort(((i.toLong * step + 11 + seed * 31 +
        ((i >> 6).toLong * phase) % 1021) % 32768).toShort)
      i += 1
    }
    buf.array()
  }

  /** Decode the first `maxVals` 16-bit PCM values of the data chunk
    * (channel-agnostic: the interleaved stream in container order) —
    * the slice of real decoding a fingerprinting pass needs. Same
    * defensive contract as [[probe]]: malformed bytes → None. Requires
    * a 16-bit PCM fmt chunk before data. */
  def pcm16Prefix(b: Array[Byte], maxVals: Int): Option[Array[Int]] = {
    if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12
    var sawPcm16 = false
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue) return None
      val payload = i + 8
      if (tag(b, i, "fmt ")) {
        if (size < 16 || payload + 16 > b.length) return None
        if (le16(b, payload) != 1 || le16(b, payload + 14) != 16) return None
        sawPcm16 = true
      } else if (tag(b, i, "data")) {
        if (!sawPcm16) return None
        val avail = math.min(size, (b.length - payload).toLong) / 2
        val n = math.min(maxVals.toLong, avail).toInt
        return Some(Array.tabulate(n) { k =>
          val v = le16(b, payload + 2 * k)
          if (v >= 32768) v - 65536 else v
        })
      }
      i = payload + size.toInt + (size.toInt & 1)
    }
    None
  }
}
