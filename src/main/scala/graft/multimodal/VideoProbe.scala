package graft.multimodal

/** Pure-JVM video container probe — the video member of the
  * [[ImageProbe]]/[[AudioProbe]] family: a real ISO-BMFF (MP4) box walk
  * to the `moov/mvhd` header for timescale and duration. That header is
  * what a corpus-scale curation pass needs (duration filters, frame-rate
  * budgeting before expensive decode); sample decoding stays behind the
  * batch boundary for a codec-backed deployment. Defensive: malformed,
  * truncated, or hostile size fields → None, never an exception and
  * never an over-read.
  */
object VideoProbe {

  /** Probed container metadata; durationMs = floor(duration · 1000 /
    * timescale) in mvhd units. */
  case class Meta(format: String, timescale: Long, duration: Long,
                  durationMs: Long)

  private def u8(b: Array[Byte], i: Int): Long = b(i) & 0xffL
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(k => b(i + k) == t(k).toByte)

  /** Walk the boxes in [from, to); return the payload offset+size of the
    * first box with the given fourcc. Size field 0 ("to end") and 1
    * (64-bit largesize) are treated as malformed here — the synthetic
    * corpus never emits them and accepting them needs 64-bit bounds
    * care a header probe doesn't require. */
  private def findBox(b: Array[Byte], from: Int, to: Int,
                      fourcc: String): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= to) {
      val size = be32(b, i)
      if (size < 8 || i + size > to) return None
      if (tag(b, i + 4, fourcc)) return Some((i + 8, (size - 8).toInt))
      i += size.toInt
    }
    None
  }

  def probe(b: Array[Byte]): Option[Meta] = {
    if (b.length < 16 || !tag(b, 4, "ftyp")) return None
    for {
      (moovOff, moovLen) <- findBox(b, 0, b.length, "moov")
      (mvhdOff, mvhdLen) <- findBox(b, moovOff, moovOff + moovLen, "mvhd")
      if mvhdLen >= 24 && b(mvhdOff) == 0 // version 0: 32-bit fields
      timescale = be32(b, mvhdOff + 12)
      duration = be32(b, mvhdOff + 16)
      if timescale > 0
    } yield Meta("mp4", timescale, duration, duration * 1000L / timescale)
  }

  /** Synthesize a structurally valid minimal MP4: ftyp + moov(mvhd v0)
    * — the test/bench stand-in, same role as pngBytes/wavBytes. */
  def mp4Bytes(timescale: Long, duration: Long): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(16 + 8 + 8 + 100)
    buf.putInt(16); buf.put("ftyp".getBytes)
    buf.put("isom".getBytes); buf.putInt(0x200)
    val mvhdSize = 8 + 100
    buf.putInt(8 + mvhdSize); buf.put("moov".getBytes)
    buf.putInt(mvhdSize); buf.put("mvhd".getBytes)
    buf.putInt(0)                      // version 0 + flags
    buf.putInt(0); buf.putInt(0)       // creation / modification time
    buf.putInt(timescale.toInt)
    buf.putInt(duration.toInt)
    // rate, volume+reserved, then reserved(8) + matrix(36) +
    // predefined(24) + next-track-id(4) = 18 zero ints → 100-byte payload
    buf.putInt(0x00010000); buf.putInt(0x01000000)
    (0 until 18).foreach(_ => buf.putInt(0))
    buf.array()
  }
}
