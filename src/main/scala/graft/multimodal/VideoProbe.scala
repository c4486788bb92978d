package graft.multimodal

/** Pure-JVM video container probe — the video member of the
  * [[ImageProbe]]/[[AudioProbe]] family: a real ISO-BMFF (MP4) box walk
  * to the `moov/mvhd` header for timescale and duration. That header is
  * what a corpus-scale curation pass needs (duration filters, frame-rate
  * budgeting before expensive decode); sample decoding stays behind the
  * batch boundary for a codec-backed deployment. Defensive: malformed,
  * truncated, or hostile size fields → None, never an exception and
  * never an over-read.
  *
  * Full box-size coverage (VERDICT r4 item 6): the compact 32-bit size,
  * `size == 1` (64-bit largesize in bytes 8..16 — how real muxers write
  * >4 GiB `mdat` boxes), and `size == 0` (box extends to end of the
  * enclosing scope — legal only for a file's last top-level box but
  * accepted anywhere here, like lenient demuxers). All arithmetic is
  * 64-bit with explicit remaining-bytes bounds, so a hostile largesize
  * near 2^63 cannot wrap an index.
  */
object VideoProbe {

  /** Probed container metadata; durationMs = floor(duration · 1000 /
    * timescale) in mvhd units. */
  case class Meta(format: String, timescale: Long, duration: Long,
                  durationMs: Long)

  private def u8(b: Array[Byte], i: Int): Long = b(i) & 0xffL
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(k => b(i + k) == t(k).toByte)

  /** Walk the boxes in [from, to); return the payload offset+size of the
    * first box with the given fourcc. Size dispatch per ISO/IEC 14496-12
    * §4.2: compact 32-bit, 1 → 64-bit largesize, 0 → to end of scope.
    * Bounds are checked against the REMAINING bytes (`to - i`, a small
    * non-negative number) rather than `i + size`, so a hostile 64-bit
    * size cannot overflow the comparison. */
  private def findBox(b: Array[Byte], from: Int, to: Int,
                      fourcc: String): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= to) {
      val size32 = be32(b, i)
      val (hdr, size): (Long, Long) =
        if (size32 == 1) {
          if (i + 16 > to) return None // truncated largesize header
          (16L, be64(b, i + 8))
        } else if (size32 == 0) (8L, (to - i).toLong)
        else (8L, size32)
      if (size < hdr || size > to - i) return None
      if (tag(b, i + 4, fourcc)) return Some((i + hdr.toInt, (size - hdr).toInt))
      i += size.toInt // size ≤ to - i ≤ Int.MaxValue: exact
    }
    None
  }

  def probe(b: Array[Byte]): Option[Meta] = {
    if (b.length < 16 || !tag(b, 4, "ftyp")) return None
    for {
      (moovOff, moovLen) <- findBox(b, 0, b.length, "moov")
      (mvhdOff, mvhdLen) <- findBox(b, moovOff, moovOff + moovLen, "mvhd")
      meta <- parseMvhd(b, mvhdOff, mvhdLen)
    } yield meta
  }

  /** mvhd version 0 (32-bit times) and version 1 (64-bit creation/
    * modification/duration — what muxers emit past year-2040 timestamps
    * or >2^32-tick durations). The duration·1000 scaling is guarded so a
    * hostile v1 duration near 2^63 cannot overflow into a negative
    * durationMs. */
  private def parseMvhd(b: Array[Byte], off: Int, len: Int): Option[Meta] =
    u8(b, off) match {
      case 0 if len >= 24 =>
        val timescale = be32(b, off + 12)
        val duration = be32(b, off + 16)
        if (timescale > 0) Some(Meta("mp4", timescale, duration,
          duration * 1000L / timescale))
        else None
      case 1 if len >= 32 =>
        val timescale = be32(b, off + 20)
        val duration = be64(b, off + 24)
        if (timescale > 0 && duration >= 0 && duration <= Long.MaxValue / 1000)
          Some(Meta("mp4", timescale, duration, duration * 1000L / timescale))
        else None
      case _ => None
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

  /** [[mp4Bytes]] variant exercising the non-compact size paths: the moov
    * box uses a 64-bit largesize header and, when `toEof`, the trailing
    * free box uses size==0. mvhd is version 1 (64-bit duration). */
  def mp4BytesWide(timescale: Long, duration: Long,
                   toEof: Boolean = false): Array[Byte] = {
    val mvhdPayload = 4 + 8 + 8 + 4 + 8 + 80 // v1 header fields + rest
    val mvhdSize = 8 + mvhdPayload
    val moovSize = 16 + mvhdSize // largesize header
    val tail = 8 + 4             // trailing free box
    val buf = java.nio.ByteBuffer.allocate(16 + moovSize + tail)
    buf.putInt(16); buf.put("ftyp".getBytes)
    buf.put("isom".getBytes); buf.putInt(0x200)
    buf.putInt(1); buf.put("moov".getBytes) // size==1 → largesize follows
    buf.putLong(moovSize.toLong)
    buf.putInt(mvhdSize); buf.put("mvhd".getBytes)
    buf.putInt(0x01000000)             // version 1 + flags
    buf.putLong(0L); buf.putLong(0L)   // creation / modification (64-bit)
    buf.putInt(timescale.toInt)
    buf.putLong(duration)
    (0 until 20).foreach(_ => buf.putInt(0)) // rate..next-track-id
    if (toEof) { buf.putInt(0); buf.put("free".getBytes); buf.putInt(0) }
    else { buf.putInt(tail); buf.put("free".getBytes); buf.putInt(0) }
    buf.array()
  }
}
