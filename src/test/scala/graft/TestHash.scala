package graft

/** Shared driver-side replica helpers for specs that re-derive the
  * engines' md5 arithmetic, deterministic filler corpora, and
  * HALF_UP-rounded comparisons — one definition so a hashing or
  * rounding change is fixed in one place, not per spec file. */
object TestHash {

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The engines' portable uniform-hash idiom:
    * conv(substr(md5(x), 1, n), 16, 10). */
  def md5Prefix(s: String, hexDigits: Int): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, hexDigits), 16)

  /** The A/B arm assignment shared by the experimentation queries. */
  def variantOf(userId: Long): String =
    if (md5Prefix(userId.toString, 4) % 2 == 0) "A" else "B"

  /** Deterministic non-repetitive lowercase filler. */
  def filler(seed: Long, n: Int): String = {
    val rnd = new java.util.Random(seed)
    val sb = new StringBuilder
    while (sb.length < n) sb.append(('a' + rnd.nextInt(26)).toChar)
    sb.toString
  }

  def roundHalfUp(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
}
