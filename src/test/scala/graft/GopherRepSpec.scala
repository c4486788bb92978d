package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Gopher repetition filters (td_gopher_rep): a full driver-side
  * recomputation of the injected-repetition harness + all four metrics
  * over the real sf0.001 corpus (every doc). The DuckDB oracle is the
  * cross-engine gate; this spec is the independent third implementation
  * of the same arithmetic (injection, pseudo-lines, duplicate-line
  * accounting, tie-broken top 2-gram, 5-gram coverage union).
  */
class GopherRepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  private def h8(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's construction, in plain Scala. */
  private def ref(docId: Long, text: String)
      : (Long, Double, Double, Double, Double, Boolean) = {
    val w0 = text.trim.split("\\s+", -1)
    val w = if (h8(docId.toString) % 3 == 0) w0 ++ w0.take(8) else w0
    val totalChars = w.iterator.map(_.length).sum

    val nl = math.ceil(w.length / 8.0).toInt
    val first8 = w.take(8).mkString(" ")
    val lines = (1 to nl).map { j =>
      if (j > 1 && h8(s"${docId}_$j") % 5 == 0) first8
      else w.slice((j - 1) * 8, (j - 1) * 8 + 8).mkString(" ")
    }
    val lineCnt = lines.groupBy(identity).view.mapValues(_.size).toMap
    val nLines = lines.size
    val dupChars = lineCnt.iterator
      .collect { case (l, c) if c >= 2 => (c - 1).toLong * l.length }.sum
    val lineChars = lineCnt.iterator.map { case (l, c) => c.toLong * l.length }.sum
    val dupLineFrac = r6((nLines - lineCnt.size).toDouble / nLines)
    val dupLineCharFrac =
      r6(if (lineChars == 0) 0.0 else dupChars.toDouble / lineChars)

    val top2 =
      if (w.length < 2 || totalChars == 0) 0.0
      else {
        val byG = (0 until w.length - 1)
          .map(i => (w(i) + " " + w(i + 1), w(i).length + w(i + 1).length))
          .groupBy(_._1).map { case (g, occ) => (g, occ.size, occ.head._2) }
        val (_, c, gl) = byG.toSeq.sortBy { case (g, c, _) => (-c, g) }.head
        r6(c.toLong * gl / totalChars.toDouble)
      }

    val dup5 =
      if (w.length < 5 || totalChars == 0) 0.0
      else {
        val starts = (0 until w.length - 4)
          .map(i => (i + 1, w.slice(i, i + 5).mkString(" ")))
        val dupGrams = starts.groupBy(_._2).filter(_._2.size >= 2).keySet
        val dupStarts = starts.collect { case (p, g) if dupGrams(g) => p }
        val covChars = (1 to w.length).iterator.collect {
          case p if dupStarts.exists(sp => sp <= p && p - sp <= 4) =>
            w(p - 1).length.toLong
        }.sum
        r6(covChars.toDouble / totalChars)
      }

    val keep = dupLineFrac <= 0.30 && dupLineCharFrac <= 0.20 &&
      top2 <= 0.20 && dup5 <= 0.15
    (nLines.toLong, dupLineFrac, dupLineCharFrac, top2, dup5, keep)
  }

  test("td_gopher_rep equals a driver-side recomputation on every sf0.001 doc") {
    val texts = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextQueries.qGopherRep(spark, sf).collect()
    assert(rows.length == texts.size, "one row per document")
    rows.foreach { r =>
      val id = r.getLong(0)
      val want = ref(id, texts(id))
      val got = (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6))
      assert(got == want, s"doc $id: $got != $want")
    }
    // every metric and the keep decision must actually fire both ways
    assert(rows.exists(_.getDouble(2) > 0), "some doc has duplicate lines")
    assert(rows.exists(_.getDouble(2) == 0), "some doc has no duplicate lines")
    assert(rows.exists(_.getDouble(5) > 0), "some doc has duplicated 5-grams")
    assert(rows.exists(_.getDouble(5) == 0), "some doc has none")
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)),
      "keep fires both ways")
  }
}
