package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** C4 line-level cleaning (td_c4_clean): a full driver-side recomputation
  * of the injected-line harness + rule predicates over the real sf0.001
  * corpus (every doc), plus a crafted fixture exercising each C4 rule in
  * isolation. The DuckDB oracle is the cross-engine gate; this spec is
  * the independent third implementation of the same arithmetic.
  */
class C4CleanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  /** The operator's construction, in plain Scala. */
  private def c4Ref(docId: Long, text: String): (Int, Int, Boolean, String) = {
    val w = text.trim.split("\\s+", -1)
    val nLines = math.ceil(w.length / 8.0).toInt
    val lines = (1 to nLines).map { j =>
      val sl = w.slice((j - 1) * 8, (j - 1) * 8 + 8)
      val h = java.lang.Long.parseLong(
        md5hex(s"${docId}_$j").substring(0, 8), 16)
      sl.mkString(" ") +
        (if (h % 17 == 0) " lorem ipsum" else "") +
        (if (h % 13 == 0) " {" else "") +
        (if (h % 4 != 0) "." else "")
    }
    val kept = lines.filter(t => t.endsWith(".") && !t.contains("lorem ipsum") &&
      !t.contains("{") && t.split(" ", -1).length >= 5)
    (nLines, kept.length, kept.length >= 3, md5hex(kept.mkString(" ")))
  }

  test("td_c4_clean equals a driver-side recomputation on every sf0.001 doc") {
    val texts = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextQueries.qC4Clean(spark, sf).collect()
    assert(rows.length == texts.size, "one row per document")
    rows.foreach { r =>
      val id = r.getLong(0)
      val want = c4Ref(id, texts(id))
      val got = (r.getInt(1), r.getInt(2), r.getBoolean(3), r.getString(4))
      assert(got == want, s"doc $id: $got != $want")
    }
    // the rules must actually fire both ways on this corpus
    assert(rows.exists(_.getBoolean(3)), "some doc passes C4")
    assert(rows.exists(!_.getBoolean(3)), "some doc fails C4")
    assert(rows.exists(r => r.getInt(2) > 0 && r.getInt(2) < r.getInt(1)),
      "some doc keeps a strict subset of its lines")
  }

  test("each C4 rule fires in isolation on a crafted doc") {
    // doc_id=7: brute-force check that line hashes produce all four rule
    // outcomes SOMEWHERE in a 64-line doc (8·64 words) — i.e. the
    // injection actually exercises terminator, lorem, brace and short
    val (_, nKept, _, _) = c4Ref(7L, Seq.fill(8 * 64)("tok").mkString(" "))
    assert(nKept > 0 && nKept < 64,
      s"crafted doc must keep a strict subset of lines, kept $nKept")
    // a 4-word doc can never pass the ≥5-words rule even with a terminator
    val (n1, k1, keep1, h1) = c4Ref(3L, "w1 w2 w3 w4")
    assert(n1 == 1 && k1 == 0 && !keep1 && h1 == md5hex(""))
  }
}
