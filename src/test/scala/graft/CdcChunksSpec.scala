package graft

import graft.queries.DedupQueries

/** Content-defined chunking (dd_cdc_chunks): driver-side reference of
  * the LBFS boundary rule and rollup, chunk reconstruction, and the
  * shift-resistance property fixed-width blocking lacks. Oracle parity
  * vs DuckDB is the driver gate.
  */
class CdcChunksSpec extends SparkSpec {

  private val K = 16
  private val D = 64

  private def md5hex(s: String): String = TestHash.md5hex(s)

  private def gramHash(g: String): Long = TestHash.md5Prefix(g, 8)

  /** Reference chunker: the (len, md5) list per document. */
  private def refChunks(text: String): Seq[(Int, String)] = {
    val t = text.trim
    if (t.isEmpty) return Nil
    val lastGram = t.length - K + 1
    val cuts = 1 +: (2 to math.max(lastGram, 1)).filter { p =>
      lastGram >= 2 && gramHash(t.substring(p - 1, p - 1 + K)) % D == 0
    }
    val ends = cuts.drop(1) :+ (t.length + 1)
    cuts.zip(ends).map { case (c, e) =>
      (e - c, md5hex(t.substring(c - 1, e - 1)))
    }
  }

  private def filler(seed: Long, n: Int): String = TestHash.filler(seed, n)

  private def writeDocs(docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("chunks reconstruct the text and boundaries are content-local") {
    val t = filler(11, 2000)
    val chunks = refChunks(t)
    assert(chunks.map(_._1).sum == t.length, "chunk lengths cover the doc")
    assert(chunks.size > 5, s"expected several boundaries, got ${chunks.size}")
    // shift resistance: a prefixed copy re-chunks only the head — every
    // chunk after the first shared boundary has the same hash
    val shifted = refChunks("XYZ " + t)
    val sharedTail = chunks.map(_._2).toSet & shifted.map(_._2).toSet
    assert(sharedTail.size >= chunks.size - 2,
      s"only ${sharedTail.size} of ${chunks.size} chunks survive a prefix edit")
  }

  test("engine rollup equals the driver reference per source and corpus-wide") {
    val base = filler(21, 1800)
    val docs = Seq(
      (1L, base, "s1"),
      (2L, "PREFIX " + base, "s1"), // chunk-level dup of 1 despite new doc hash
      (3L, filler(22, 1500), "s2"),
      (4L, filler(23, 900), "s2"),
      (5L, "", "s2")) // empty doc: filtered, contributes nothing
    val got = DedupQueries.qDedupCdcChunks(spark, writeDocs(docs))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap

    def rollup(cs: Seq[(Long, Seq[(Int, String)])]): (Long, Long, Long, Long, Double) = {
      val all = cs.flatMap { case (id, ch) => ch.map { case (l, h) => (id, l, h) } }
      val stored = all.groupBy(_._3).map(_._2.minBy(x => (x._1, x._2))._2.toLong).sum
      val total = all.map(_._2.toLong).sum
      (all.size.toLong, all.map(_._3).distinct.size.toLong, total, stored,
        BigDecimal(1.0 - stored.toDouble / total)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val byDoc = docs.filter(_._2.trim.nonEmpty)
      .map(d => (d._1, refChunks(d._2), d._3))
    val s1 = rollup(byDoc.filter(_._3 == "s1").map(d => (d._1, d._2)))
    val s2 = rollup(byDoc.filter(_._3 == "s2").map(d => (d._1, d._2)))
    val all = rollup(byDoc.map(d => (d._1, d._2)))
    assert(got("s1") == s1, s"s1: ${got("s1")} vs $s1")
    assert(got("s2") == s2, s"s2: ${got("s2")} vs $s2")
    assert(got("_all") == all, s"_all: ${got("_all")} vs $all")
    // the prefixed copy dedups at chunk level: s1 saves a lot, s2 ~nothing
    assert(got("s1")._5 > 0.4, s"s1 dedup_ratio ${got("s1")._5}")
    assert(got("s2")._5 < 0.05, s"s2 dedup_ratio ${got("s2")._5}")
  }
}
