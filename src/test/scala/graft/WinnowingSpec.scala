package graft

import graft.queries.DedupQueries

/** Winnowing fingerprints (dd_winnowing): full driver-side reference of
  * the Schleimer et al. 2003 selection (min hash per window, rightmost
  * on ties) on a crafted corpus, the ≥ K+W−1 shared-run guarantee, and
  * the window-density bound. Oracle parity vs DuckDB is the driver gate.
  */
class WinnowingSpec extends SparkSpec {

  private val K = 16
  private val W = 8
  private val B = 1048576L

  private def gramHash(g: String): Long = TestHash.md5Prefix(g, 8)

  private def norm(t: String): String =
    t.trim.toLowerCase.replaceAll("\\s+", " ")

  /** Reference winnowing: selected fingerprint hash set per doc. */
  private def refFingerprints(text: String): Set[Long] = {
    val t = norm(text)
    if (t.length < K) return Set.empty
    val ng = t.length - K + 1
    val keys = (1 to ng).map { p =>
      gramHash(t.substring(p - 1, p - 1 + K)) * B + (B - 1 - p)
    }
    // window ends at gram e; short docs keep the final all-covering frame
    (math.min(W, ng) to ng).map { e =>
      keys.slice(math.max(0, e - W), e).min
    }.toSet.map((k: Long) => k / B)
  }

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // deterministic non-repetitive filler so no accidental shared grams
  private def filler(seed: Long, n: Int): String = TestHash.filler(seed, n)

  test("engine pairs equal the driver reference on a crafted corpus") {
    val shared = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      1L -> (filler(1, 300) + " " + shared + " " + filler(2, 300)),
      2L -> (filler(3, 300) + " " + shared + " " + filler(4, 300)),
      3L -> filler(5, 600),
      4L -> filler(5, 600), // exact dup of 3
      5L -> filler(6, 600))
    val got = DedupQueries.qDedupWinnowing(spark, writeDocs(docs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val fps = docs.map { case (id, t) => id -> refFingerprints(t) }.toMap
    val df = fps.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val ok = df.filter(_._2 <= 64).keySet
    val want = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      sh = (fps(a) & fps(b) & ok).size if sh >= 2
    } yield (a, b) -> (sh.toLong,
      BigDecimal(sh.toDouble / math.min((fps(a) & ok).size, (fps(b) & ok).size))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(got == want, s"got $got\nwant $want")
    // the 50-char shared run guarantees a common fingerprint (≥ 23 chars)
    assert(got.contains((1L, 2L)), "shared-run pair must surface")
    assert(got.contains((3L, 4L)), "exact dup pair must surface")
    assert(!got.keySet.exists { case (a, b) => Set(a, b) == Set(1L, 5L) },
      "unrelated docs share nothing")
  }

  test("top-k report equals the full pair report cut per doc, bounded at 3/doc") {
    // many-partner corpus: docs 1..6 all share one run (15 pairs), so
    // the per-doc top-3 cut genuinely drops partners
    val shared = "the quick brown fox jumps over the lazy dog again"
    val docs = (1L to 6L).map { id =>
      id -> (filler(10 + id, 200 + 17 * id.toInt) + " " + shared + " " +
        filler(20 + id, 200))
    } :+ (9L -> filler(99, 600))
    val dir = writeDocs(docs)
    val full = DedupQueries.qDedupWinnowing(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val got = DedupQueries.qDedupWinnowingTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    // driver cut of the full report: symmetrize, sort, take 3
    val want = full.flatMap { case (a, b, n, o) => Seq((a, b, n, o), (b, a, n, o)) }
      .groupBy(_._1).toSeq.flatMap { case (doc, ps) =>
        ps.sortBy(p => (-p._3, -p._4, p._2)).take(3).zipWithIndex
          .map { case ((_, p, n, o), i) => (doc, p, n, o, i + 1) }
      }.sortBy(t => (t._1, t._5))
    assert(got.toSeq == want.toSeq, s"got ${got.toSeq}\nwant ${want.toSeq}")
    assert(got.groupBy(_._1).values.forall(_.length <= 3), "≤3 rows per doc")
    assert(full.length == 15 && got.length == 6 * 3,
      "the cut must genuinely drop partners on this corpus")
  }

  test("guarantee: any two docs sharing a (K+W-1)-char run share a fingerprint") {
    val rnd = new java.util.Random(42)
    for (trial <- 0 until 20) {
      val run = filler(1000 + trial, K + W - 1)
      val a = filler(2000 + trial, 100 + rnd.nextInt(200)) + run +
        filler(3000 + trial, 100 + rnd.nextInt(200))
      val b = filler(4000 + trial, 100 + rnd.nextInt(200)) + run +
        filler(5000 + trial, 100 + rnd.nextInt(200))
      assert((refFingerprints(a) & refFingerprints(b)).nonEmpty,
        s"trial $trial: the winnowing guarantee failed")
    }
  }

  test("density: selected fingerprints per doc stay near 2/(W+1) of grams") {
    val t = filler(7, 5000)
    val nSel = refFingerprints(t).size
    val ng = t.length - K + 1
    // distinct-hash selection loses a few to duplicates; the window
    // bound guarantees at least ng/W selections (one per disjoint window)
    assert(nSel >= ng / W && nSel <= ng * 4 / (W + 1),
      s"$nSel of $ng grams selected")
  }
}
