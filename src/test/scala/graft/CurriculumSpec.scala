package graft

import graft.queries.TextQueries

/** Curriculum phase assembly (td_curriculum): driver-side replica of
  * the score + quartile-cut arithmetic, phase-boundary ordering, and
  * mass conservation on testdata. Oracle parity vs DuckDB is the
  * driver gate.
  */
class CurriculumSpec extends SparkSpec {

  private def r(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def score(text: String): Double = {
    val toks = text.trim.split("\\s+")
    val ntok = toks.length.toDouble
    val nchr = text.replaceAll("\\s", "").length.toDouble
    r(0.7 * math.log(1.0 + ntok) + 0.3 * (nchr / math.max(ntok, 1.0)), 6)
  }

  // exact interpolated percentile over the sorted values (the
  // percentile()/quantile_cont contract both engines implement)
  private def pct(sorted: Seq[Double], q: Double): Double = {
    val rank = q * (sorted.length - 1)
    val lo = rank.toInt
    val frac = rank - lo
    if (lo + 1 >= sorted.length) sorted(lo)
    else sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
  }

  test("engine phases equal the driver replica on a crafted corpus") {
    import spark.implicits._
    // spread of lengths and word sizes so all four phases populate
    val texts = (1 to 16).map(i => Seq.fill(i * 2)("w" * (1 + i % 4)).mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, if (i % 2 == 0) "en" else "de", "web", t.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("curr").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.qCurriculum(spark, dir).collect()
      .map(x => (x.getInt(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))).toMap
    val scored = docs.map { case (id, t, lang, _, _) => (id, lang, score(t)) }
    val ss = scored.map(_._3).sorted
    val (q1, q2, q3) = (pct(ss, 0.25), pct(ss, 0.5), pct(ss, 0.75))
    val want = scored
      .map { case (_, lang, sc) =>
        val phase = 1 + (if (sc > q1) 1 else 0) + (if (sc > q2) 1 else 0) +
          (if (sc > q3) 1 else 0)
        ((phase, lang), sc)
      }
      .groupBy(_._1).map { case (k, xs) =>
        val vs = xs.map(_._2)
        k -> (vs.size.toLong, r(vs.sum / vs.size, 4), vs.min, vs.max)
      }
    assert(got.keySet == want.keySet)
    got.foreach { case (k, g) => assert(g == want(k), s"$k: $g vs ${want(k)}") }
  }

  test("testdata: phases conserve mass and stack in score order") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextQueries.qCurriculum(spark, sf).collect()
      .map(x => (x.getInt(0), x.getLong(2), x.getDouble(4), x.getDouble(5)))
    val n = graft.queries.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == n)
    val phases = rows.groupBy(_._1).view
      .mapValues(xs => (xs.map(_._3).min, xs.map(_._4).max)).toMap
    assert(phases.keySet == Set(1, 2, 3, 4), s"empty phase: ${phases.keySet}")
    // quartile cuts: every phase-p score ≤ every phase-(p+1) score
    (1 to 3).foreach { p =>
      assert(phases(p)._2 <= phases(p + 1)._1,
        s"phase $p max ${phases(p)._2} above phase ${p + 1} min ${phases(p + 1)._1}")
    }
  }
}
