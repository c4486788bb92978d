package graft

import graft.queries.{EventQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Driver-side third implementations for td_top_ngrams (WIMBD top-3-gram
  * report) and ev_rfm (RFM quintile segmentation) over sf0.001.
  */
class RfmNgramsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("td_top_ngrams equals a driver-side count on sf0.001") {
    val texts = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+"))
    val occ = scala.collection.mutable.HashMap.empty[String, Long]
    val docs = scala.collection.mutable.HashMap.empty[String, Set[Long]]
    texts.foreach { case (id, w) =>
      w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).foreach { g =>
        occ(g) = occ.getOrElse(g, 0L) + 1
        docs(g) = docs.getOrElse(g, Set.empty) + id
      }
    }
    val want = occ.toSeq.map { case (g, n) => (g, n, docs(g).size.toLong) }
      .sortBy { case (g, n, _) => (-n, g) }.take(20).zipWithIndex
      .map { case ((g, n, nd), i) => (i + 1, g, n, nd) }
    val got = TextQueries.qTopNgrams(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"engine: $got\nnaive: $want")
    assert(want.head._3 > 1, "the top gram genuinely repeats")
  }

  /** ntile(5) bucket for 0-based position i of n rows (SQL semantics:
    * the first n%5 buckets hold one extra row). */
  private def ntile5(i: Int, n: Int): Int = {
    val q = n / 5; val r = n % 5
    if (i < r * (q + 1)) i / (q + 1) + 1 else (i - r * (q + 1)) / q + r + 1
  }

  test("ev_rfm equals a driver-side quintile scoring on sf0.001") {
    val p = graft.queries.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val maxUs = p.map(_._2).max
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val base = p.groupBy(_._1).map { case (u, evs) =>
      (u, (maxUs - evs.map(_._2).max) / 3600000000L,
        evs.size.toLong, r4(evs.map(_._3).sum))
    }.toSeq
    val n = base.size
    def scores(key: ((Long, Long, Long, Double)) => (Long, Long),
        desc: Boolean): Map[Long, Int] = {
      val sorted = base.sortBy { row =>
        val (v, u) = key(row); (if (desc) -v else v, u)
      }
      sorted.zipWithIndex.map { case (row, i) => row._1 -> ntile5(i, n) }.toMap
    }
    val r = scores(row => (row._2, row._1), desc = true)
    val f = scores(row => (row._3, row._1), desc = false)
    // monetary is a rounded double: sort on its raw bits via compare
    val mSorted = base.sortBy(row => (row._4, row._1.toDouble))
    val m = mSorted.zipWithIndex.map { case (row, i) => row._1 -> ntile5(i, n) }.toMap
    val want = base.map { case (u, rec, fr, mon) =>
      val seg =
        if (r(u) >= 4 && f(u) >= 4) "champion"
        else if (r(u) >= 4) "recent"
        else if (f(u) >= 4) "at_risk"
        else if (r(u) <= 2 && f(u) <= 2) "hibernating"
        else "regular"
      (u, rec, fr, mon, r(u), f(u), m(u), seg)
    }.toSet
    val got = EventQueries.qEventRfm(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getInt(4), x.getInt(5), x.getInt(6), x.getString(7))).toSet
    assert(got == want,
      s"only engine: ${got -- want}\nonly naive: ${want -- got}")
    assert(got.map(_._8).size >= 3, "multiple segments occur")
  }
}
