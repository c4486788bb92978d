package graft

import graft.queries.{EventQueries, TextQueries}
import java.sql.Timestamp

/** Corpus-statistics trio: Zipf fit (td_zipf), TF-IDF keywords
  * (td_tfidf_keywords), DAU/WAU/MAU stickiness (ev_stickiness) — each
  * against a full driver replica. Oracle parity vs DuckDB is the
  * driver gate.
  */
class TextStatsSpec extends SparkSpec {

  private def r6(x: Double): Double = TestHash.roundHalfUp(x, 6)

  test("zipf: OLS over the ranked head equals a driver replica on sf0.001") {
    val freqs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .collect().flatMap(_.getAs[String]("text").trim.split("\\s+"))
      .filter(_.nonEmpty).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val head = freqs.toSeq.sortBy { case (t, f) => (-f, t) }.take(1000)
    val pts = head.zipWithIndex.map { case ((_, f), i) =>
      (math.log((i + 1).toDouble), math.log(f.toDouble))
    }
    val n = pts.size
    val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val cov = pts.map { case (x, y) => (x - mx) * (y - my) }.sum / n
    val vx = pts.map { case (x, _) => (x - mx) * (x - mx) }.sum / n
    val slope = cov / vx
    val r = EventQueries // force no unused warnings
    val got = TextQueries.qZipfFit(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(got.getLong(0) == n)
    assert(math.abs(got.getDouble(1) - slope) <= 1e-5,
      s"slope ${got.getDouble(1)} vs $slope")
    assert(math.abs(got.getDouble(2) - (my - slope * mx)) <= 1e-4)
    assert(got.getDouble(1) < 0, "frequency must fall with rank")
    // the synthetic corpus is deliberately near-uniform (measured r2 ≈
    // 0.06, slope ≈ 0 — far from a natural corpus's slope ≈ −1 at high
    // r2), which is exactly the distribution-shape signal the
    // diagnostic exists to surface; assert only the well-formed range
    assert(got.getDouble(3) >= 0.0 && got.getDouble(3) <= 1.0,
      s"r2 in range: ${got.getDouble(3)}")
  }

  test("tfidf keywords: scores and ranks equal a driver replica") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana durian"),
      (3L, "cherry cherry cherry elder fig"),
      (4L, "apple banana cherry")) // nothing distinctive
    val dir = java.nio.file.Files.createTempDirectory("tfidf").toString
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val n = docs.size.toDouble
    val tf = docs.flatMap { case (id, t) =>
      t.split("\\s+").groupBy(identity).map { case (w, o) => (id, w, o.length) }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.size).toMap
    val want = tf.map { case (id, w, f) =>
      (id, w, r6(f * math.log(n / df(w))))
    }.groupBy(_._1).view.mapValues {
      _.sortBy { case (_, w, sc) => (-sc, w) }.take(3).zipWithIndex
        .map { case ((_, w, sc), i) => (i + 1, w, sc) }
    }.toMap
    val got = TextQueries.qTfidfKeywords(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)
        .map(t => (t._2, t._3, t._4)).toSeq).toMap
    assert(got == want.mapValues(_.toSeq).toMap, s"got $got\nwant $want")
    // the distinctive terms win: durian tops doc 2, elder/fig rank in 3
    assert(got(2L).head._2 == "banana" || got(2L).head._2 == "durian")
    assert(got(2L).map(_._2).contains("durian"))
  }

  test("stickiness: DAU/WAU/MAU joins equal a driver replica across a month edge") {
    import spark.implicits._
    // events span a month boundary (Jan 29 – Feb 4, 2024: Mon–Sun one
    // ISO week crossing months), so week and month windows disagree
    val days = (29 to 31).map(d => s"2024-01-$d") ++
      (1 to 4).map(d => f"2024-02-$d%02d")
    val events = days.zipWithIndex.flatMap { case (day, i) =>
      // user set varies per day; user 100 appears every day
      (0 until (3 + i)).map(u => (day, u.toLong)) :+ ((day, 100L))
    }
    val dir = java.nio.file.Files.createTempDirectory("stick").toString
    events.zipWithIndex.map { case ((day, u), i) =>
      (i.toLong, Timestamp.valueOf(s"$day 10:00:00"), u, "view", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qStickiness(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    def usersOf(ds: Seq[String]): Set[Long] =
      events.filter(e => ds.contains(e._1)).map(_._2).toSet
    val week = days // all seven days are one ISO week
    days.zipWithIndex.foreach { case (day, i) =>
      val month = days.filter(_.take(7) == day.take(7))
      val dau = usersOf(Seq(day)).size.toLong
      val wau = usersOf(week).size.toLong
      val mau = usersOf(month).size.toLong
      val want = (dau, wau, mau,
        BigDecimal(dau.toDouble / mau)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got(day) == want, s"$day: ${got(day)} vs $want")
    }
    // the month boundary is visible: Jan 31 and Feb 1 share a week but
    // not a month, so their MAUs differ while WAU is constant
    assert(got("2024-01-31")._2 == got("2024-02-01")._2)
    assert(got("2024-01-31")._3 != got("2024-02-01")._3)
  }
}
