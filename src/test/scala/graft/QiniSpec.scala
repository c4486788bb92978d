package graft

import graft.queries.EventQueries
import java.sql.Timestamp

/** Qini uplift readout (ev_qini): full driver replica of the tie-aware
  * decile cut, per-decile uplift and cumulative Qini coordinates on a
  * crafted pre/post stream; structural invariants on testdata. Oracle
  * parity vs DuckDB is the driver gate.
  */
class QiniSpec extends SparkSpec {

  private def variantOf(userId: Long): String = TestHash.variantOf(userId)

  private def r6(x: Double): Double = TestHash.roundHalfUp(x, 6)
  private def r4(x: Double): Double = TestHash.roundHalfUp(x, 4)

  test("deciles, uplift and Qini equal a driver replica on a crafted stream") {
    import spark.implicits._
    val pre = Timestamp.valueOf("2024-01-10 12:00:00")
    val post = Timestamp.valueOf("2024-01-20 12:00:00")
    val rnd = new scala.util.Random(11)
    // 80 users; pre-period activity = score (0..7 with heavy ties);
    // treated (B) users convert more when high-score — a real uplift
    val users = (0L until 80L).map { u =>
      val score = rnd.nextInt(8)
      val convert = (variantOf(u) == "B" && score >= 4 && rnd.nextInt(3) > 0) ||
        (rnd.nextInt(10) == 0)
      (u, score, convert)
    }
    val events = users.flatMap { case (u, score, convert) =>
      Seq.fill(score)((u, pre, "view")) ++
        Seq((u, post, if (convert) "purchase" else "view"))
    }
    val dir = java.nio.file.Files.createTempDirectory("qini").toString
    events.zipWithIndex
      .map { case ((u, t, ty), i) => (i.toLong, t, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qQiniUplift(spark, dir).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) null else r.getDouble(5).asInstanceOf[Any],
        if (r.isNullAt(6)) null else r.getDouble(6).asInstanceOf[Any]))

    // replica: tie-aware decile = floor(10*count_above/N)+1 per score
    val n = users.size
    val byScore = users.groupBy(_._2).view.mapValues(_.size).toMap
    def decileOf(score: Int): Int = {
      val above = byScore.filter(_._1 > score).values.sum
      above * 10 / n + 1
    }
    val cells = users.groupBy(u => decileOf(u._2)).toSeq.sortBy(_._1).map {
      case (dec, us) =>
        val t = us.filter(u => variantOf(u._1) == "B")
        val c = us.filter(u => variantOf(u._1) == "A")
        (dec, t.size.toLong, c.size.toLong,
          t.count(_._3).toLong, c.count(_._3).toLong)
    }
    val want = cells.zipWithIndex.map { case ((dec, nt, nc, ct, cc), i) =>
      val cum = cells.take(i + 1)
      val (cnt, cnc) = (cum.map(_._2).sum, cum.map(_._3).sum)
      val (cct, ccc) = (cum.map(_._4).sum, cum.map(_._5).sum)
      val uplift: Any =
        if (nt == 0 || nc == 0) null
        else r6(ct.toDouble / nt - cc.toDouble / nc).asInstanceOf[Any]
      val qini: Any =
        if (cnc == 0) null
        else r4(cct.toDouble - ccc.toDouble * cnt / cnc).asInstanceOf[Any]
      (dec, nt, nc, ct, cc, uplift, qini)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // the planted effect: top-decile uplift positive, above the bottom's
    val top = got.head._6.asInstanceOf[Double]
    val bottomish = got.last._6
    assert(top > 0.2, s"top-decile uplift $top")
    if (bottomish != null)
      assert(top > bottomish.asInstanceOf[Double], "uplift ranks by score")
  }

  test("testdata invariants: deciles partition the experiment population") {
    val rows = EventQueries.qQiniUplift(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty && rows.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 10))
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val inExp = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("ts") >=
        org.apache.spark.sql.functions.lit("2024-01-16 00:00:00").cast("timestamp"))
      .select("user_id").distinct().count()
    assert(total == inExp, s"deciles cover every in-experiment user: $total vs $inExp")
  }
}
