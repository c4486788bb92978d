package graft

import graft.queries.EventQueries
import java.sql.Timestamp

/** CUPED variance reduction (ev_cuped): full driver-side replication of
  * the moment arithmetic on a crafted pre/post event set, and the
  * optimality invariant (var_cuped ≤ var_y, reduction ∈ [0, 1)) on
  * testdata. Oracle parity vs DuckDB is the driver gate.
  */
class CupedSpec extends SparkSpec {

  private def variantOf(userId: Long): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(userId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    if (Integer.parseInt(hex, 16) % 2 == 0) "A" else "B"
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("engine statistics equal a driver replica on a crafted pre/post stream") {
    import spark.implicits._
    val pre = Timestamp.valueOf("2024-01-10 12:00:00")
    val post = Timestamp.valueOf("2024-01-20 12:00:00")
    val rnd = new scala.util.Random(99)
    // 40 users with correlated pre-purchases and post-conversion; a few
    // pre-only users must fall OUT of the experiment population
    val events = (0L until 40L).flatMap { u =>
      val heavy = u % 3 == 0
      val preN = if (heavy) 2 + rnd.nextInt(3) else rnd.nextInt(2)
      val buys = heavy || rnd.nextInt(4) == 0
      val preEvs = (0 until preN).map(i => (u, pre, "purchase"))
      val postEvs =
        if (u % 11 == 0) Seq.empty // pre-only user: excluded
        else Seq((u, post, "view")) ++
          (if (buys) Seq((u, post, "purchase")) else Seq.empty)
      preEvs ++ postEvs
    }
    val dir = java.nio.file.Files.createTempDirectory("cuped").toString
    events.zipWithIndex
      .map { case ((u, t, ty), i) => (i.toLong, t, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qCupedLift(spark, dir).collect().head

    // replica with the same integer moments and formula order
    val perUser = events.groupBy(_._1).flatMap { case (u, evs) =>
      val inExp = evs.exists(_._2 == post)
      if (!inExp) None
      else Some((variantOf(u),
        evs.count(e => e._2 == pre && e._3 == "purchase").toLong,
        if (evs.exists(e => e._2 == post && e._3 == "purchase")) 1L else 0L))
    }.toSeq
    val n = perUser.size.toDouble
    val sx = perUser.map(_._2).sum.toDouble
    val sy = perUser.map(_._3).sum.toDouble
    val sxy = perUser.map(e => e._2 * e._3).sum.toDouble
    val sxx = perUser.map(e => e._2 * e._2).sum.toDouble
    val xbar = sx / n
    val varX = sxx / n - xbar * xbar
    val cov = sxy / n - xbar * (sy / n)
    val theta = if (varX <= 0) 0.0 else cov / varX
    val varY = sy / n - (sy / n) * (sy / n)
    assert(got.getLong(0) == perUser.size)
    assert(got.getDouble(1) == r6(theta))
    assert(got.getDouble(2) == r6(varY))
    assert(got.getDouble(3) == r6(varY - theta * cov))
    val a = perUser.filter(_._1 == "A"); val b = perUser.filter(_._1 == "B")
    assert(a.nonEmpty && b.nonEmpty, "fixture must populate both variants")
    val rawDiff = b.map(_._3).sum.toDouble / b.size - a.map(_._3).sum.toDouble / a.size
    assert(got.getDouble(5) == r6(rawDiff))
  }

  test("testdata: the optimal theta never increases variance") {
    val r = EventQueries.qCupedLift(spark, "/root/testdata/sf0.001").collect().head
    assert(r.getLong(0) > 0)
    assert(r.getDouble(3) <= r.getDouble(2) + 1e-9,
      s"var_cuped ${r.getDouble(3)} above var_y ${r.getDouble(2)}")
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
  }
}
