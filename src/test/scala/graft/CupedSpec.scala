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

  test("DiD: cell means and the double difference equal a driver replica") {
    import spark.implicits._
    val pre = Timestamp.valueOf("2024-01-10 12:00:00")
    val post = Timestamp.valueOf("2024-01-20 12:00:00")
    val rnd = new scala.util.Random(7)
    // every user contributes both periods; conversion odds differ by
    // period so the parallel-trends baseline is non-trivial
    val events = (0L until 60L).flatMap { u =>
      Seq((u, pre, if (rnd.nextInt(5) == 0) "purchase" else "view"),
        (u, post, if (rnd.nextInt(3) == 0) "purchase" else "view"))
    }
    val dir = java.nio.file.Files.createTempDirectory("did").toString
    events.zipWithIndex
      .map { case ((u, t, ty), i) => (i.toLong, t, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qDidLift(spark, dir).collect().head

    def cell(v: String, isPost: Boolean): (Long, Double, Double) = {
      val ys = events.groupBy(e => (e._1, e._2)).collect {
        case ((u, t), evs) if variantOf(u) == v &&
          (t == post) == isPost =>
          if (evs.exists(_._3 == "purchase")) 1.0 else 0.0
      }.toSeq
      val n = ys.size
      val m = ys.sum / n
      (n.toLong, m, m * (1 - m) * n / (n - 1.0))
    }
    val (na0, ma0, s2a0) = cell("A", isPost = false)
    val (na1, ma1, s2a1) = cell("A", isPost = true)
    val (nb0, mb0, s2b0) = cell("B", isPost = false)
    val (nb1, mb1, s2b1) = cell("B", isPost = true)
    val did = (mb1 - mb0) - (ma1 - ma0)
    val se = math.sqrt(s2a0 / na0 + s2a1 / na1 + s2b0 / nb0 + s2b1 / nb1)
    assert(got.getDouble(0) == r6(ma0) && got.getDouble(1) == r6(ma1))
    assert(got.getDouble(2) == r6(mb0) && got.getDouble(3) == r6(mb1))
    assert(got.getDouble(4) == r6(did), s"did ${got.getDouble(4)} vs $did")
    assert(got.getDouble(5) == r6(se))
    val t4 = BigDecimal(did / se).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(got.getDouble(6) == t4.toDouble)
  }

  test("DiD: a single-user cell pins s2 to 0.0 instead of 0/0") {
    import spark.implicits._
    val pre = Timestamp.valueOf("2024-01-10 12:00:00")
    val post = Timestamp.valueOf("2024-01-20 12:00:00")
    // exactly ONE variant-A user: both A cells have n=1, where the
    // unguarded n/(n−1) variance is 0/0 (NULL on Spark, NaN on DuckDB)
    val aUser = (0L until 200L).find(variantOf(_) == "A").get
    val bUsers = (0L until 200L).filter(variantOf(_) == "B").take(20)
    val events =
      Seq((aUser, pre, "view"), (aUser, post, "purchase")) ++
        bUsers.zipWithIndex.flatMap { case (u, i) =>
          Seq((u, pre, if (i % 4 == 0) "purchase" else "view"),
            (u, post, if (i % 3 == 0) "purchase" else "view"))
        }
    val dir = java.nio.file.Files.createTempDirectory("did1").toString
    events.zipWithIndex
      .map { case ((u, t, ty), i) => (i.toLong, t, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qDidLift(spark, dir).collect()
    assert(got.length == 1, "the 4-cell frame must still assemble")
    val r = got.head
    // A cells: n=1 → m ∈ {0, 1}, s2 = 0 by the guard; SE reduces to
    // the B-cell half only — finite, driver-replicated
    val bPre = bUsers.zipWithIndex.map { case (_, i) => if (i % 4 == 0) 1.0 else 0.0 }
    val bPost = bUsers.zipWithIndex.map { case (_, i) => if (i % 3 == 0) 1.0 else 0.0 }
    def mv(ys: Seq[Double]): (Double, Double) = {
      val n = ys.size; val m = ys.sum / n
      (m, m * (1 - m) * n / (n - 1.0))
    }
    val (mb0, s2b0) = mv(bPre)
    val (mb1, s2b1) = mv(bPost)
    val se = math.sqrt(s2b0 / bUsers.size + s2b1 / bUsers.size)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0,
      "the single A user views pre, purchases post")
    assert(r.getDouble(5) == r6(se), s"se ${r.getDouble(5)} vs $se")
    assert(!r.getDouble(6).isNaN, "t_stat stays finite")
  }

  test("power analysis: the Fleiss sizing formula on a crafted conversion rate") {
    import spark.implicits._
    // 10 users x 10 days, exactly 3 of 10 user-days convert -> p1 = 0.3
    val base = Timestamp.valueOf("2024-01-10 00:00:00")
    val events = for (u <- 0L until 10L; day <- 0 until 10) yield {
      val t = new Timestamp(base.getTime + day * 86400000L)
      (u, t, if ((u + day) % 10 < 3) "purchase" else "view")
    }
    val dir = java.nio.file.Files.createTempDirectory("power").toString
    events.zipWithIndex
      .map { case ((u, t, ty), i) => (i.toLong, t, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventQueries.qPowerAnalysis(spark, dir).collect().head
    assert(r.getLong(0) == 100L, s"100 user-day units: $r")
    assert(r.getDouble(1) == 0.3, s"base rate: $r")
    val (p1, p2) = (0.3, 0.33)
    val pbar = (p1 + p2) / 2
    val za = 1.959963984540054; val zb = 0.8416212335729143
    val nArm = math.ceil(math.pow(za * math.sqrt(2 * pbar * (1 - pbar)) +
      zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2) /
      math.pow(p2 - p1, 2))
    assert(r.getLong(4) == nArm.toLong, s"n_per_arm ${r.getLong(4)} vs $nArm")
    assert(r.getLong(5) == 2 * nArm.toLong)
    // 10 distinct users every day → daily_users = 10, days = 2n/10
    assert(r.getDouble(6) == 10.0)
    assert(r.getLong(7) == math.ceil(2 * nArm / 10.0).toLong)
  }
}
