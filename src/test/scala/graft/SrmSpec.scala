package graft

import graft.queries.EventQueries
import java.sql.Timestamp

/** Sample-ratio-mismatch check (ev_srm_check): a planted triggering
  * bias flips the gate for exactly the biased event type, the χ²
  * arithmetic matches a driver replica, and testdata's hash assignment
  * is SRM-clean. Oracle parity vs DuckDB is the driver gate.
  */
class SrmSpec extends SparkSpec {

  private def variantOf(userId: Long): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(userId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    if (Integer.parseInt(hex, 16) % 2 == 0) "A" else "B"
  }

  test("planted triggering bias flips srm_ok for that event type only") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2024-05-01 10:00:00")
    val ids = (0L until 400L)
    val as = ids.filter(variantOf(_) == "A")
    val bs = ids.filter(variantOf(_) == "B")
    // "view" fires for a balanced 30/30; "push" only reaches variant A
    // (the classic biased-trigger bug): 40 A vs 2 B
    val rows =
      (as.take(30) ++ bs.take(30)).map(u => (u, "view")) ++
        (as.take(40) ++ bs.take(2)).map(u => (u, "push"))
    val dir = java.nio.file.Files.createTempDirectory("srm").toString
    rows.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, ts, u, t, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qSrmCheck(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(5))).toMap
    assert(got("view") == ((30L, 30L, 0.0, true)))
    val push = got("push")
    assert(push._1 == 40L && push._2 == 2L && !push._4,
      s"biased trigger must trip SRM: $push")
    // replica: chi2 = (40-2)^2/42
    assert(push._3 == math.rint(38.0 * 38.0 / 42.0 * 1e6) / 1e6)
    // overall = distinct union of both audiences
    val (oa, ob) = ((as.take(30) ++ as.take(40)).distinct.size.toLong,
      (bs.take(30) ++ bs.take(2)).distinct.size.toLong)
    assert(got("_overall")._1 == oa && got("_overall")._2 == ob)
  }

  test("testdata: the hash assignment is SRM-clean everywhere") {
    val rows = EventQueries.qSrmCheck(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(5),
        s"${r.getString(0)}: chi2 ${r.getDouble(3)} over threshold")
    }
    assert(rows.map(_.getString(0)).contains("_overall"))
  }
}
