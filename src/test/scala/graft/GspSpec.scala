package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** GSP sequential patterns with max-gap (ev_gsp): a crafted fixture
  * proving the gap constraint, the order requirement, and the same-ts
  * event_id tiebreak; plus a driver-side recomputation over the real
  * sf0.001 corpus — the independent third implementation next to the
  * DuckDB oracle.
  */
class GspSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val GapMs = 4L * 3600 * 1000

  private def ts(hours: Double): Timestamp =
    new Timestamp(1700000000000L + (hours * 3600 * 1000).toLong)

  /** (ts, eid) strictly-after + within-gap — the engine's predicate. */
  private def okStep(t1: Long, e1: Long, t2: Long, e2: Long): Boolean =
    (t2 > t1 || (t2 == t1 && e2 > e1)) && t2 <= t1 + GapMs

  /** Driver-side GSP: events as (user, type, tsMillis, eid) → map of
    * pattern -> distinct-user support, levels 1..3, NO minsup (callers
    * threshold). Pair completions then single-step extension — the same
    * exists semantics, independently derived. */
  private def refSupports(ev: Seq[(Long, String, Long, Long)])
      : Map[Seq[String], Int] = {
    val byUser = ev.groupBy(_._1)
    val sup = scala.collection.mutable.Map.empty[Seq[String], Set[Long]]
    def add(p: Seq[String], u: Long): Unit =
      sup(p) = sup.getOrElse(p, Set.empty) + u
    for ((u, es) <- byUser) {
      es.map(_._2).distinct.foreach(t => add(Seq(t), u))
      // pair completions: distinct (p1, p2, end ts, end eid)
      val comp = (for {
        (_, t1, ts1, e1) <- es
        (_, t2, ts2, e2) <- es if okStep(ts1, e1, ts2, e2)
      } yield (t1, t2, ts2, e2)).distinct
      comp.map(c => (c._1, c._2)).distinct.foreach {
        case (a, b) => add(Seq(a, b), u)
      }
      (for {
        (p1, p2, ts2, e2) <- comp
        (_, t3, ts3, e3) <- es if okStep(ts2, e2, ts3, e3)
      } yield Seq(p1, p2, t3)).distinct.foreach(add(_, u))
    }
    sup.view.mapValues(_.size).toMap
  }

  private def writeEvents(rows: Seq[(Long, Long, Timestamp, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gsp").toString
    rows.map { case (eid, u, t, ty) => (eid, t, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("gap constraint, ordering, and same-ts eid tiebreak on a fixture") {
    // user 1: a@0 b@1 c@10 — a→b within gap; b→c 9h exceeds it
    // user 2: a@0 c@2 b@3 — a→c→b chains (2h, 1h); a→b direct (3h)
    // user 3: a@5 b@5 same instant — eid order admits a→b, not b→a
    val dir = writeEvents(Seq(
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(1), "b"), (3L, 1L, ts(10), "c"),
      (11L, 2L, ts(0), "a"), (12L, 2L, ts(2), "c"), (13L, 2L, ts(3), "b"),
      (31L, 3L, ts(5), "a"), (32L, 3L, ts(5), "b")))
    val got = EventQueries.qGsp(spark, dir).collect().map { r =>
      (r.getInt(0), Seq(Option(r.getString(1)), Option(r.getString(2)),
        Option(r.getString(3))).flatten, r.getLong(4))
    }.toSet
    val want = Set(
      (1, Seq("a"), 3L), (1, Seq("b"), 3L), (1, Seq("c"), 2L),
      (2, Seq("a", "b"), 3L), (2, Seq("a", "c"), 1L), (2, Seq("c", "b"), 1L),
      (3, Seq("a", "c", "b"), 1L))
    assert(got == want, s"got $got")
  }

  test("ev_gsp equals a driver-side recomputation on sf0.001") {
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime, r.getLong(3))).toSeq
    val nUsers = ev.map(_._1).distinct.size
    val want = refSupports(ev).filter(_._2 >= nUsers * 0.1)
    val got = EventQueries.qGsp(spark, sf).collect().map { r =>
      Seq(Option(r.getString(1)), Option(r.getString(2)),
        Option(r.getString(3))).flatten -> r.getLong(4).toInt
    }.toMap
    assert(got == want, s"pattern sets differ: " +
      s"only-engine=${got.keySet -- want.keySet} " +
      s"only-ref=${want.keySet -- got.keySet}")
    // the minsup threshold and the gap must both actually bite
    assert(want.nonEmpty, "some pattern is frequent")
    assert(refSupports(ev).size > want.size, "minsup prunes something")
  }
}
