package graft

import graft.queries.{EventQueries, Tables}
import org.apache.spark.sql.functions._

/** Mergeable HLL sketch rollup: union-of-sketches must track the exact
  * distinct count computed from raw data (the property that makes the
  * one-scan + merge-forever pattern safe at scale). */
class SketchRollupSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("cms merge estimate never under-counts and stays within budget") {
    // the gate query IS the contract: est_ok must be true on every row
    val rows = EventQueries.qCmsTopkGate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"CMS contract violated on $r")
    }
  }

  test("cms merged sketch estimates equal a single direct-build sketch") {
    import graft.functions.SketchFunctions
    // merging per-day sketches must give the same counters as one sketch
    // built over all events (CMS merge law: counter matrices ADD)
    val e = Tables.events(spark, sf)
    val daily = e.groupBy(date_trunc("day", col("ts")))
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
    val merged = daily.agg(SketchFunctions.cmsMerge(col("sk")).as("sk"))
    val direct = e.agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
    val users = e.select(col("user_id")).distinct().limit(20)
    def estimates(sk: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      sk.crossJoin(users)
        .select(col("user_id"), SketchFunctions.cmsEstimate(col("sk"), col("user_id")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = estimates(merged)
    val d = estimates(direct)
    assert(m.nonEmpty && m == d, s"merged=$m direct=$d")
  }

  test("sketch union estimate tracks exact distinct users per type") {
    val est = EventQueries.qReachSketchRollup(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (t, e) =>
      val x = exact(t)
      assert(math.abs(e - x).toDouble / x < 0.05,
        s"$t: sketch-merged $e vs exact $x")
    }
  }
}
