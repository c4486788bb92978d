package graft

import graft.queries.{EventQueries, Tables}
import org.apache.spark.sql.functions._

/** Mergeable HLL sketch rollup: union-of-sketches must track the exact
  * distinct count computed from raw data (the property that makes the
  * one-scan + merge-forever pattern safe at scale). */
class SketchRollupSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

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
