package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Association rules (ev_assoc_rules): hand-computed support/confidence/
  * lift on a crafted basket set, plan shape, and metric identities.
  * Oracle parity vs DuckDB is the driver gate.
  */
class AssocRulesSpec extends SparkSpec {

  private def ev(id: Long, u: Long, tpe: String, k: Int) =
    (id, Timestamp.valueOf("2024-01-05 10:00:00"), u, tpe, 0.0, s"""{"k": $k}""")

  test("hand-traced baskets: support, confidence and lift as defined") {
    import spark.implicits._
    // 4 baskets: {1,2} {1,2} {1,3} {2} → pair (1,2) n_ab=2 (min supp 3
    // misses it unless... use 5 baskets so (1,2) reaches 3)
    val rows = Seq(
      ev(1, 10, "purchase", 1), ev(2, 10, "purchase", 2),
      ev(3, 11, "purchase", 1), ev(4, 11, "purchase", 2),
      ev(5, 12, "purchase", 1), ev(6, 12, "purchase", 2),
      ev(7, 13, "purchase", 1), ev(8, 13, "purchase", 3),
      ev(9, 14, "purchase", 2),
      ev(10, 14, "click", 9)) // non-purchase: excluded from baskets
    val dir = java.nio.file.Files.createTempDirectory("assocfix").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.qAssocRules(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // N=5 baskets; n(1)=4, n(2)=4, n(1,2)=3
    // 1→2: supp 3/5=.6, conf 3/4=.75, lift .75/(4/5)=.9375
    assert(got((1, 2)) == (3L, 0.6, 0.75, 0.9375), s"got $got")
    assert(got((2, 1)) == (3L, 0.6, 0.75, 0.9375))
    // (1,3) n_ab=1 < min support 3: absent
    assert(!got.contains((1, 3)) && !got.contains((3, 1)))
  }

  test("testdata: symmetric lift, bounded confidence, TakeOrdered plan") {
    val df = EventQueries.qAssocRules(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val byPair = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(5)).toMap
    byPair.foreach { case ((a, b), lift) =>
      // lift is direction-independent; both directions agree when both
      // survive the top-k cut
      byPair.get((b, a)).foreach(l2 => assert(l2 == lift))
    }
    rows.foreach { r =>
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0, s"confidence: $r")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0, s"support: $r")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global sort:\n$plan")
  }
}
