package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The custom-operator form of the backward as-of join
  * ([[graft.plans.AsofJoinPlan]] → [[graft.plans.AsofMergeJoinExec]]):
  * value parity with the union+window form (which the DuckDB ASOF oracle
  * pins), null/composite-key semantics, physical-plan shape, and the
  * partitioning-preservation property that is the operator's reason to
  * exist.
  */
class AsofMergePlanSpec extends SparkSpec {

  import java.sql.Timestamp
  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private def fixtures = {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts(10)),
      (2L, "u1", ts(20)),
      (3L, "u2", ts(5)),
      (4L, "u3", ts(30))).toDF("id", "user", "t")
    val right = Seq(
      ("u1", ts(10), 1.0),
      ("u1", ts(15), 2.0),
      ("u2", ts(9), 9.0),
      ("u1", ts(15), 5.0)) // duplicate (key, time): max payload wins
      .toDF("user", "t", "v")
    (left, right)
  }

  /** Executed plan, truncated to the AQE FINAL plan section (the full
    * string prints Initial + Final, double-counting every exchange). */
  private def executedPlan(df: DataFrame): String = {
    df.collect()
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
  }

  test("merge plan matches the union+window form on the fixture") {
    val (left, right) = fixtures
    for (strict <- Seq(false, true)) {
      val a = AsofJoin.asofBackward(left, right, Seq("user"), "t", "t",
        Seq("v"), strict).orderBy("id").collect().toSeq
      val b = AsofJoin.asofMerge(left, right, Seq("user"), "t", "t",
        Seq("v"), strict).orderBy("id").collect().toSeq
      assert(a == b, s"strict=$strict: merge=$b window=$a")
      assert(AsofJoin.asofMerge(left, right, Seq("user"), "t", "t", Seq("v"))
        .columns.toSeq == Seq("id", "user", "t", "asof_v", "asof_t"))
    }
  }

  test("merge plan matches on a randomized self-join corpus") {
    import spark.implicits._
    // deterministic pseudo-random event stream carved into both sides —
    // the production shape (purchases asof clicks from the same table)
    val rng = new scala.util.Random(42)
    val rows = (1 to 2000).map { i =>
      (i.toLong, s"u${rng.nextInt(37)}",
        new Timestamp(1700000000000L + rng.nextInt(1000000) * 1000L),
        if (rng.nextInt(3) == 0) "purchase" else "click",
        rng.nextInt(1000) / 10.0)
    }.toDF("event_id", "user", "t", "kind", "v")
    val purchases = rows.filter(col("kind") === "purchase")
      .select("event_id", "user", "t", "v")
    val clicks = rows.filter(col("kind") === "click").select("user", "t", "v")
    val a = AsofJoin.asofBackward(purchases, clicks, Seq("user"), "t", "t",
      Seq("v")).orderBy("event_id").collect().toSeq
    val b = AsofJoin.asofMerge(purchases, clicks, Seq("user"), "t", "t",
      Seq("v")).orderBy("event_id").collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("composite keys and null keys/timestamps never match") {
    import spark.implicits._
    val left = Seq(
      (1L, Option("ns1"), Option("u1"), Option(ts(20))),
      (2L, None, Option("u1"), Option(ts(20))), // null key: no match
      (3L, Option("ns1"), Option("u1"), None)) // null left time: no match
      .toDF("id", "ns", "user", "t")
    val right = Seq(
      (Option("ns1"), Option("u1"), Option(ts(10)), 1.0),
      (Option("ns1"), Option("u1"), None, 8.0), // null right time: skipped
      (Option.empty[String], Option("u1"), Option(ts(5)), 7.0), // null key
      (Option("ns2"), Option("u1"), Option(ts(15)), 2.0))
      .toDF("ns", "user", "t", "v")
    val out = AsofJoin.asofMerge(left, right, Seq("ns", "user"), "t", "t",
        Seq("v"))
      .select(col("id"), col("asof_v"))
      .as[(Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(out == Seq(1L -> Some(1.0), 2L -> None, 3L -> None))
  }

  test("result is stable under (mis)matched input pre-partitioning") {
    val (left, right) = fixtures
    val base = AsofJoin.asofMerge(left, right, Seq("user"), "t", "t", Seq("v"))
      .orderBy("id").collect().toSeq
    val variants = Seq(
      (left.repartition(7), right.repartition(3)),
      (left.repartition(5, col("user")), right),
      (left, right.repartition(2, col("user"))))
    variants.foreach { case (l, r) =>
      val out = AsofJoin.asofMerge(l, r, Seq("user"), "t", "t", Seq("v"))
        .orderBy("id").collect().toSeq
      assert(out == base)
    }
  }

  test("plan shape: AsofMergeJoin node, one exchange per side, no window") {
    val (left, right) = fixtures
    val plan = executedPlan(
      AsofJoin.asofMerge(left, right, Seq("user"), "t", "t", Seq("v")))
    assert(plan.contains("AsofMergeJoin"), s"custom node must plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).length
    assert(exchanges <= 2, s"one exchange per side only:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      s"merge join replaces the window/union machinery:\n$plan")
  }

  test("column pruning pushes through the custom node to the parquet scan") {
    import graft.queries.Tables
    val d = "/root/testdata/sf0.001"
    val e = Tables.events(spark, d)
    // deliberately FULL-WIDTH left side: the pruning rule, not the query
    // author, must cut props/event_type before the scan
    val purchases = e.filter(col("event_type") === "purchase")
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    val out = graft.operators.AsofJoin
      .asofMerge(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("value"))
      .select(col("event_id"), col("asof_value"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    val plan = out.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    val scanSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toSeq
    assert(scanSchemas.nonEmpty)
    scanSchemas.foreach { s =>
      assert(!s.contains("props") && !s.contains("value_double_nope"),
        s"unused wide columns must not reach the scan: $s\n$plan")
    }
    // values unchanged by the rewrite: match the hand-pruned form
    val manual = graft.operators.AsofJoin
      .asofMerge(purchases.select("event_id", "user_id", "ts"), clicks,
        Seq("user_id"), "ts", "ts", Seq("value"))
      .select(col("event_id"), col("asof_value"))
      .collect()
    assert(rows.sortBy(_.getLong(0)).toSeq == manual.sortBy(_.getLong(0)).toSeq)
  }

  test("ev_asof_click_merge equals ev_asof_click on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val a = graft.queries.EventQueries.qAsofClick(spark, d).collect().toSeq
    val b = graft.queries.EventQueries.qAsofClickMerge(spark, d).collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("downstream groupBy(keys) reuses the join partitioning — no extra shuffle") {
    val (left, right) = fixtures
    val df = AsofJoin.asofMerge(left, right, Seq("user"), "t", "t", Seq("v"))
      .groupBy("user").agg(sum("asof_v").as("s"))
    val plan = executedPlan(df)
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).length
    assert(exchanges <= 2,
      s"asof output partitioning must feed the aggregate directly:\n$plan")
  }
}
