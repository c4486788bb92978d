package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

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
      ("u1", ts(10), 1.0), // equal-time row: inclusive vs strict
      ("u1", ts(15), 2.0),
      ("u2", ts(9), 9.0), // after left's only row → never matches
      ("u1", ts(15), 5.0)) // duplicate (key, time): max payload wins
      .toDF("user", "t", "v")
    (left, right)
  }

  test("backward asof: inclusive match, null when no prior right row") {
    import spark.implicits._
    val (left, right) = fixtures
    val out = AsofJoin.asofBackward(left, right, Seq("user"), "t", "t", Seq("v"))
      .orderBy("id")
      .select(col("id"), col("asof_v"))
      .as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      1L -> Some(1.0), // equal time included
      2L -> Some(5.0), // latest ≤ 10:20 is 10:15; dup resolved to max payload
      3L -> None, // u2's right row is later
      4L -> None)) // u3 has no right rows
  }

  test("strict mode excludes the equal-timestamp right row") {
    import spark.implicits._
    val (left, right) = fixtures
    val out = AsofJoin.asofBackward(left, right, Seq("user"), "t", "t", Seq("v"),
        strict = true)
      .orderBy("id")
      .select(col("id"), col("asof_v"))
      .as[(Long, Option[Double])].collect().toSeq
    assert(out.head == (1L -> None), "10:10 right row is not strictly earlier")
    assert(out(1) == (2L -> Some(5.0)))
  }

  test("composite keys: matches require agreement on every key column") {
    import spark.implicits._
    val left = Seq((1L, "ns1", "u1", ts(20))).toDF("id", "ns", "user", "t")
    val right = Seq(
      ("ns1", "u1", ts(10), 1.0),
      ("ns2", "u1", ts(15), 2.0)) // same user, different namespace: no match
      .toDF("ns", "user", "t", "v")
    val out = AsofJoin.asofBackward(left, right, Seq("ns", "user"), "t", "t", Seq("v"))
      .select(col("id"), col("asof_v")).as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq(1L -> Some(1.0)),
      s"only the same-(ns,user) right row may match: $out")
  }

  test("result is stable under input repartitioning") {
    val (left, right) = fixtures
    val a = AsofJoin.asofBackward(left, right, Seq("user"), "t", "t", Seq("v"))
      .orderBy("id").collect().toSeq
    val b = AsofJoin.asofBackward(left.repartition(7), right.repartition(3),
        Seq("user"), "t", "t", Seq("v"))
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("single shuffle: one exchange feeds the merge window") {
    val (left, right) = fixtures
    val df = AsofJoin.asofBackward(left, right, Seq("user"), "t", "t", Seq("v"))
    df.collect()
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    // two logical exchanges — the (key, time) right-dedupe agg and the
    // (key) merge window — each printed twice by AQE (initial + final)
    val exchanges = "Exchange hashpartitioning\\(user".r.findAllMatchIn(plan).length
    assert(exchanges <= 4,
      s"asof join must not cascade shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      "no pairwise join: the asof match is the merge window")
  }
}
