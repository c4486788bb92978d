package graft

import graft.functions.{HashKernels, Kmv, SketchFunctions}
import graft.queries.EventQueries
import org.apache.spark.sql.functions._

/** Mergeable KMV distinct sketch (KmvAgg / ev_reach_intersect_gate):
  * the engine sketch equals the driver-computed k smallest hashes
  * exactly (and is partitioning-invariant — merge is order-free set
  * algebra), under-full sketches are exact, the estimators hit
  * measured tolerances on planted overlaps, and the audience-overlap
  * gate holds on testdata. Oracle parity vs DuckDB is the driver gate.
  */
class KmvSpec extends SparkSpec {

  private val K = 1024

  private def driverSketch(keys: Seq[Long], k: Int): Array[Long] =
    keys.distinct.map(HashKernels.hashLong).sorted.take(k).toArray

  test("sketch equals the k smallest driver hashes, any partitioning") {
    import spark.implicits._
    val keys = (0L until 20000L).map(_ * 7919L % 100003L)
    val df = keys.toDF("user_id")
    def sk(d: org.apache.spark.sql.DataFrame): Array[Long] =
      d.agg(SketchFunctions.kmvSketch(col("user_id"), K))
        .head().getSeq[Long](0).toArray
    val want = driverSketch(keys, K)
    assert(sk(df).toSeq == want.toSeq)
    assert(sk(df.repartition(17)).toSeq == want.toSeq,
      "merge must be partitioning-invariant")
  }

  test("under-full sketch is the exact distinct set; estimate is exact") {
    import spark.implicits._
    val keys = Seq(1L, 2L, 3L, 2L, 1L, 9L)
    val got = keys.toDF("user_id")
      .agg(SketchFunctions.kmvSketch(col("user_id"), K))
      .head().getSeq[Long](0).toArray
    assert(got.toSeq == driverSketch(keys, K).toSeq)
    assert(got.length == 4)
    assert(Kmv.estimate(got, K) == 4.0)
  }

  test("planted overlap: estimate within the gate budget") {
    // |A| = 30k, |B| = 25k, |A ∩ B| = 10k
    val a = driverSketch((0L until 30000L), K)
    val b = driverSketch((20000L until 45000L), K)
    val estI = Kmv.intersection(a, b, K)
    assert(math.abs(estI - 10000.0) <= 0.15 * 10000.0,
      s"intersection estimate $estI vs exact 10000")
    val estU = Kmv.estimate(Kmv.union(a, b, K), K)
    assert(math.abs(estU - 45000.0) <= 0.15 * 45000.0,
      s"union estimate $estU vs exact 45000")
    val j = Kmv.jaccard(a, b, K)
    assert(math.abs(j - 10000.0 / 45000.0) <= 0.05, s"jaccard $j vs ${10000.0 / 45000.0}")
  }

  test("testdata: every overlap estimate clears its budget") {
    val m = EventQueries.reachIntersectMeasured(spark, "/root/testdata/sf0.001")
    m.foreach { case (pair, exact, budget, est, ok) =>
      info(f"$pair%-15s exact=$exact%6d est=$est%9.1f budget=$budget")
      assert(ok, s"$pair: estimate $est vs exact $exact outside $budget")
    }
    assert(m.map(_._1) == Seq("view_click", "click_purchase", "view_purchase"))
  }
}
