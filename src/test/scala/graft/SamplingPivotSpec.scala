package graft

import graft.queries.{EventQueries, PipelineQueries, Tables}
import org.apache.spark.sql.functions._

/** Weighted sampling, pivot matrix, and the approx-quantile gate:
  * semantic invariants + the plan shapes the 100 TB story rests on
  * (oracle equivalence vs DuckDB is the driver gate).
  */
class SamplingPivotSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("weighted sample: exhaustive ranks, deterministic, size-biased") {
    val rows = PipelineQueries.qWeightedSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length),
        "ranks 1..k per stratum, no gaps")
      assert(rs.length <= 10)
    }
    // hash-derived draw: identical across evaluations
    assert(PipelineQueries.qWeightedSample(spark, sf).collect().toSeq == rows.toSeq)
    // w = n_chars biases selection toward longer docs (deterministic on
    // this fixed corpus: sample mean 347.9 vs population 306.3)
    val sampleMean = rows.map(_.getLong(3)).sum.toDouble / rows.length
    val popMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > popMean,
      s"weighted sample not size-biased: $sampleMean <= $popMean")
  }

  test("pivot matrix: dense, cell sums equal the event count, one shuffle") {
    val df = EventQueries.qEventPivot(spark, sf)
    val rows = df.collect()
    val cellSum = rows.map(r => (1 to 5).map(r.getLong).sum).sum
    val total = Tables.events(spark, sf).count()
    assert(cellSum == total, s"pivot cells $cellSum != events $total")
    // explicit value list: the plan is the two-phase pivot agg (partial
    // (day,type) count + pivotfirst, both map-side combinable) plus the
    // orderBy range exchange — and NO values-discovery job before it
    val p = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllMatchIn(
      p.split("== Initial Plan ==")(0)).length
    assert(exchanges <= 3, s"unexpected extra shuffles in pivot plan:\n$p")
    assert(p.contains("pivotfirst"), "explicit-values pivot aggregate expected")
  }

  test("approx-quantile gate: all within budget AND genuinely approximate") {
    val rows = EventQueries.qQuantileGate(spark, sf).collect()
    assert(rows.length == 15, "5 event types x 3 quantiles")
    rows.foreach(r => assert(r.getBoolean(2), s"budget violated on $r"))
    // accuracy=50 must make the sketch actually approximate at this SF —
    // otherwise the gate silently degrades to checking an exact value
    val approx = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, array(0.5, 0.9, 0.99), 50)").as("a"),
        expr("percentile(value, array(0.5, 0.9, 0.99))").as("e"))
      .collect()
    val anyDiff = approx.exists { r =>
      val a = r.getSeq[Double](1); val e = r.getSeq[Double](2)
      a.zip(e).exists { case (x, y) => math.abs(x - y) > 1e-12 }
    }
    assert(anyDiff, "sketch is exact at this SF; gate would be vacuous")
  }
}
