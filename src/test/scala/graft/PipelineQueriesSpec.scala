package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Dataset-assembly ops: split determinism/shape, mixing-rate bounds,
  * contamination plan shape (oracle equivalence is the driver gate). */
class PipelineQueriesSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("split assignment: exhaustive, deterministic, ~90/5/5") {
    val out = PipelineQueries.qSplitAssign(spark, sf).collect()
    val total = out.map(_.getLong(2)).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs, "every doc gets exactly one split")
    val bySplit = out.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val train = bySplit("train").toDouble / total
    assert(train > 0.8 && train < 0.97, s"train share $train")
    // hash-based: identical across evaluations
    assert(PipelineQueries.qSplitAssign(spark, sf).collect().toSeq == out.toSeq)
  }

  test("mix weights: rates in (0,1], pass-through for the rarest source") {
    val rows = PipelineQueries.qMixWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, rate, eff) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(rate > 0.0 && rate <= 1.0, s"rate $rate")
      assert(eff <= n, "downsampling never upsamples")
    }
    // the most under-represented source is never downsampled
    val rarest = rows.minBy(_.getLong(1))
    assert(rarest.getDouble(2) == 1.0, s"rarest source rate ${rarest.getDouble(2)}")
  }

  test("contamination: eval shingle set broadcasts; corpus never shuffles to the join") {
    val df = PipelineQueries.qContamination(spark, sf)
    df.collect()
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval set must broadcast:\n${plan.linesIterator.take(25).mkString("\n")}")
  }
}
