package graft

import graft.queries.DedupQueries

/** The size-gated Jaccard dispatch: both branches are exact and must be
  * row-identical; the gate itself just picks the cheaper plan. */
class DedupDispatchSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("prefix-filtered Jaccard output equals the naive inverted-index join") {
    val naive = DedupQueries.qDedupJaccard(spark, sf).collect().toSeq
    val prefix = DedupQueries.qDedupJaccardPrefixFull(spark, sf).collect().toSeq
    assert(prefix == naive)
  }

  test("gate: small corpus routes dd_jaccard_prefix to the naive plan") {
    // sf0.001 is far below PrefixGateDocs → the dispatched plan must not
    // contain the prefix filter's ranking window
    val p = DedupQueries.qDedupJaccardPrefix(spark, sf)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("window"), p.linesIterator.take(20).mkString("\n"))
  }
}
