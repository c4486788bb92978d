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

  test("star CC agrees with label propagation on the simhash dup graph") {
    val prop = DedupQueries.qDedupClusters(spark, sf).collect().toSeq
    val stars = DedupQueries.qDedupClustersStars(spark, sf).collect().toSeq
    assert(stars == prop)
  }

  test("star CC contracts a chain graph — the propagation worst case") {
    import spark.implicits._
    // 0-1-2-...-99 single chain (diameter 99), plus an isolated pair
    val chain = (0L until 99L).map(i => (i, i + 1)) :+ (500L, 501L)
    val labels = DedupQueries.componentsStars(spark,
      chain.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 99L).forall(labels(_) == 0L),
      "every chain node must label to the component min")
    assert(labels(500L) == 500L && labels(501L) == 500L)
    assert(labels.size == 102)
  }
}
