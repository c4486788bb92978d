package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Synchronous label propagation (dd_lpa): a hand-traced two-community
  * graph and the partition-refinement relation to connected components.
  * Oracle parity vs DuckDB's chained-CTE rounds is the driver gate.
  */
class LpaSpec extends SparkSpec {

  test("two triangles bridged by one edge resolve to their own communities") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6}, bridge 3-4. Hand-traced 4-round
    // synchronous LPA with min-tiebreak: {1,2,3}->1, {4,5,6}->3.
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val got = DedupQueries.lpaLabels(pairs, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"got $got")
  }

  test("LPA refines the simhash connected components on testdata") {
    val sf = "/root/testdata/sf0.001"
    val lpa = DedupQueries.qDedupLpa(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa.nonEmpty)
    val pairs = DedupQueries.queries("dd_simhash")(spark, sf)
      .select("doc_a", "doc_b")
    val cc = DedupQueries.componentLabels(spark, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every LPA community lives inside one connected component: two
    // nodes sharing an LPA label must share a CC label (refinement)
    lpa.groupBy(_._2).values.foreach { members =>
      val comps = members.keys.map(cc).toSet
      assert(comps.size == 1,
        s"LPA community spans components: ${members.keys.toSeq.sorted}")
    }
    // and LPA must not be coarser than CC overall
    assert(lpa.values.toSet.size >= cc.values.toSet.size)
  }

  test("deterministic across evaluations") {
    val sf = "/root/testdata/sf0.001"
    val a = DedupQueries.qDedupLpa(spark, sf).collect().toSeq
    assert(DedupQueries.qDedupLpa(spark, sf).collect().toSeq == a)
  }
}
