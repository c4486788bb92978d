package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** k-core peeling (dd_kcore): crafted graphs exercising the peel
  * cascade, plus the fixed-round-budget-reaches-fixpoint proof on the
  * real sf0.001 pair graph (the pagerank/LPA round-budget contract).
  */
class KcoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def pairsDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("a", "b")
  }

  /** Driver-side peel to TRUE fixpoint. */
  private def refKcore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    var kept = und.map(_._1).toSet
    var changed = true
    while (changed) {
      val deg = und.filter(e => kept(e._1) && kept(e._2))
        .groupBy(_._1).view.mapValues(_.size).toMap
      val next = kept.filter(v => deg.getOrElse(v, 0) >= k)
      changed = next != kept
      kept = next
    }
    und.filter(e => kept(e._1) && kept(e._2))
      .groupBy(_._1).map { case (v, es) => v -> es.size }
  }

  test("a chain hanging off a clique peels away; the clique survives") {
    // 4-clique {1,2,3,4} + chain 4-10-11-12: every chain node has deg<=2,
    // and peeling cascades down the chain (10 only held up by 11, etc.)
    val clique = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val chain = Seq(4L -> 10L, 10L -> 11L, 11L -> 12L)
    val got = DedupQueries.kcoreNodes(pairsDf(clique ++ chain), 3, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core is exactly the clique at clique degree: $got")
  }

  test("a node held up only by peeled neighbors falls with them") {
    // hub 0 touches three deg-1 leaves and one 4-clique member: raw
    // deg(0)=4 >= 3, but after the leaves peel, deg(0)=1 -> 0 peels too
    val clique = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val hub = Seq(0L -> 20L, 0L -> 21L, 0L -> 22L, 0L -> 1L)
    val got = DedupQueries.kcoreNodes(pairsDf(clique ++ hub), 3, 8)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 4L), s"hub 0 cascades out: $got")
  }

  test("k-core broadcast and shuffled kept-set plans agree") {
    // clique + chain + hub: exercises peel cascades on both plans; cap=0
    // forces the shuffled semi-join fallback
    val clique = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val extra = Seq(5L -> 30L, 30L -> 31L, 0L -> 1L, 0L -> 2L, 0L -> 3L)
    def run(cap: Long) =
      DedupQueries.kcoreNodes(pairsDf(clique ++ extra), 3, 8, cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bcast = run(Long.MaxValue)
    val shuffled = run(0L)
    assert(bcast == shuffled, "gate must not change the k-core")
    assert(bcast == refKcore(clique ++ extra, 3).view.mapValues(_.toLong).toMap)
  }

  test("engine output equals the driver-side TRUE fixpoint on sf0.001") {
    // proves the fixed 8-round budget reaches the fixpoint on the real
    // pair graph (rounds beyond convergence are no-ops by monotonicity)
    val pairs = graft.queries.DedupQueries.qDedupSimhash(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = refKcore(pairs, 3)
    val got = DedupQueries.qDedupKcore(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == want, "8 peel rounds reach the true fixpoint")
    assert(got.nonEmpty, "the 3-core is non-empty on this corpus")
    assert(got.size < pairs.flatMap(e => Seq(e._1, e._2)).distinct.size,
      "peeling removes some nodes")
  }

  /** Driver-side 4-truss peel to TRUE fixpoint: (a,b) -> final support. */
  private def refKtruss(edges: Seq[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    var es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    def adj = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def sup(e: (Long, Long), nb: Map[Long, Set[Long]]): Int =
      (nb.getOrElse(e._1, Set.empty) & nb.getOrElse(e._2, Set.empty)).size
    var changed = true
    while (changed) {
      val nb = adj
      val next = es.filter(e => sup(e, nb) >= k - 2)
      changed = next != es
      es = next
    }
    val nb = adj
    es.map(e => e -> sup(e, nb).toLong).toMap
  }

  test("k-truss: bridges between cliques fall; clique cores keep full support") {
    // two 4-cliques joined by one bridge edge: the bridge sits in no
    // triangle and dies; every clique edge keeps support 2
    val c1 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val c2 = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val got = DedupQueries.ktrussEdges(pairsDf(c1 ++ c2 ++ Seq(4L -> 11L)), 4, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == (c1 ++ c2).toSet, s"bridge must peel: ${got.keySet}")
    assert(got.values.forall(_ == 2L), s"clique support is 2 everywhere: $got")
  }

  test("k-truss: mixed-shape graph — both forced join-2 plans and the " +
    "selector's own choice are value-identical (VERDICT r12 item 5)") {
    // a hub (fat adjacency array in one hash range) + degree-1 thin
    // pairs (another range) + two surviving cliques: the shape whose
    // global-average build estimate under-states the hub partition
    val hub = (101L to 140L).map(s => (100L, s))
    val thin = (0 until 50).map(i => (1000L + 2L * i, 1001L + 2L * i))
    val c1 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val c2 = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val edges = hub ++ thin ++ c1 ++ c2
    def result(cap: Long, force: Option[String]) =
      DedupQueries.ktrussEdges(pairsDf(edges), 4, 8,
        maxBroadcastAdjacency = cap, join2Force = force)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = result(Long.MaxValue, None) // broadcast reference
    assert(want.keySet == (c1 ++ c2).toSet && want.values.forall(_ == 2L),
      s"hub and thin edges peel, cliques survive: $want")
    assert(result(0L, None) == want, "selector's own over-cap choice")
    assert(result(0L, Some("shuffle_hash")) == want, "forced SHJ join 2")
    assert(result(0L, Some("merge")) == want, "forced merge join 2")
  }

  test("k-truss: the over-cap shuffled fallback equals the broadcast plan") {
    // gate the broadcast OFF (cap 0) and kill auto-broadcast so the
    // fallback genuinely runs shuffled joins — the result must be
    // identical to the default broadcast path, and the executed plan
    // must carry no broadcast exchange (the OOM the gate prevents)
    val c1 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val c2 = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val edges = c1 ++ c2 ++ Seq(5L -> 11L, 3L -> 20L, 20L -> 21L)
    val want = DedupQueries.ktrussEdges(pairsDf(edges), 4, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the delta peel runs its joins INSIDE the loop behind
      // localCheckpoints, so the returned frame's executedPlan carries no
      // joins to inspect (the old plan-string assertion went vacuous —
      // ADVICE r10). Two replacement probes: the onRound observer must
      // report the merge plan for EVERY round the gate evaluates, and a
      // QueryExecutionListener must see no BroadcastExchange in any plan
      // executed during the run (the checkpoint actions carry the joins).
      val plans = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          plans.add(qe.executedPlan.toString); ()
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      val decisions = scala.collection.mutable.ArrayBuffer.empty[(Int, Boolean)]
      try {
        val fb = DedupQueries.ktrussEdges(pairsDf(edges), 4, 8,
          maxBroadcastAdjacency = 0L,
          onRound = (r, _, bc) => { decisions += ((r, bc)); () })
        val got = fb.collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(got == want, "shuffled fallback must be value-identical")
      } finally spark.listenerManager.unregister(listener)
      assert(decisions.nonEmpty && decisions.forall(!_._2),
        s"the cap-0 gate must pick the merge plan every round: $decisions")
      // the listener bus is async and its waitUntilEmpty is
      // private[spark]: poll until the peel's join plans have landed
      import scala.jdk.CollectionConverters._
      def joinPlans = plans.asScala.toSeq.filter(p =>
        p.contains("SortMergeJoin") || p.contains("array_intersect"))
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (joinPlans.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val joined = joinPlans
      assert(joined.nonEmpty, "the peel's join plans must be observed")
      assert(joined.forall(!_.contains("BroadcastExchange")),
        "fallback must not broadcast the adjacency table")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("k-truss: a triangle strip cascades to empty (each peel starves the next)") {
    // edges 2-3 is in two triangles but loses both when the side edges
    // (support 1) peel — the cascade must run to the empty fixpoint
    val strip = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 2L -> 4L, 3L -> 4L)
    val got = DedupQueries.ktrussEdges(pairsDf(strip), 4, 8).collect()
    assert(got.isEmpty, s"strip must fully cascade: ${got.toSeq}")
  }

  test("k-truss engine output equals the driver-side TRUE fixpoint on sf0.001") {
    val pairs = graft.queries.DedupQueries.qDedupSimhash(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = refKtruss(pairs, 4)
    val got = DedupQueries.qDedupKtruss(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, "8 truss rounds reach the true fixpoint")
    assert(got.nonEmpty, "the 4-truss is non-empty on this corpus")
  }
}
