package graft.retrieval

import graft.functions.VectorFunctions.cosine
import graft.llm.Embedder
import graft.model.Retrieved
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-query retrieval fan-out (VERDICT r3 item 4): serve Q concurrent
  * queries from ONE corpus scan per (scope, filters) group per stage,
  * instead of Q independent scans.
  *
  * [[Retrieval.retrieveResult]] runs 1 + maxDepth Spark jobs per query
  * (seed top-k, then one per expansion hop). Fine for one query; for a
  * worker draining its job queue (reference envelope: max_jobs=10
  * concurrent, worker.py:185) the per-query scans are the serving cost —
  * at 100 TB every scan is a pass over the scope partition, so Q queries
  * × (1+depth) scans is Q× more IO than the data requires.
  *
  * The batched shape is the vs_knn_brute pattern applied to the agent
  * loop: broadcast ALL query vectors into the scan (as per-query
  * score/match struct columns — queries ≪ corpus always holds), explode
  * only the matching (row, query) pairs, and take each query's top-k with
  * one window — so each stage is ONE job per (scope, filters) group:
  *   - seeds: every (row, query) pair scored, per-query top-startK;
  *   - hop h: rows matching ANY query's frontier edge values, tagged with
  *     WHICH queries they match (per-query visited-set exclusion folded
  *     into the match column), per-query top-adjacentK.
  * Total jobs = groups × (1 + maxDepth) — independent of Q.
  *
  * Output parity: per query this reproduces [[Retrieval.retrieveResult]]
  * (Eager strategy) exactly — same seed ranking (score desc, rowId), same
  * per-hop frontier/visited semantics, same final pool cap — asserted
  * query-by-query in AgentBatchSpec.
  */
object BatchRetrieval {

  /** One query's retrieval request: id, query text, scope, filters. */
  case class Spec(id: String, query: String, scope: String,
      filters: Map[String, String] = Map.empty)

  /** Plan-size bound per batched stage on the literal path: each query
    * contributes a 384-float literal + a match struct to the stage plan,
    * so a group is capped here and larger batches switch to the
    * relational path (see runGroup), whose plan is O(1) in Q. */
  val MaxGroupQueries = 32

  private val EdgeKeys = Seq("repo", "module", "filePath", "topics")
  /** Row fields carried through collect (everything Retrieved needs; the
    * embedding stays distributed — scores travel in the match structs). */
  private val OutFields = Seq("rowId", "scope", "namespace", "repo",
    "module", "filePath", "text", "topics")

  /** Batched retrieval with graph expansion for all `specs`; returns each
    * query's [[Retrieval.Result]] keyed by spec id. Scan amortization
    * happens WITHIN a (scope, filters) group; ACROSS groups the stage
    * chains are independent, so they run from separate threads and the
    * Spark scheduler overlaps their (many, small) jobs — the same
    * latency-hiding [[graft.streaming.JobStream.runJobs]] uses, composed
    * with the per-group scan sharing. */
  def retrieveAll(
      corpus: DataFrame,
      embedder: Embedder,
      specs: Seq[Spec]): Map[String, Retrieval.Result] = {
    // a singleton group gains nothing from the explode/window machinery —
    // the sequential path (TakeOrdered seeds, per-hop pushdown) IS its
    // optimal plan and the parity reference, so delegate directly.
    // Small groups (≤ MaxGroupQueries) take the literal path: each
    // per-query score/match struct embeds a typedlit query vector, so
    // plan size (and codegen unit size) is linear in the group — fine at
    // the reference envelope (max_jobs=10), a plan-compiler hazard at
    // hundreds. Oversized groups therefore switch to the relational
    // path, which broadcasts the queries/frontier as a TABLE instead of
    // inlining them as literals: plan size O(1) in Q, still one scan per
    // stage.
    def runGroup(scope: String, filters: Map[String, String],
        group: Seq[Spec]): Map[String, Retrieval.Result] =
      if (group.length == 1) {
        val sp = group.head
        Map(sp.id -> Retrieval.retrieveResult(
          corpus, embedder, sp.query, sp.scope, sp.filters))
      } else if (group.length > MaxGroupQueries)
        retrieveGroupRelational(corpus, embedder, scope, filters, group)
      else retrieveGroup(corpus, embedder, scope, filters, group)

    val groups = specs.groupBy(sp => (sp.scope, sp.filters)).toSeq
    if (groups.length <= 1)
      groups.flatMap { case ((scope, filters), group) =>
        runGroup(scope, filters, group)
      }.toMap
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(4, groups.length))
      try {
        import scala.jdk.CollectionConverters._
        val tasks = groups.map { case ((scope, filters), group) =>
          new java.util.concurrent.Callable[Map[String, Retrieval.Result]] {
            override def call(): Map[String, Retrieval.Result] =
              runGroup(scope, filters, group)
          }
        }
        pool.invokeAll(tasks.asJava).asScala.flatMap(_.get()).toMap
      } finally pool.shutdown()
    }
  }

  /** Batched seed-only retrieval (VERDICT r10 item 6 — the rag gates'
    * action-floor remedy): serve every query's `expand = false` pool from
    * ONE scan per (scope, filters) group — the (qid, qvec) table is
    * broadcast into the scope scan, scored by the same codegen cosine,
    * cut per query by the shared rank window — instead of Q independent
    * persist / top-k / unpersist action chains (2 driver actions per
    * query is exactly the scheduler-constant floor the sf1 gates paid).
    * Embeddings ride along in the collect so an [[Retrieval.Mmr]]
    * strategy re-ranks driver-side over exactly the pool
    * [[Retrieval.retrieveResult]] would collect. Per-query parity (ids,
    * scores, order, exhausted flag) with
    * `retrieveResult(expand = false, strategy)` is pinned in
    * AgentBatchSpec for both strategies: the window's (score desc,
    * rowId) rank is TakeOrderedAndProject's ordering, and the cosine
    * doubles are decided by the same codegen kernel over the same float
    * arrays whether the query vector arrives as a broadcast table column
    * or a typedlit. */
  def retrieveAllNoExpand(
      corpus: DataFrame,
      embedder: Embedder,
      specs: Seq[Spec],
      strategy: Retrieval.Strategy = Retrieval.Eager): Map[String, Retrieval.Result] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    specs.groupBy(sp => (sp.scope, sp.filters)).flatMap {
      case ((scope, filters), group) =>
        val caps = Retrieval.capsFor(scope)
        val base = Retrieval.scopedFiltered(corpus, scope, filters)
        val queriesDF = group.map(sp => (sp.id, embedder.embed(sp.query)))
          .toDF("qid", "qvec")
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("rowId"))
        val rows = base.crossJoin(broadcast(queriesDF))
          .withColumn("score", cosine(col("embedding"), col("qvec")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= caps.k)
          .select(col("qid"), col("score"), col("rowId"), col("scope"),
            col("namespace"), col("repo"), col("module"), col("filePath"),
            col("text"), col("topics"), col("embedding"))
          .collect()
        val byQid = rows.toSeq.groupBy(_.getString(0))
        group.map { sp =>
          val pool = byQid.getOrElse(sp.id, Nil)
            .map { r =>
              (Retrieved(r.getString(2), r.getString(3), r.getString(4),
                r.getString(5), r.getString(6), r.getString(7),
                r.getString(8), r.getSeq[String](9), r.getDouble(1)),
                r.getSeq[Float](10).toArray)
            }
            .sortBy { case (d, _) => (-d.score, d.rowId) }
          val docs = strategy match {
            case Retrieval.Eager => pool.map(_._1)
            case Retrieval.Mmr(lambda) =>
              Retrieval.mmrSelect(pool, caps.k, lambda)
          }
          sp.id -> Retrieval.Result(docs.toSeq, pool.length < caps.k)
        }
    }.toMap
  }

  /** All queries of one (scope, filters) group — 1 + maxDepth jobs. */
  private def retrieveGroup(
      corpus: DataFrame,
      embedder: Embedder,
      scope: String,
      filters: Map[String, String],
      group: Seq[Spec]): Map[String, Retrieval.Result] = {
    val caps = Retrieval.capsFor(scope)
    val base = Retrieval.scopedFiltered(corpus, scope, filters)
    val qvs: Seq[(Spec, Array[Float])] =
      group.map(sp => sp -> embedder.embed(sp.query))
    def scoreOf(qv: Array[Float]): Column = cosine(col("embedding"), typedlit(qv))

    // ---- stage 1: seeds — one scan, per-query score, per-query top-startK
    val seedStructs = qvs.map { case (sp, qv) =>
      struct(lit(sp.id).as("qid"), scoreOf(qv).as("score"))
    }
    val seedRows = collectTopPerQuery(
      base.select(OutFields.map(col) :+
        explode(array(seedStructs: _*)).as("m"): _*),
      limit = caps.startK)

    // per-query driver state, mirroring Retrieval.expandRows
    val state = scala.collection.mutable.LinkedHashMap(group.map { sp =>
      val seeds = seedRows.getOrElse(sp.id, Nil)
      sp.id -> QueryState(sp, seeds.toVector,
        frontier = seeds.toVector,
        visited = seeds.map(_._1.rowId).toSet,
        exhausted = seeds.length < caps.startK)
    }: _*)
    val qvById = qvs.map { case (sp, qv) => sp.id -> qv }.toMap

    // ---- expansion hops: one scan per depth serving every active query
    var depth = 0
    while (depth < caps.maxDepth && state.values.exists(_.frontier.nonEmpty)) {
      val active = state.values.filter(_.frontier.nonEmpty).flatMap { st =>
        edgeCondition(st).map(st -> _)
      }.toSeq
      if (active.isEmpty) {
        state.values.foreach(st => st.frontier = Vector.empty)
      } else {
        val matchStructs = active.map { case (st, cond) =>
          struct(lit(st.sp.id).as("qid"), cond.as("ok"),
            scoreOf(qvById(st.sp.id)).as("score"))
        }
        val hopRows = collectTopPerQuery(
          base.filter(active.map(_._2).reduce(_ || _))
            .select(OutFields.map(col) :+
              explode(filter(array(matchStructs: _*),
                m => m.getField("ok"))).as("m"): _*),
          limit = caps.adjacentK)
        state.values.foreach { st =>
          if (st.frontier.nonEmpty) {
            val hop = hopRows.getOrElse(st.sp.id, Nil).toVector
            st.pool ++= hop
            st.visited ++= hop.map(_._1.rowId)
            st.frontier = hop
          }
        }
        depth += 1
      }
    }

    state.map { case (id, st) =>
      id -> Retrieval.Result(
        st.pool.sortBy { case (r, _) => (-r.score, r.rowId) }
          .take(caps.k).map(_._1),
        st.exhausted)
    }.toMap
  }

  /** One frontier/query row of the relational batched path: the query
    * vector plus the hop's edge values and visited set, shipped as a
    * broadcast TABLE row instead of plan literals. Arrays are empty (not
    * null) when a key has no values — `array_contains`/`arrays_overlap`
    * against an empty array is false, which reproduces the literal
    * path's "condition omitted" semantics inside one fixed predicate. */
  private case class FrontierRow(
      qid: String,
      qvec: Array[Float],
      repoVals: Seq[String],
      moduleVals: Seq[String],
      fileVals: Seq[String],
      topicVals: Seq[String],
      visited: Seq[String])

  /** All queries of one (scope, filters) group, relational form (NOTES
    * round-5 candidate 4): the literal path inlines a 384-float
    * `typedlit` and a match condition per query into the stage plan, so
    * analysis/codegen cost is linear in Q and becomes a plan-compiler
    * hazard past ~32 queries. Here each stage instead
    * `crossJoin(broadcast(frontierTable))` — Q tiny rows against the
    * scope scan — and evaluates ONE fixed predicate/score expression
    * over the joined columns, so the plan is O(1) in Q while keeping the
    * one-scan-per-stage amortization. The (row, query) pair volume is
    * identical to the literal path's explode; per-query top-k is the
    * same rank-window (WindowGroupLimit keeps the shuffle at
    * partitions × Q × k rows, not |scan| × Q).
    *
    * Output parity with [[Retrieval.retrieveResult]] per query — same
    * seed ranking, hop semantics, pool cap — asserted in AgentBatchSpec
    * alongside the literal path. */
  private[graft] def retrieveGroupRelational(
      corpus: DataFrame,
      embedder: Embedder,
      scope: String,
      filters: Map[String, String],
      group: Seq[Spec]): Map[String, Retrieval.Result] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val caps = Retrieval.capsFor(scope)
    val base = Retrieval.scopedFiltered(corpus, scope, filters)
    val qvs: Seq[(Spec, Array[Float])] =
      group.map(sp => sp -> embedder.embed(sp.query))

    // ---- stage 1: seeds — every (row, query) pair via broadcast of the
    // (qid, qvec) table; per-query top-startK through the shared window
    val queriesDF = qvs.map { case (sp, qv) => (sp.id, qv) }
      .toDF("qid", "qvec")
    val seedRows = collectTopPerQuery(
      base.crossJoin(broadcast(queriesDF))
        .select(OutFields.map(col) :+
          struct(col("qid"),
            cosine(col("embedding"), col("qvec")).as("score")).as("m"): _*),
      limit = caps.startK)

    val state = scala.collection.mutable.LinkedHashMap(group.map { sp =>
      val seeds = seedRows.getOrElse(sp.id, Nil)
      sp.id -> QueryState(sp, seeds.toVector,
        frontier = seeds.toVector,
        visited = seeds.map(_._1.rowId).toSet,
        exhausted = seeds.length < caps.startK)
    }: _*)
    val qvById = qvs.map { case (sp, qv) => sp.id -> qv }.toMap

    // ---- expansion hops: one scan per depth; the frontier's edge values
    // travel as a broadcast table, matched by ONE fixed predicate
    var depth = 0
    while (depth < caps.maxDepth && state.values.exists(_.frontier.nonEmpty)) {
      val frontierRows = state.values.filter(_.frontier.nonEmpty).flatMap { st =>
        val fr = st.frontier.map(_._1)
        def vals(get: Retrieved => String): Seq[String] =
          fr.map(get).filter(v => v != null && v.nonEmpty).distinct
        val row = FrontierRow(st.sp.id, qvById(st.sp.id),
          vals(_.repo), vals(_.module), vals(_.filePath),
          fr.flatMap(_.topics).filter(_.nonEmpty).distinct,
          st.visited.toSeq.sorted)
        // no edge values at all → the literal path omits the query from
        // the hop job; here its row would match nothing — drop it early
        if (row.repoVals.isEmpty && row.moduleVals.isEmpty &&
          row.fileVals.isEmpty && row.topicVals.isEmpty) None
        else Some(row)
      }.toSeq
      if (frontierRows.isEmpty) {
        state.values.foreach(st => st.frontier = Vector.empty)
      } else {
        val frontierDF = spark.createDataset(frontierRows).toDF()
        val matched =
          (array_contains(col("repoVals"), col("repo")) ||
            array_contains(col("moduleVals"), col("module")) ||
            array_contains(col("fileVals"), col("filePath")) ||
            arrays_overlap(col("topics"), col("topicVals"))) &&
            !array_contains(col("visited"), col("rowId"))
        val hopRows = collectTopPerQuery(
          base.crossJoin(broadcast(frontierDF))
            .filter(matched)
            .select(OutFields.map(col) :+
              struct(col("qid"),
                cosine(col("embedding"), col("qvec")).as("score")).as("m"): _*),
          limit = caps.adjacentK)
        state.values.foreach { st =>
          if (st.frontier.nonEmpty) {
            val hop = hopRows.getOrElse(st.sp.id, Nil).toVector
            st.pool ++= hop
            st.visited ++= hop.map(_._1.rowId)
            st.frontier = hop
          }
        }
        depth += 1
      }
    }

    state.map { case (id, st) =>
      id -> Retrieval.Result(
        st.pool.sortBy { case (r, _) => (-r.score, r.rowId) }
          .take(caps.k).map(_._1),
        st.exhausted)
    }.toMap
  }

  /** Mutable per-query expansion state. `pool` keeps (Retrieved, topics)
    * pairs so frontier edge values need no re-fetch. */
  private case class QueryState(
      sp: Spec,
      var pool: Vector[(Retrieved, Row)],
      var frontier: Vector[(Retrieved, Row)],
      var visited: Set[String],
      exhausted: Boolean)

  /** One query's hop condition: edge-value match (scalar isin / array
    * overlap over the frontier's values, as in Retrieval.expandRows) AND
    * not-yet-visited. None when the frontier carries no edge values. */
  private def edgeCondition(st: QueryState): Option[Column] = {
    val fr = st.frontier.map(_._1)
    val conds = EdgeKeys.flatMap {
      case "topics" =>
        val vals = fr.flatMap(_.topics).filter(_.nonEmpty).distinct
        if (vals.isEmpty) None
        else Some(arrays_overlap(col("topics"), typedlit(vals)))
      case k =>
        val get: Retrieved => String = k match {
          case "repo" => _.repo
          case "module" => _.module
          case "filePath" => _.filePath
        }
        val vals = fr.map(get).filter(v => v != null && v.nonEmpty).distinct
        if (vals.isEmpty) None else Some(col(k).isin(vals: _*))
    }
    if (conds.isEmpty) None
    else Some(conds.reduce(_ || _) && !col("rowId").isin(st.visited.toSeq: _*))
  }

  /** Execute one exploded (row, query) frame: per-query rank by
    * (score desc, rowId), keep ≤ limit, collect, group by query id. */
  private def collectTopPerQuery(
      exploded: DataFrame,
      limit: Int): Map[String, Seq[(Retrieved, Row)]] = {
    val w = Window.partitionBy(col("m.qid"))
      .orderBy(col("m.score").desc, col("rowId"))
    val rows = exploded
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= limit)
      .select(col("m.qid").as("qid"), col("m.score").as("score"),
        col("rowId"), col("scope"), col("namespace"), col("repo"),
        col("module"), col("filePath"), col("text"), col("topics"))
      .collect()
    rows.toSeq.map { r =>
      (r.getString(0), (Retrieved(
        r.getString(2), r.getString(3), r.getString(4), r.getString(5),
        r.getString(6), r.getString(7), r.getString(8),
        r.getSeq[String](9), r.getDouble(1)), r))
    }.groupBy(_._1).map { case (qid, vs) =>
      // preserve rank order within each query (collect may interleave)
      qid -> vs.map(_._2).sortBy { case (ret, _) => (-ret.score, ret.rowId) }
    }
  }
}
