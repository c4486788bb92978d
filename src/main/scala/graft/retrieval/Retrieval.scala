package graft.retrieval

import graft.functions.VectorFunctions.cosine
import graft.llm.Embedder
import graft.model.Retrieved
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval over the node corpus (SURVEY §2.7 J3-J4, §2.8 T1-T5).
  *
  * The query path is: metadata pre-filter (pushed into the parquet scan —
  * scope is a partition column, so non-matching scopes are never read) →
  * codegen'd cosine against the broadcast query vector → top-k via
  * orderBy+limit (TakeOrderedAndProject: per-partition heap, no global
  * sort) → optional graph expansion → dedup → final top-k.
  *
  * At 100 TB: the corpus never shuffles; each hop of graph expansion
  * broadcasts the (tiny) frontier's edge values and re-scans only the
  * scope partition, which is the same access path Cassandra SAI gives the
  * reference, expressed as partition pruning + predicate pushdown.
  */
object Retrieval {

  /** Breadth caps per scope (reference agent_graph.py:171-176). */
  case class Caps(k: Int, startK: Int, adjacentK: Int, maxDepth: Int)
  val capsByScope: Map[String, Caps] = Map(
    "repo" -> Caps(10, 2, 6, 2),
    "module" -> Caps(8, 2, 6, 2),
    "file" -> Caps(8, 2, 6, 2),
    "chunk" -> Caps(10, 3, 8, 2),
    "catalog" -> Caps(10, 3, 8, 2))

  /** Caps for a scope, with the shared default — single-sourced so the
    * sequential and batched paths can never cap differently. */
  def capsFor(scope: String): Caps =
    capsByScope.getOrElse(scope, Caps(10, 3, 8, 2))

  /** Scope slice + metadata filters: scalar columns by equality, array
    * columns (topics) by membership — the Spark twin of the reference's
    * shredded-list SAI match (GraphRetrieverFactory.py:54-59).
    * Single-sourced: every retrieval path (sequential score, both
    * batched group forms, the batched seed path) must filter
    * identically or the parity gates lose their meaning. */
  def scopedFiltered(
      corpus: DataFrame,
      scope: String,
      filters: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.types.ArrayType
    filters.foldLeft(corpus.filter(col("scope") === scope)) {
      case (df, (k, v)) => df.schema(k).dataType match {
        case _: ArrayType => df.filter(array_contains(col(k), v))
        case _ => df.filter(col(k) === v)
      }
    }
  }

  /** Score a corpus scope against a query vector with optional metadata
    * filters ([[scopedFiltered]] semantics). */
  def score(
      corpus: DataFrame,
      queryVec: Array[Float],
      scope: String,
      filters: Map[String, String] = Map.empty): DataFrame =
    scopedFiltered(corpus, scope, filters)
      .withColumn("score", cosine(col("embedding"), typedlit(queryVec)))

  /** J4 + T1/T2: exact top-k by cosine. */
  def topK(scored: DataFrame, k: Int): DataFrame =
    scored.orderBy(col("score").desc, col("rowId")).limit(k)

  /** J3: iterative graph expansion. Nodes connect iff they agree on an
    * edge key — scalar keys (namespace/repo/module/filePath) by equality,
    * array keys (topics/imports/labels) by element overlap, matching the
    * reference's shredded-list traversal
    * (GraphRetrieverFactory.py:54-59,100-144). The frontier is tiny by
    * construction (≤ startK, then ≤ adjacentK rows per hop), so each hop
    * collects it and pushes the edge values down as `isin` /
    * `arrays_overlap` predicates — a point-lookup the scan/index layer can
    * serve (the Spark twin of the reference's Cassandra SAI metadata
    * lookup, graph_rag_retrievers.py:82-134) rather than a broadcast-join
    * over the full scope. Keeps the best `adjacentK` new nodes per hop by
    * score, up to `maxDepth` hops; result is seeds ∪ expansion capped at
    * `k`.
    */
  def graphExpand(
      scored: DataFrame,
      seeds: DataFrame,
      caps: Caps,
      edgeKeys: Seq[String] = Seq("repo", "module", "filePath", "topics")): DataFrame = {
    val rows = expandRows(scored, seeds.collect(), caps, edgeKeys)
    scored.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava),
      scored.schema)
  }

  /** Driver-side expansion core: each hop collects the ≤ adjacentK best
    * new rows in full (the frontier is tiny by construction), so the
    * final pool needs NO extra Spark job to re-fetch it — one job per hop
    * plus the seed top-k is the whole cost. Returns the pooled rows
    * sorted (score desc, rowId) and capped at `caps.k`. */
  private[graft] def expandRows(
      scored: DataFrame,
      seedRows: Array[org.apache.spark.sql.Row],
      caps: Caps,
      edgeKeys: Seq[String]): Array[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val schema = scored.schema
    // per-key type dispatch: string columns match by equality, string-array
    // columns by overlap; anything else is a caller error
    val isArrayKey: Map[String, Boolean] = edgeKeys.map { k =>
      k -> (schema(k).dataType match {
        case ArrayType(StringType, _) => true
        case StringType => false
        case other => throw new IllegalArgumentException(
          s"edge key '$k' must be string or array<string>, got $other")
      })
    }.toMap
    val keyIdx = edgeKeys.map(k => k -> schema.fieldIndex(k)).toMap
    val idIdx = schema.fieldIndex("rowId")
    val scoreIdx = schema.fieldIndex("score")
    var frontier = seedRows
    val visited = scala.collection.mutable.Set(frontier.map(_.getString(idIdx)): _*)
    val pool = scala.collection.mutable.ArrayBuffer(frontier.toSeq: _*)
    var depth = 0
    while (depth < caps.maxDepth && frontier.nonEmpty) {
      val conds = edgeKeys.flatMap { k =>
        val i = keyIdx(k)
        if (isArrayKey(k)) {
          val vals = frontier.iterator
            .flatMap(r => if (r.isNullAt(i)) Nil else r.getSeq[String](i))
            .filter(_.nonEmpty).toSeq.distinct
          if (vals.isEmpty) None
          else Some(arrays_overlap(col(k), typedlit(vals)))
        } else {
          val vals = frontier.iterator
            .map(r => if (r.isNullAt(i)) "" else r.getString(i))
            .filter(_.nonEmpty).toSeq.distinct
          if (vals.isEmpty) None else Some(col(k).isin(vals: _*))
        }
      }
      if (conds.isEmpty) { frontier = Array.empty }
      else {
        val hop = scored
          .filter(conds.reduce(_ || _) && !col("rowId").isin(visited.toSeq: _*))
          .orderBy(col("score").desc, col("rowId"))
          .limit(caps.adjacentK)
          .collect()
        visited ++= hop.map(_.getString(idIdx))
        pool ++= hop
        frontier = hop
        depth += 1
      }
    }
    pool.sortBy(r => (-r.getDouble(scoreIdx), r.getString(idIdx)))
      .take(caps.k).toArray
  }

  /** T4+T5: union query-expansion results, dedup by text hash, keep best
    * score per distinct text. */
  def unionDedup(results: Seq[DataFrame], k: Int): DataFrame = {
    val all = results.reduce(_ unionByName _)
    val ranked = all
      .withColumn("textHash", xxhash64(col("text")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("textHash"))
          .orderBy(col("score").desc, col("rowId"))))
      .filter(col("rn") === 1)
      .drop("rn", "textHash")
    ranked.orderBy(col("score").desc, col("rowId")).limit(k)
  }

  /** Retrieval strategies (reference GraphRetrieverFactory.py:148-161):
    * Eager = score-ordered pool; Mmr = greedy diversity re-rank of the
    * expanded pool (the worker shipped Eager everywhere; the factory
    * declares MMR with lambda_mult 0.3-0.4). */
  sealed trait Strategy
  case object Eager extends Strategy
  case class Mmr(lambdaMult: Double = 0.35) extends Strategy

  /** One retrieval's docs plus whether the scoped slice was exhausted:
    * the seed top-k came back short of its limit, so the (scope, filters)
    * slice holds fewer rows than that limit and EVERY row is already in
    * the pool — re-querying the same slice with a different query vector
    * returns the identical row set. Callers (the agent loop's
    * under-retrieval expansion) use this to skip pointless re-queries. */
  case class Result(docs: Seq[Retrieved], exhausted: Boolean)

  /** Full retrieval for one query string. */
  def retrieve(
      corpus: DataFrame,
      embedder: Embedder,
      query: String,
      scope: String,
      filters: Map[String, String] = Map.empty,
      expand: Boolean = true,
      strategy: Strategy = Eager): Seq[Retrieved] =
    retrieveResult(corpus, embedder, query, scope, filters, expand, strategy).docs

  /** [[retrieve]] with the exhausted-slice signal. */
  def retrieveResult(
      corpus: DataFrame,
      embedder: Embedder,
      query: String,
      scope: String,
      filters: Map[String, String] = Map.empty,
      expand: Boolean = true,
      strategy: Strategy = Eager): Result = {
    val caps = capsFor(scope)
    val qv = embedder.embed(query)
    // The expansion loop fires several actions over the scored slice
    // (seed top-k, then one per hop) — persist it once so the scan+cosine
    // runs once, not once per action.
    val scored = score(corpus, qv, scope, filters).persist()
    try {
      val schema = scored.schema
      val (pool, exhausted) =
        if (expand) {
          val seedRows = topK(scored, caps.startK).collect()
          (expandRows(scored, seedRows, caps,
            Seq("repo", "module", "filePath", "topics")),
            seedRows.length < caps.startK)
        } else {
          val rows = topK(scored, caps.k).collect()
          (rows, rows.length < caps.k)
        }
      val idx = Seq("rowId", "scope", "namespace", "repo", "module",
        "filePath", "text", "topics", "score", "embedding")
        .map(schema.fieldIndex)
      val withVecs = pool.map { r =>
        (Retrieved(
          r.getString(idx(0)), r.getString(idx(1)), r.getString(idx(2)),
          r.getString(idx(3)), r.getString(idx(4)), r.getString(idx(5)),
          r.getString(idx(6)), r.getSeq[String](idx(7)), r.getDouble(idx(8))),
          r.getSeq[Float](idx(9)).toArray)
      }
      val docs = strategy match {
        case Eager => withVecs.map(_._1).toSeq
        case Mmr(lambda) =>
          // pool is ≤ k rows by construction — the greedy re-rank is a
          // driver loop over the collected candidates + their embeddings
          mmrSelect(withVecs.toSeq, caps.k, lambda)
      }
      Result(docs, exhausted)
    } finally scored.unpersist(blocking = false)
  }

  /** Hybrid dense+sparse retrieval over a corpus scope — the serving-side
    * twin of `SearchQueries.qHybridRrf`, plugged into the node-corpus
    * layout the agent loop reads. Two candidate lists come off the SAME
    * scope scan (cosine against the broadcast query vector; a lexical
    * score from the query's literal terms evaluated per row inside
    * codegen — `Σ_t ln(1 + tf_t)`, the df-free BM25 kernel, since a
    * scoped slice is one "document collection" and the query carries few
    * terms), each reduced to its top-k by TakeOrdered; the ≤ 2k union is
    * fused driver-side by reciprocal rank (1/(60+r)). Exact identifiers
    * and rare tokens that embeddings smear — the classic dense-retrieval
    * failure — surface through the lexical list (asserted in
    * RetrievalSpec on a crafted corpus). Cost: ONE extra scan-local
    * aggregate over the already-filtered scope, no new shuffle. */
  def retrieveHybridRrf(
      corpus: DataFrame,
      embedder: Embedder,
      query: String,
      scope: String,
      filters: Map[String, String] = Map.empty,
      k: Int = 10): Seq[Retrieved] = {
    val qv = embedder.embed(query)
    val terms = query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    val scored = score(corpus, qv, scope, filters)
      .withColumn("kscore", terms.map { t =>
        log(lit(1.0) + size(filter(split(lower(col("text")), "\\s+"),
          x => x === lit(t))).cast("double"))
      }.reduceOption(_ + _).getOrElse(lit(0.0)))
      .persist()
    try {
      def ranks(c: Column): Map[String, Int] =
        scored.orderBy(c.desc, col("rowId")).limit(k)
          .select(col("rowId")).collect()
          .map(_.getString(0)).zipWithIndex.map { case (id, i) => id -> (i + 1) }
          .toMap
      val vr = ranks(col("score"))
      val kr = ranks(col("kscore"))
      val rrf: Map[String, Double] = (vr.keySet ++ kr.keySet).map { id =>
        id -> (vr.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          kr.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0))
      }.toMap
      val keep = rrf.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
      val byId = keep.map(_._1).toSet
      val schema = scored.schema
      val idx = Seq("rowId", "scope", "namespace", "repo", "module",
        "filePath", "text", "topics", "score").map(schema.fieldIndex)
      val rows = scored.filter(col("rowId").isin(byId.toSeq: _*)).collect()
        .map { r =>
          Retrieved(
            r.getString(idx(0)), r.getString(idx(1)), r.getString(idx(2)),
            r.getString(idx(3)), r.getString(idx(4)), r.getString(idx(5)),
            r.getString(idx(6)), r.getSeq[String](idx(7)), r.getDouble(idx(8)))
        }.map(d => d.rowId -> d).toMap
      keep.flatMap { case (id, s) => rows.get(id).map(_.copy(score = s)) }
    } finally scored.unpersist(blocking = false)
  }

  /** MMR re-rank (reference GraphRetrieverFactory.py:152-161 declares it;
    * the worker used Eager — both supported here). Greedy
    * relevance-vs-diversity selection over the scored pool; pool is
    * already ≤ k so this is a driver-side loop by design. */
  def mmrSelect(
      pool: Seq[(Retrieved, Array[Float])],
      k: Int,
      lambdaMult: Double = 0.35): Seq[Retrieved] = {
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Retrieved, Array[Float])]
    val remaining = scala.collection.mutable.ArrayBuffer(pool: _*)
    while (selected.length < k && remaining.nonEmpty) {
      val best = remaining.maxBy { case (r, v) =>
        val maxSim = if (selected.isEmpty) 0.0
        else selected.map(s => cosineLocal(v, s._2)).max
        lambdaMult * r.score - (1 - lambdaMult) * maxSim
      }
      selected += best
      remaining -= best
    }
    selected.map(_._1).toSeq
  }

  private[graft] def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length && i < b.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

}
