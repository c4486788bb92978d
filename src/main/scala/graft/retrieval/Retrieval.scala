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

  /** Score a corpus scope against a query vector with optional metadata
    * filters: scalar columns by equality, array columns (topics) by
    * membership — the Spark twin of the reference's shredded-list SAI
    * match (GraphRetrieverFactory.py:54-59). */
  def score(
      corpus: DataFrame,
      queryVec: Array[Float],
      scope: String,
      filters: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.types.ArrayType
    val filtered = filters.foldLeft(corpus.filter(col("scope") === scope)) {
      case (df, (k, v)) => df.schema(k).dataType match {
        case _: ArrayType => df.filter(array_contains(col(k), v))
        case _ => df.filter(col(k) === v)
      }
    }
    filtered.withColumn("score", cosine(col("embedding"), typedlit(queryVec)))
  }

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
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // per-key type dispatch: string columns match by equality, string-array
    // columns by overlap; anything else is a caller error
    val isArrayKey: Map[String, Boolean] = edgeKeys.map { k =>
      k -> (scored.schema(k).dataType match {
        case ArrayType(StringType, _) => true
        case StringType => false
        case other => throw new IllegalArgumentException(
          s"edge key '$k' must be string or array<string>, got $other")
      })
    }.toMap
    val idCols = ("rowId" +: edgeKeys).map(col)
    var frontier = seeds.select(idCols: _*).collect()
    val visited = scala.collection.mutable.Set(frontier.map(_.getString(0)): _*)
    val resultIds = scala.collection.mutable.ArrayBuffer(visited.toSeq: _*)
    var depth = 0
    while (depth < caps.maxDepth && frontier.nonEmpty) {
      val conds = edgeKeys.zipWithIndex.flatMap { case (k, i) =>
        if (isArrayKey(k)) {
          val vals = frontier.iterator
            .flatMap(r => if (r.isNullAt(i + 1)) Nil else r.getSeq[String](i + 1))
            .filter(_.nonEmpty).toSeq.distinct
          if (vals.isEmpty) None
          else Some(arrays_overlap(col(k), typedlit(vals)))
        } else {
          val vals = frontier.iterator
            .map(r => if (r.isNullAt(i + 1)) "" else r.getString(i + 1))
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
          .select(idCols: _*)
          .collect()
        visited ++= hop.map(_.getString(0))
        resultIds ++= hop.map(_.getString(0))
        frontier = hop
        depth += 1
      }
    }
    scored.filter(col("rowId").isin(resultIds.toSeq: _*))
      .orderBy(col("score").desc, col("rowId")).limit(caps.k)
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

  /** Full retrieval for one query string. */
  def retrieve(
      corpus: DataFrame,
      embedder: Embedder,
      query: String,
      scope: String,
      filters: Map[String, String] = Map.empty,
      expand: Boolean = true,
      strategy: Strategy = Eager): Seq[Retrieved] = {
    val caps = capsByScope.getOrElse(scope, Caps(10, 3, 8, 2))
    val qv = embedder.embed(query)
    // The expansion loop fires several actions over the scored slice
    // (seed top-k, per-hop joins, final collect) — persist it once so the
    // scan+cosine runs once, not once per action.
    val scored = score(corpus, qv, scope, filters).persist()
    try {
      val seeds = topK(scored, caps.startK)
      val pool = if (expand) graphExpand(scored, seeds, caps) else topK(scored, caps.k)
      strategy match {
        case Eager => collectRetrieved(pool)
        case Mmr(lambda) =>
          // pool is ≤ k rows by construction — the greedy re-rank is a
          // driver loop over the collected candidates + their embeddings
          val withVecs = pool
            .select(col("rowId"), col("scope"), col("namespace"), col("repo"),
              col("module"), col("filePath"), col("text"), col("topics"),
              col("score"), col("embedding"))
            .collect()
            .map(r => (Retrieved(
              r.getString(0), r.getString(1), r.getString(2), r.getString(3),
              r.getString(4), r.getString(5), r.getString(6),
              r.getSeq[String](7), r.getDouble(8)),
              r.getSeq[Float](9).toArray))
          mmrSelect(withVecs.toSeq, caps.k, lambda)
      }
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

  private def collectRetrieved(df: DataFrame): Seq[Retrieved] = {
    df.select("rowId", "scope", "namespace", "repo", "module", "filePath",
      "text", "topics", "score")
      .collect()
      .map(r => Retrieved(
        r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getString(6),
        r.getSeq[String](7), r.getDouble(8)))
      .toSeq
  }
}
