package graft.queries

import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword (BM25) and hybrid keyword+vector retrieval over the
  * `documents`/`embeddings` tables — the retrieval modality the reference
  * lacks (its RAG loop is vector-only: `rag_service.py` cosine top-k). A
  * production adopter runs HYBRID search: sparse lexical match catches
  * exact identifiers/rare terms that embeddings smear, dense match catches
  * paraphrase; reciprocal-rank fusion (Cormack et al. 2009, SIGIR — public
  * paper) combines them without score calibration.
  *
  * Scale shape (the part that must survive 100 TB):
  *   - The corpus-side token explode is pruned by a BROADCAST join against
  *     the query-term table BEFORE any aggregation — only postings for
  *     query terms ever shuffle, so the shuffled volume is
  *     O(docs_containing_query_terms), not O(total_tokens). In a served
  *     system the postings table is materialized once (bucketed by term)
  *     and this plan's explode+prune is replaced by an index scan; the
  *     scoring/fusion stages are identical.
  *   - df/idf statistics are tiny (≤ |query terms| rows) and broadcast.
  *   - Per-query top-k is a rank-window over (query_id) — Spark plans the
  *     filter as pre-shuffle WindowGroupLimit, so only k rows per query
  *     per partition reach the exchange (asserted in PlanQualitySpec).
  *   - RRF fusion joins two Q×k rank lists — Q×k rows total, trivially
  *     broadcastable at any corpus size.
  *
  * Determinism across engines: per-(query,doc) BM25 scores are summed in
  * engine-specific order, so ranking compares the score ROUNDED to 4 dp
  * (collapses double ulp/order noise) with doc_id as the total tiebreak;
  * RRF scores are sums of exact rationals 1/(60+rank) from integer ranks,
  * identical in both engines.
  */
object SearchQueries {

  private[graft] val K1 = 1.2
  private[graft] val B = 0.75

  /** (doc_id, text) → (doc_id, w: token array, dl: doc length) — the one
    * tokenization both the batch queries and the streamed index deltas
    * ([[graft.streaming.IndexStream]]) share. */
  private[graft] def tokenizeDocs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("dl"))

  /** documents → (doc_id, w: token array, dl: doc length), persisted
    * once per sf-dir like [[graft.queries.DedupQueries]]'s shingle
    * relation (the ingest-once/query-many lifecycle): profiled at
    * ~10 core-seconds PER PASS to regex-split the corpus, and the ks
    * family runs ~40 such passes per bench evaluation — a production
    * search stack materializes tokenization exactly once (that is what
    * [[bm25Index]] is on disk; this is its in-memory twin). Spread
    * before the kernel (r15, guide §2.5): the split was fused into the
    * single-split scan at bench scale; no-op once the scan is parallel.
    * persist() is MEMORY_AND_DISK, so an over-memory corpus spills
    * rather than OOMs. */
  private val tokenCache = Caches.register(
    scala.collection.concurrent.TrieMap.empty[String, DataFrame])
  private[graft] def tokenized(s: SparkSession, d: String): DataFrame =
    tokenCache.getOrElseUpdate(d,
      tokenizeDocs(Tables.spread(Tables.documents(s, d), col("doc_id")))
        .persist())

  /** BM25 scoring + per-query top-k over INDEX-SHAPED relations —
    * postings (term, doc_id, dl, tf), dfreq (term, df), stats (n_docs,
    * avgdl) — the one scorer behind the stored-table serving path and
    * the streamed index's merge-on-read view. qterms is the (query_id,
    * term) relation (small, broadcast); dfreq/stats broadcast too, so
    * the only corpus-sized input is the (already pruned) postings side. */
  private[graft] def scoreIndex(post: DataFrame, dfreq: DataFrame,
      stats: DataFrame, qterms: DataFrame, k: Int = 5,
      excludeSelf: Boolean = false,
      candidates: Option[DataFrame] = None): DataFrame = {
    // a wt column on qterms scales each term's contribution (the RM3
    // interpolated query model) — same convention as [[bm25Scores]]
    val weighted = qterms.columns.contains("wt")
    // candidates = a (query_id, doc_id) admission set: MaxScore's pruned
    // scoring restricts aggregation to docs the bound says can still
    // reach the top k — the semi-join drops the rest BEFORE the
    // per-(query, doc) shuffle, which is where the pruning saves work
    val joined = post
      .join(broadcast(qterms), "term")
    val admitted = candidates match {
      case Some(c) => joined.join(c, Seq("query_id", "doc_id"), "left_semi")
      case None    => joined
    }
    val base = admitted
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    val sat = col("idf") * (col("tf") * lit(K1 + 1)) /
      (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl")))
    val agg = base
      .withColumn("contrib", if (weighted) col("wt") * sat else sat)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("contrib")), 4).as("score"),
        count(lit(1)).as("n_terms_hit"))
    // query-by-document mode (MoreLikeThis): the seed is its own best
    // match — drop the (q, q) row after aggregation, before ranking
    val scored =
      if (excludeSelf) agg.filter(col("doc_id") =!= col("query_id")) else agg
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score"), col("n_terms_hit"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** BM25 scores for every (query_id, doc_id) sharing ≥1 term.
    *
    * @param qterms (query_id, term) — distinct rows, small (broadcast).
    * @return (query_id, doc_id, score [rounded 4dp], n_terms_hit)
    */
  private[graft] def bm25Scores(docs: DataFrame, qterms: DataFrame,
      k1: Double = K1, b: Double = B): DataFrame = {
    val stats = docs.agg(
      count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // prune the corpus token stream to query terms BEFORE aggregating:
    // the broadcast hash join keeps the explode inside one codegen stage;
    // in weighted mode qterms carries a per-(query, term) wt column that
    // scales each term's contribution (the RM3 interpolated query model)
    val weighted = qterms.columns.contains("wt")
    // tf per (term, doc) — QUERY-INDEPENDENT (r16, guide §2.3/§2.4): the
    // token stream is pruned with a broadcast semi-join and aggregated
    // once per (term, doc); the per-query expansion join then runs on the
    // aggregated postings instead of the raw token stream, and the
    // doc-frequency aggregate reads the same relation directly — the old
    // per-(query, term, doc) aggregate needed a separate distinct pass so
    // a term shared by two queries counted each doc once.
    val tfTd = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .join(broadcast(qterms.select(col("term"))), Seq("term"), "left_semi")
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val postings = tfTd.join(broadcast(qterms), "term")
    val dfreq = tfTd.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val sat = col("idf") * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    postings
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib", if (weighted) col("wt") * sat else sat)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("contrib")), 4).as("score"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** The BM25 core as DuckDB SQL (identical expression structure so both
    * engines evaluate the same arithmetic; `QT` is a (query_id, term)
    * relation the caller splices in). */
  private[graft] def bm25Sql(qtCte: String, k1: Double = K1,
      b: Double = B): String =
    s"""docs AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') w
       |  FROM documents),
       |d2 AS (SELECT doc_id, w, len(w) dl FROM docs),
       |stats AS (SELECT count(*) n_docs, avg(dl) avgdl FROM d2),
       |$qtCte,
       |post AS (
       |  SELECT qt.query_id, qt.term, t.doc_id, t.dl, count(*) tf
       |  FROM (SELECT doc_id, dl, unnest(w) term FROM d2) t
       |  JOIN qt USING (term)
       |  GROUP BY 1, 2, 3, 4),
       |dfreq AS (
       |  SELECT term, count(*) df FROM (SELECT DISTINCT term, doc_id FROM post)
       |  GROUP BY 1),
       |bm25 AS (
       |  SELECT query_id, doc_id,
       |    round(sum(
       |      ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)) *
       |      (tf * ${k1 + 1}::DOUBLE) /
       |      (tf + $k1::DOUBLE * (${1 - b}::DOUBLE + $b::DOUBLE * dl / avgdl))), 4) score,
       |    count(*) n_terms_hit
       |  FROM post JOIN dfreq USING (term), stats
       |  GROUP BY 1, 2)""".stripMargin

  /** Fixed benchmark query set: multi-term lexical queries over the corpus
    * vocabulary. Literal on purpose — a keyword-search eval set is a small
    * fixed relation, exactly like the reference's smoke-test queries. */
  val Bm25Queries: Seq[(Long, String)] = Seq(
    0L -> "hash join",
    1L -> "window merge sort",
    2L -> "stream batch spark",
    3L -> "filter scan table",
    4L -> "vector query data")

  /** BM25 top-5 per query over the fixed query set. */
  def qBm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qterms = Bm25Queries.toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(split(col("qtext"), " ")).as("term")).distinct()
    val scored = bm25Scores(tokenized(s, d), qterms)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score"), col("n_terms_hit"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qBm25Sql: String = {
    val values = Bm25Queries
      .map { case (id, q) => s"(${id}::BIGINT, '$q')" }.mkString(", ")
    s"""WITH ${bm25Sql(
      s"""q(query_id, qtext) AS (VALUES $values),
         |qt AS (
         |  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) term
         |  FROM q)""".stripMargin)},
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) rank
       |  FROM bm25)
       |SELECT query_id, rank::INTEGER AS rank, doc_id, score, n_terms_hit
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Fixed boolean query set: (query_id, must, should, must_not) over
    * the corpus vocabulary — the [[Bm25Queries]] contract. Query 3 has
    * no must clause (pure OR + NOT); query 2 is a pure AND. */
  val BoolQueries: Seq[(Long, Seq[String], Seq[String], Seq[String])] = Seq(
    (0L, Seq("hash", "join"), Seq("sort"), Seq("vector")),
    (1L, Seq("stream"), Seq("window", "merge"), Seq("batch")),
    (2L, Seq("filter", "scan", "table"), Nil, Nil),
    (3L, Nil, Seq("query", "vector"), Seq("data")),
    (4L, Seq("spark", "data"), Seq("batch"), Seq("hash")))

  /** Boolean retrieval (Lucene's BooleanQuery semantics — public
    * Lucene behavior): a document matches iff it contains EVERY `must`
    * term, NO `must_not` term, and — when there are no must clauses —
    * at least one `should` term (minimum_should_match = 1); `should`
    * terms it does contain add BM25 score but are never required.
    * Matching docs rank by the summed BM25 of their (must ∪ should)
    * hits (rounded 4 dp, doc_id tiebreak), top 10 per query.
    *
    * Relational form: ONE clause-tagged (query_id, term, clause) table
    * broadcast-prunes the token stream exactly like [[bm25Scores]];
    * the per-(query, doc) aggregation then counts must/should hits,
    * flags any must_not hit, and sums score in the same pass — AND is
    * `n_must_hit = n_must`, NOT is `any_not = 0`, OR is
    * `n_should_hit >= 1`. No anti-join, no intersect: clause logic
    * rides the one aggregation the scorer already pays, so the plan
    * shape (and its 100 TB story — only postings for query terms ever
    * shuffle) is identical to plain BM25's. */
  def qBoolean(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val clauses = BoolQueries.flatMap { case (id, m, sh, n) =>
      m.map(t => (id, t, "must")) ++ sh.map(t => (id, t, "should")) ++
        n.map(t => (id, t, "not"))
    }.toDF("query_id", "term", "clause")
    val nMust = BoolQueries.map { case (id, m, _, _) => (id, m.size) }
      .toDF("query_id", "n_must")
    val docs = tokenized(s, d)
    val stats = docs.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val postings = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .join(broadcast(clauses), "term")
      .groupBy(col("query_id"), col("term"), col("clause"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = postings.select(col("term"), col("doc_id")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val sat = col("idf") * (col("tf") * lit(K1 + 1)) /
      (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl")))
    val agg = postings
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        when(col("clause") === "not", lit(0.0)).otherwise(sat))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        sum(when(col("clause") === "must", 1L).otherwise(0L)).as("n_must_hit"),
        sum(when(col("clause") === "should", 1L).otherwise(0L)).as("n_should_hit"),
        max(when(col("clause") === "not", 1).otherwise(0)).as("any_not"),
        round(sum(col("contrib")), 4).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    agg.join(broadcast(nMust), "query_id")
      .filter(col("n_must_hit") === col("n_must") && col("any_not") === 0 &&
        (col("n_must") > 0 || col("n_should_hit") >= 1))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"),
        col("n_must_hit"), col("n_should_hit"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qBooleanSql: String = {
    val clauseVals = BoolQueries.flatMap { case (id, m, sh, n) =>
      m.map(t => s"(${id}::BIGINT, '$t', 'must')") ++
        sh.map(t => s"(${id}::BIGINT, '$t', 'should')") ++
        n.map(t => s"(${id}::BIGINT, '$t', 'not')")
    }.mkString(", ")
    val nMustVals = BoolQueries
      .map { case (id, m, _, _) => s"(${id}::BIGINT, ${m.size})" }.mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') w
       |  FROM documents),
       |d2 AS (SELECT doc_id, w, len(w) dl FROM docs),
       |stats AS (SELECT count(*) n_docs, avg(dl) avgdl FROM d2),
       |qt(query_id, term, clause) AS (VALUES $clauseVals),
       |nm(query_id, n_must) AS (VALUES $nMustVals),
       |post AS (
       |  SELECT qt.query_id, qt.term, qt.clause, t.doc_id, t.dl, count(*) tf
       |  FROM (SELECT doc_id, dl, unnest(w) term FROM d2) t
       |  JOIN qt USING (term)
       |  GROUP BY 1, 2, 3, 4, 5),
       |dfreq AS (
       |  SELECT term, count(*) df FROM (SELECT DISTINCT term, doc_id FROM post)
       |  GROUP BY 1),
       |agg AS (
       |  SELECT query_id, doc_id,
       |    sum(CASE WHEN clause = 'must' THEN 1 ELSE 0 END)::BIGINT n_must_hit,
       |    sum(CASE WHEN clause = 'should' THEN 1 ELSE 0 END)::BIGINT n_should_hit,
       |    max(CASE WHEN clause = 'not' THEN 1 ELSE 0 END) any_not,
       |    round(sum(CASE WHEN clause = 'not' THEN 0.0::DOUBLE ELSE
       |      ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)) *
       |      (tf * ${K1 + 1}::DOUBLE) /
       |      (tf + $K1::DOUBLE * (${1 - B}::DOUBLE + $B::DOUBLE * dl / avgdl)) END), 4) score
       |  FROM post JOIN dfreq USING (term), stats
       |  GROUP BY 1, 2),
       |m AS (
       |  SELECT a.query_id, a.doc_id, a.score, a.n_must_hit, a.n_should_hit,
       |    row_number() OVER (
       |      PARTITION BY a.query_id ORDER BY a.score DESC, a.doc_id) rn
       |  FROM agg a JOIN nm USING (query_id)
       |  WHERE a.n_must_hit = nm.n_must AND a.any_not = 0
       |    AND (nm.n_must > 0 OR a.n_should_hit >= 1))
       |SELECT query_id, rn::INTEGER AS rank, doc_id, score,
       |  n_must_hit, n_should_hit
       |FROM m WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** BM25F field split and weights: pseudo-title = the first
    * [[TitleWords]] words, body = the rest; title hits count
    * [[TitleBoost]]×. */
  private val TitleWords = 8
  private val TitleBoost = 2.0

  /** BM25F field-weighted ranking (Robertson, Zaragoza & Taylor 2004,
    * "Simple BM25 extension to multiple weighted fields", CIKM — public
    * paper): per-field term frequencies are length-normalized within
    * their OWN field (each field has its own average length), scaled by
    * the field weight, and summed into one pseudo-frequency t̃f BEFORE
    * saturation — score = Σ_t idf(t) · t̃f / (k1 + t̃f). This is how a
    * real engine boosts title hits without the score blowing up when a
    * term repeats across fields (weighting AFTER saturation — a naive
    * per-field BM25 sum — over-rewards multi-field matches; the paper's
    * point). The synthetic corpus has no field structure, so the
    * harness derives deterministic pseudo-fields (title = first
    * [[TitleWords]] words, body = rest — same construction in the
    * oracle). Doc-level idf (a term's df counts a doc once wherever it
    * appears); top-5 per query on the 4dp-rounded score, doc_id
    * tiebreak ([[qBm25]] contract).
    *
    * Scale shape: identical to [[bm25Scores]] — the field explode is
    * still one pass over the token stream, pruned by the broadcast
    * query-term table before any aggregation; field average lengths are
    * a 2-row broadcast. t̃f sums exactly 2 field rows per (query, term,
    * doc) — IEEE-commutative, so no rounding is needed before
    * saturation. */
  def qBm25F(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qterms = Bm25Queries.toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(split(col("qtext"), " ")).as("term")).distinct()
    val toks = tokenized(s, d)
    val fields = toks.select(col("doc_id"),
        explode(array(
          struct(lit("title").as("fld"), slice(col("w"), 1, TitleWords).as("fw")),
          struct(lit("body").as("fld"),
            slice(col("w"), lit(TitleWords + 1),
              greatest(size(col("w")) - TitleWords, lit(0))).as("fw")))).as("f"))
      .select(col("doc_id"), col("f.fld"), col("f.fw"),
        size(col("f.fw")).as("fdl"))
    val avgF = fields.groupBy(col("fld")).agg(avg(col("fdl")).as("avgdl_f"))
    val stats = toks.agg(count(lit(1)).as("n_docs"))
    // per-(term, doc, field) tf is QUERY-INDEPENDENT (r16, the bm25Scores
    // restructure): aggregate once off the semi-pruned token stream, then
    // expand per query on the aggregated postings
    val tfF = fields
      .select(col("doc_id"), col("fld"), col("fdl"), explode(col("fw")).as("term"))
      .join(broadcast(qterms.select(col("term"))), Seq("term"), "left_semi")
      .groupBy(col("term"), col("doc_id"), col("fld"), col("fdl"))
      .agg(count(lit(1)).as("tf"))
    val postings = tfF.join(broadcast(qterms), "term")
    val dfreq = tfF.select(col("term"), col("doc_id")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tfn = postings
      .join(broadcast(avgF), "fld")
      .withColumn("wf",
        when(col("fld") === "title", lit(TitleBoost)).otherwise(lit(1.0)))
      .groupBy(col("query_id"), col("term"), col("doc_id"))
      .agg(sum(col("wf") * col("tf") /
        (lit(1.0) + lit(B) * (col("fdl") / col("avgdl_f") - lit(1.0)))).as("tft"))
    val scored = tfn
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("idf") * col("tft") / (lit(K1) + col("tft"))), 4).as("score"),
        count(lit(1)).as("n_terms_hit"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"),
        col("n_terms_hit"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qBm25FSql: String = {
    val values = Bm25Queries
      .map { case (id, q) => s"(${id}::BIGINT, '$q')" }.mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') w
       |  FROM documents),
       |d2 AS (SELECT doc_id, w, len(w) dl FROM docs),
       |fields AS (
       |  SELECT doc_id, 'title' fld, w[1:$TitleWords] fw FROM d2
       |  UNION ALL SELECT doc_id, 'body', w[${TitleWords + 1}:len(w)] FROM d2),
       |f2 AS (SELECT doc_id, fld, fw, len(fw) fdl FROM fields),
       |avg_f AS (SELECT fld, avg(fdl) avgdl_f FROM f2 GROUP BY 1),
       |stats AS (SELECT count(*) n_docs FROM d2),
       |q(query_id, qtext) AS (VALUES $values),
       |qt AS (
       |  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) term
       |  FROM q),
       |post AS (
       |  SELECT qt.query_id, qt.term, t.doc_id, t.fld, t.fdl, count(*) tf
       |  FROM (SELECT doc_id, fld, fdl, unnest(fw) term FROM f2) t
       |  JOIN qt USING (term)
       |  GROUP BY 1, 2, 3, 4, 5),
       |dfreq AS (
       |  SELECT term, count(*) df FROM (SELECT DISTINCT term, doc_id FROM post)
       |  GROUP BY 1),
       |tfn AS (
       |  SELECT query_id, term, doc_id,
       |    sum((CASE WHEN fld = 'title' THEN $TitleBoost::DOUBLE
       |         ELSE 1.0::DOUBLE END) * tf /
       |        (1.0::DOUBLE + $B::DOUBLE * (fdl / a.avgdl_f - 1.0::DOUBLE))) tft
       |  FROM post JOIN avg_f a USING (fld) GROUP BY 1, 2, 3),
       |sc AS (
       |  SELECT query_id, doc_id,
       |    round(sum(
       |      ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)) *
       |      tft / ($K1::DOUBLE + tft)), 4) score,
       |    count(*) n_terms_hit
       |  FROM tfn JOIN dfreq USING (term), stats
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) rank
       |  FROM sc)
       |SELECT query_id, rank::INTEGER AS rank, doc_id, score, n_terms_hit
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Feedback docs / expansion terms / interpolation weight for RM3. */
  private val FbDocs = 10
  private val ExpTerms = 8
  private val Lambda = 0.5

  /** RM3 pseudo-relevance-feedback query expansion (Lavrenko & Croft
    * 2001, "Relevance-Based Language Models", SIGIR; the RM3
    * interpolation form from Abdul-Jaleel et al. 2004, TREC — both
    * public papers): run BM25, take the top-[[FbDocs]] feedback docs per
    * query, estimate a relevance model p(t|R) ∝ Σ_d (tf_{t,d}/dl_d)·s_d
    * over them, pick the top-[[ExpTerms]] non-query terms, interpolate
    * original and expansion weights λ : (1−λ), and re-score the corpus
    * with the weighted query. Output: final top-5 per query.
    *
    * Scale shape — the expansion machinery never touches corpus-scale
    * data un-pruned: both corpus passes prune the token stream with a
    * BROADCAST term-table join before aggregating (the [[bm25Scores]]
    * shape), the feedback-doc token pull broadcasts the Q×[[FbDocs]]
    * feedback table into the scan, and every intermediate relation
    * between the passes is O(Q · terms) rows. Two passes over the corpus
    * is the intrinsic cost of pseudo-relevance feedback (the second pass
    * needs postings for terms unknown until the first completes); a
    * served deployment replaces both with stored-index probes
    * ([[qBm25Stored]]'s bucket-pruned scan) and keeps stages 2–3
    * unchanged.
    *
    * Cross-engine determinism: relevance-model weights are rounded to
    * 6 dp BEFORE ranking/normalizing (term tiebreak), final weights
    * rounded to 6 dp, scores to 4 dp with doc_id tiebreak — so both
    * engines select identical expansion terms and identical rankings. */
  def qBm25Rm3(s: SparkSession, d: String): DataFrame = {
    val docs = tokenized(s, d)
    val (_, qterms) = queryTerms(s, Bm25Queries)
    // stage 1: feedback docs = BM25 top-FbDocs per query
    val wfb = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    // materialized (r15): Q×FbDocs rows — the whole stage-1 BM25 plan
    // otherwise nests under stage 2's broadcast and stage 3's query-model
    // broadcast, so the corpus-pass subtree is re-optimized and re-run
    // per consumer (A/B at sf0.1: 7.6 s without, 3.2 s with)
    val fb = bm25Scores(docs, qterms)
      .withColumn("r", row_number().over(wfb))
      .filter(col("r") <= FbDocs)
      .select(col("query_id"), col("doc_id"), col("score"))
      .localCheckpoint()
    // stage 2: relevance model over the feedback docs' tokens. Join the
    // Q×FbDocs feedback list BEFORE the explode (r15, guide §2.3): the
    // optimizer does not push a join below a Generate, so the previous
    // order exploded the whole corpus's tokens and then kept only the
    // feedback docs' — now only those docs ever explode
    val fbt = docs
      .join(broadcast(fb), "doc_id")
      .select(col("doc_id"), col("dl"), col("query_id"), col("score"),
        explode(col("w")).as("term"))
      .groupBy(col("query_id"), col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"),
        max(col("score")).as("score"))
    // the interpolated query model is Q×(|q|+ExpTerms) rows — flatten it
    // too, so stage 3's broadcast builds from a materialized tiny frame
    val scored = bm25Scores(docs, rm3QueryModel(fbt, qterms).localCheckpoint())
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score"), col("n_terms_hit"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** RM3 stages 2–3, shared by the direct and stored paths: per-
    * (query, term, feedback-doc) stats (tf, dl, score) → the interpolated
    * weighted query model (query_id, term, wt). All relations here are
    * O(Q · terms) rows. */
  private def rm3QueryModel(fbt: DataFrame, qterms: DataFrame): DataFrame = {
    val wts = fbt.groupBy(col("query_id"), col("term"))
      .agg(round(sum(col("tf") * col("score") / col("dl")), 6).as("wt"))
    val wexp = Window.partitionBy(col("query_id"))
      .orderBy(col("wt").desc, col("term"))
    val sel = wts.join(qterms, Seq("query_id", "term"), "left_anti")
      .withColumn("r", row_number().over(wexp))
      .filter(col("r") <= ExpTerms)
      .select(col("query_id"), col("term"), col("wt"))
    val qcnt = qterms.groupBy(col("query_id")).agg(count(lit(1)).as("c"))
    val orig = qterms.join(qcnt, "query_id")
      .select(col("query_id"), col("term"),
        round(lit(Lambda) / col("c"), 6).as("wt"))
    val norm = sel.groupBy(col("query_id")).agg(sum(col("wt")).as("s"))
    val expw = sel.join(norm, "query_id")
      .select(col("query_id"), col("term"),
        round(lit(1 - Lambda) * col("wt") / col("s"), 6).as("wt"))
    orig.unionByName(expw)
  }

  /** RM3 served off the STORED index — identical output to [[qBm25Rm3]]
    * (same oracle), the shape a deployment actually runs: the direct
    * path's three corpus passes (tokenize+explode each time) become
    * three bucket-pruned index probes. Stage 1 probes the inverted table
    * by original terms (`In(term,…)` pushed), stage 2 pulls the feedback
    * docs' term stats from the FORWARD table by doc id (`In(doc_id,…)`
    * pushed — no tokenization, no corpus scan), stage 3 probes the
    * inverted table by the expanded term set. The two driver collects
    * are Q×[[FbDocs]] ids and the Q×(|q|+[[ExpTerms]])-row query model —
    * bounded by the query set, independent of corpus size, and intrinsic
    * to the plan: the expansion terms must become scan-pushable
    * literals, exactly like [[qBm25Stored]]'s term list. Measured ~2× the
    * direct path at sf0.1 warm (per-probe overheads dominate at this
    * size); at 100 TB the direct path isn't runnable per-query at all,
    * while every scan here is O(probed postings). */
  def qBm25Rm3Stored(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val idx = bm25Index(s, d)
    val (terms, qterms) = queryTerms(s, Bm25Queries)
    val stats = s.read.parquet(idx.statsPath)
    def post(ts: Seq[String]) =
      s.table(idx.postingsTable).filter(col("term").isin(ts: _*))
    def dfreq(ts: Seq[String]) =
      s.table(idx.dfreqTable).filter(col("term").isin(ts: _*))
    // stage 1: feedback docs off the index (bucket-pruned term probe);
    // collected (≤ Q·FbDocs rows) so their ids become a pushed filter
    val fbRows = scoreIndex(post(terms), dfreq(terms), stats, qterms,
      k = FbDocs)
      .select(col("query_id"), col("doc_id"), col("score")).collect()
    val fbIds = fbRows.map(_.getLong(1)).distinct.toSeq
    val fb = fbRows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.toDF("query_id", "doc_id", "score")
    // stage 2: feedback term stats from the FORWARD index — a
    // bucket-pruned by-doc probe, no tokenization and no corpus scan
    val fbt = s.table(idx.fwdTable)
      .filter(col("doc_id").isin(fbIds: _*))
      .join(broadcast(fb), "doc_id")
      .select(col("query_id"), col("term"), col("tf"), col("dl"),
        col("score"))
    // the query model is collected (≤ Q·(|q|+ExpTerms) rows) so the
    // expanded term set becomes the stage-3 scan's In(term,…) literals
    val qtwRows = rm3QueryModel(fbt, qterms).collect()
    val qtw = qtwRows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq.toDF("query_id", "term", "wt")
    val terms2 = qtwRows.map(_.getString(1)).distinct.toSeq
    scoreIndex(post(terms2), dfreq(terms2), stats, qtw, k = 5)
  }

  val qBm25Rm3Sql: String = {
    val values = Bm25Queries
      .map { case (id, q) => s"(${id}::BIGINT, '$q')" }.mkString(", ")
    s"""WITH ${bm25Sql(
      s"""q(query_id, qtext) AS (VALUES $values),
         |qt AS (
         |  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) term
         |  FROM q)""".stripMargin)},
       |fb AS (
       |  SELECT query_id, doc_id, score FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY score DESC, doc_id) r
       |    FROM bm25) WHERE r <= $FbDocs),
       |fbt AS (
       |  SELECT fb.query_id, t.term, t.doc_id,
       |    count(*) tf, max(t.dl) dl, max(fb.score) score
       |  FROM (SELECT doc_id, dl, unnest(w) term FROM d2) t
       |  JOIN fb USING (doc_id)
       |  GROUP BY 1, 2, 3),
       |wts AS (
       |  SELECT query_id, term, round(sum(tf * score / dl), 6) wt
       |  FROM fbt GROUP BY 1, 2),
       |sel AS (
       |  SELECT query_id, term, wt FROM (
       |    SELECT w.*, row_number() OVER (
       |      PARTITION BY query_id ORDER BY wt DESC, term) r
       |    FROM wts w
       |    WHERE NOT EXISTS (SELECT 1 FROM qt
       |      WHERE qt.query_id = w.query_id AND qt.term = w.term))
       |  WHERE r <= $ExpTerms),
       |qcnt AS (SELECT query_id, count(*) c FROM qt GROUP BY 1),
       |norm AS (SELECT query_id, sum(wt) s FROM sel GROUP BY 1),
       |qtw AS (
       |  SELECT qt.query_id, qt.term, round($Lambda::DOUBLE / c, 6) wt
       |  FROM qt JOIN qcnt USING (query_id)
       |  UNION ALL
       |  SELECT sel.query_id, sel.term,
       |    round(${1 - Lambda}::DOUBLE * wt / s, 6)
       |  FROM sel JOIN norm USING (query_id)),
       |post2 AS (
       |  SELECT qtw.query_id, qtw.term, t.doc_id, t.dl,
       |    count(*) tf, max(qtw.wt) wt
       |  FROM (SELECT doc_id, dl, unnest(w) term FROM d2) t
       |  JOIN qtw ON t.term = qtw.term
       |  GROUP BY 1, 2, 3, 4),
       |dfreq2 AS (
       |  SELECT term, count(*) df
       |  FROM (SELECT DISTINCT term, doc_id FROM post2) GROUP BY 1),
       |rm3 AS (
       |  SELECT query_id, doc_id,
       |    round(sum(wt *
       |      ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)) *
       |      (tf * ${K1 + 1}::DOUBLE) /
       |      (tf + $K1::DOUBLE * (${1 - B}::DOUBLE + $B::DOUBLE * dl / avgdl))), 4) score,
       |    count(*) n_terms_hit
       |  FROM post2 JOIN dfreq2 USING (term), stats
       |  GROUP BY 1, 2)
       |SELECT query_id, rank::INTEGER AS rank, doc_id, score, n_terms_hit
       |FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) rank
       |  FROM rm3)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Hybrid retrieval: dense cosine top-20 and sparse BM25 top-20 fused by
    * reciprocal rank (k=60), top-10 per query. Query docs are ids 0..4:
    * the dense side uses their embedding vectors, the sparse side their
    * first three tokens — the "same information need, two modalities"
    * setup. Self-matches are excluded on both sides. */
  def qHybridRrf(s: SparkSession, d: String): DataFrame = {
    // dense: broadcast 5 query vectors through one corpus scan (the
    // vs_knn_brute shape), top-20 per query
    val emb = Tables.embeddings(s, d)
    val qv = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wv = Window.partitionBy(col("query_id"))
      .orderBy(col("vscore").desc, col("vec_id"))
    val vranks = emb.join(broadcast(qv), col("vec_id") =!= col("query_id"))
      .withColumn("vscore", cosine(col("embedding"), col("qv")))
      .withColumn("vrank", row_number().over(wv))
      .filter(col("vrank") <= 20)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("vrank"))
    // sparse: query terms = first 3 tokens of the query document
    val docs = tokenized(s, d)
    val qterms = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        explode(slice(col("w"), 1, 3)).as("term")).distinct()
    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val kranks = bm25Scores(docs, qterms)
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("krank", row_number().over(wk))
      .filter(col("krank") <= 20)
      .select(col("query_id"), col("doc_id"), col("krank"))
    // fuse: rrf = Σ 1/(60 + rank) over the lists the doc appears in
    val rrf: Column =
      coalesce(lit(1.0) / (lit(60) + col("vrank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("krank")), lit(0.0))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    vranks.join(kranks, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", rrf)
      .withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("rrf"), 6).as("rrf"),
        col("vrank"), col("krank"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qHybridRrfSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
       |qv AS (SELECT vec_id query_id, v qvec FROM e WHERE vec_id < 5),
       |vscored AS (
       |  SELECT qv.query_id, e.vec_id doc_id,
       |    list_cosine_similarity(e.v, qv.qvec) vscore
       |  FROM e, qv WHERE e.vec_id <> qv.query_id),
       |vranks AS (
       |  SELECT query_id, doc_id, vrank FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY vscore DESC, doc_id) vrank
       |    FROM vscored) WHERE vrank <= 20),
       |${bm25Sql(
      """qt AS (
        |  SELECT DISTINCT doc_id query_id, unnest(w[1:3]) term
        |  FROM docs WHERE doc_id < 5)""".stripMargin)},
       |kranks AS (
       |  SELECT query_id, doc_id, krank FROM (
       |    SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY score DESC, doc_id) krank
       |    FROM bm25 WHERE doc_id <> query_id) WHERE krank <= 20),
       |fused AS (
       |  SELECT query_id, doc_id, vrank, krank,
       |    coalesce(1.0::DOUBLE / (60 + vrank), 0.0::DOUBLE) +
       |      coalesce(1.0::DOUBLE / (60 + krank), 0.0::DOUBLE) rrf
       |  FROM vranks FULL OUTER JOIN kranks USING (query_id, doc_id))
       |SELECT query_id, rank::INTEGER AS rank, doc_id, round(rrf, 6) AS rrf,
       |  vrank::INTEGER AS vrank, krank::INTEGER AS krank
       |FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) rank
       |  FROM fused)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Materialized inverted index per sf-dir, stored as BUCKETED tables
    * (VERDICT r4 item 3 — the SAI-index twin,
    * cassandra-initdb-configmap.yaml:22-24): postings and document
    * frequencies both `bucketBy(term)` + sorted by (term, doc_id) within
    * buckets, plus the 1-row corpus stats. Built once per directory — the
    * production lifecycle (index build amortized over every query).
    *
    * Why buckets beat the previous range-partitioned layout:
    *   - The term probe becomes a BUCKET-PRUNED scan: an `In(term, …)`
    *     filter reads only the buckets the terms hash to
    *     (`SelectedBucketsCount` in the scan node, asserted in
    *     SearchQueriesSpec) on top of row-group pruning from the
    *     within-bucket sort.
    *   - Index maintenance is shuffle-free: postings ⋈ dfreq on term is a
    *     zero-exchange bucket join (asserted), and a new postings batch
    *     merges bucket-by-bucket — no re-shuffle of the existing index,
    *     the same property BucketedJoinSpec proves for fact-fact joins.
    */
  /** fwdTable is the FORWARD index — the same (term, doc_id, dl, tf)
    * rows bucketed by doc_id instead of term — so by-document pulls
    * (relevance feedback, document-vector reads) are bucket-pruned
    * probes too, not corpus scans. Search engines keep exactly this pair
    * (inverted + forward/docvalues); storage doubles, and both copies
    * merge bucket-by-bucket under maintenance. */
  case class Bm25Index(postingsTable: String, dfreqTable: String,
                       fwdTable: String, statsPath: String)

  private val indexCache =
    scala.collection.concurrent.TrieMap.empty[String, Bm25Index]

  def bm25Index(s: SparkSession, d: String): Bm25Index = {
    // the planner's DisableUnnecessaryBucketedScan rule turns bucketed
    // reads off when no operator requires the hash distribution — but a
    // pure term-probe still wants the BUCKET PRUNING only a bucketed scan
    // performs (it doesn't weigh pruning, SPARK-32986), so pin it on for
    // sessions serving from this index
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    indexCache.getOrElseUpdate(d, {
      val suffix = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(8)
      val idx = Bm25Index(s"bm25_postings_$suffix", s"bm25_dfreq_$suffix",
        s"bm25_fwd_$suffix",
        java.nio.file.Files.createTempDirectory("bm25idx").toString + "/stats")
      reclaimOrphanTables(s,
        Seq(idx.postingsTable, idx.dfreqTable, idx.fwdTable))
      val docs = tokenized(s, d)
      docs.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
        .write.mode("overwrite").parquet(idx.statsPath)
      docs
        .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "term").sortBy("term", "doc_id")
        .saveAsTable(idx.postingsTable)
      // derive the companion tables from the stored postings — the
      // tokenize+explode pass runs ONCE; dfreq aggregates a zero-exchange
      // bucketed read, and the forward copy is a re-bucket of the stored
      // rows, not a recomputation
      val stored = s.table(idx.postingsTable)
      // per-term metadata: document frequency AND the stored max impact —
      // the largest tf/dl-saturation value any posting of the term
      // reaches (Lucene's "impacts"; the MaxScore upper bound is
      // idf(df) · max_sat, both derivable from this one row at query
      // time). Computed at build over the same double arithmetic the
      // scorer uses, so UB ≥ every per-doc contribution EXACTLY.
      val avgdlB = s.read.parquet(idx.statsPath)
        .select(col("avgdl")).head.getDouble(0)
      val satB = col("tf") * lit(K1 + 1) /
        (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / lit(avgdlB)))
      stored.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"),
          max(satB).as("max_sat"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "term").sortBy("term")
        .saveAsTable(idx.dfreqTable)
      stored
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "doc_id").sortBy("doc_id", "term")
        .saveAsTable(idx.fwdTable)
      idx
    })
  }

  /** BM25 over the STORED index — identical output to [[qBm25]] (same
    * oracle), different physical shape: query terms arrive as an `isin`
    * literal filter, so Catalyst pushes them into the postings scan
    * (`PushedFilters: In(term, …)`, asserted in PlanQualitySpec), bucket
    * pruning skips the buckets no query term hashes to, and the
    * within-bucket term sort prunes row groups — the scan reads
    * O(query-term postings), not the corpus. This is the serving-path
    * twin: at 100 TB the explode+prune of [[qBm25]] is the one-time
    * index build, and THIS plan is what each query pays. */
  /** The (distinct terms, (query_id, term) frame) pair for a query set —
    * the ONE derivation of query tokenization shared by the stored,
    * streamed and compacted serving paths (three copies would let them
    * silently tokenize queries differently). */
  /** Idempotent-rebuild guard shared by every bucketed saveAsTable sink
    * ([[bm25Index]] here; [[graft.streaming.IndexStream.compact]]): a
    * crashed/previous JVM leaves the warehouse directory on disk while
    * the (in-memory) catalog forgets the table, and CREATE then fails
    * with LOCATION_ALREADY_EXISTS — an orphan location with no catalog
    * entry is derelict, so reclaim it before writing. */
  private[graft] def reclaimOrphanTables(s: SparkSession,
      tables: Seq[String]): Unit =
    tables.foreach { t =>
      if (!s.catalog.tableExists(t)) {
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
        val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(wh)) fs.delete(wh, true)
      }
    }

  private[graft] def queryTerms(s: SparkSession,
      queries: Seq[(Long, String)]): (Seq[String], DataFrame) = {
    import s.implicits._
    val terms = queries.flatMap(_._2.split(" ")).distinct
    val qterms = queries.toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(split(col("qtext"), " ")).as("term")).distinct()
    (terms, qterms)
  }

  def qBm25Stored(s: SparkSession, d: String): DataFrame = {
    val idx = bm25Index(s, d)
    val (terms, qterms) = queryTerms(s, Bm25Queries)
    val post = s.table(idx.postingsTable)
      .filter(col("term").isin(terms: _*))
    val dfreq = s.table(idx.dfreqTable)
      .filter(col("term").isin(terms: _*))
    val stats = s.read.parquet(idx.statsPath)
    scoreIndex(post, dfreq, stats, qterms)
  }

  /** Safety margin between the MaxScore bound and the entry threshold:
    * the ranking compares scores ROUNDED to 4 dp, so a doc is provably
    * outside the top k only when its bound sits a full rounding step
    * below the threshold (round4(s) for any s < θ−1e-4 is ≤ θ−1e-4 < θ).
    * The margin also dwarfs summation-order float noise (~1e-12). */
  private val MaxscoreMargin = 1e-4

  /** MaxScore dynamic pruning (Turtle & Flood 1995, "Query evaluation:
    * strategies and optimizations", IP&M — public paper; the per-term
    * stored upper bound is Lucene's impacts metadata) served off the
    * stored index — top-k BM25 WITHOUT scoring every matching document.
    *
    * Where exact scoring aggregates a contribution row for every
    * (query term × posting), MaxScore admits a document to the scoring
    * aggregation only if the bound says it can still reach the top k:
    *   1. UB(q,t) = idf(t) · max_sat(t) — per-term score ceilings from
    *      the dfreq row's stored max impact (build-time metadata, no
    *      corpus work at query time).
    *   2. Seed pass: fully score just the docs matching the single
    *      highest-UB term; the k-th best rounded score is the entry
    *      threshold θ — a true achieved score, so the real k-th best is
    *      ≥ θ. Only trusted when the seed matched ≥ k docs (else no
    *      pruning — graceful degrade to exact).
    *   3. Essential terms: sort the query's terms by UB ascending; the
    *      maximal prefix whose TOTAL UB sum < θ − margin is
    *      non-essential. A doc matching only non-essential terms scores
    *      ≤ that sum, so it cannot enter the top k; every potential
    *      winner matches ≥ 1 essential term.
    *   4. Candidates = docs with ≥ 1 essential-term posting; the full
    *      scoring aggregation runs over candidate postings only.
    * The pruning is LOSSLESS (same oracle as [[qBm25]]): step 3's bound
    * plus the rounding margin proves every pruned doc ranks strictly
    * below rank k under the rounded-score/doc_id order.
    *
    * Scale shape: this is what a served top-k pays at 100 TB — the UB
    * and θ relations are O(|terms|) and O(k·|queries|) (two bounded
    * driver collects, the [[qBm25Rm3Stored]] In-pushdown contract); the
    * seed and candidate probes are bucket-pruned In(term, …) scans; and
    * the one corpus-sized stage left (the per-(query,doc) score shuffle)
    * now moves only candidate rows. High-idf rare terms — exactly the
    * queries whose exact postings volume is dominated by their common
    * co-terms — prune hardest. */
  private[graft] def maxscorePruned(s: SparkSession, d: String)
      : (DataFrame, DataFrame) =
    maxscoreIndex(s, bm25Index(s, d))

  /** [[maxscorePruned]] over ANY impacts-bearing index (the built
    * [[bm25Index]] or a streamed index folded by
    * [[graft.streaming.IndexStream.compact]] — both carry the max_sat
    * column, so pruned serving works identically off either). */
  private[graft] def maxscoreIndex(s: SparkSession, idx: Bm25Index,
      queries: Seq[(Long, String)] = Bm25Queries, k: Int = 5)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val (terms, qterms) = queryTerms(s, queries)
    val post = s.table(idx.postingsTable).filter(col("term").isin(terms: _*))
    val dfreq = s.table(idx.dfreqTable).filter(col("term").isin(terms: _*))
    val stats = s.read.parquet(idx.statsPath)
    // per-(query, term) upper bounds — ≤ |queries|·|terms| rows
    val ub = qterms
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("term"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) * col("max_sat")).as("ub"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq.groupBy(_._1)
    // seed term = the query's highest-UB term (term-string tiebreak)
    val seedDf = ub.map { case (q, ts) =>
      (q, ts.maxBy(t => (t._3, t._2))._2)
    }.toSeq.toDF("query_id", "term")
    val seedDocs = post.join(broadcast(seedDf), "term")
      .select(col("query_id"), col("doc_id"))
    val thetas = scoreIndex(post, dfreq, stats, qterms, k,
        candidates = Some(seedDocs))
      .filter(col("rank") === k)
      .select(col("query_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val essDf = ub.flatMap { case (q, ts) =>
      thetas.get(q) match {
        case None => ts.map(t => (q, t._2)) // seed matched < k docs
        case Some(theta) =>
          val asc = ts.sortBy(t => (t._3, t._2))
          val cum = asc.scanLeft(0.0)(_ + _._3).tail
          asc.zip(cum).collect {
            case (t, c) if c >= theta - MaxscoreMargin => (q, t._2)
          }
      }
    }.toSeq.toDF("query_id", "term")
    val cand = post.join(broadcast(essDf), "term")
      .select(col("query_id"), col("doc_id"))
    (cand,
      scoreIndex(post, dfreq, stats, qterms, k, candidates = Some(cand)))
  }

  /** [[maxscorePruned]]'s ranked result — identical output to [[qBm25]]
    * (same oracle); the hash gate proves the pruning lossless. */
  def qMaxscore(s: SparkSession, d: String): DataFrame =
    maxscorePruned(s, d)._2

  /** Snippet window width, in tokens. */
  private val SnippetW = 8

  /** KWIC snippet extraction (keyword-in-context, Luhn 1960; the
    * best-fragment selection every search engine ships as result
    * highlighting — Lucene's Highlighter picks fragments the same way:
    * maximize query-term coverage, earliest on ties) for the BM25 top-k.
    *
    * For each (query, top-5 doc): candidate windows are the
    * [[SnippetW]]-token spans STARTING at a query-term occurrence (the
    * optimal cover's first term is itself a match, so anchoring at
    * matches loses nothing); the winner maximizes DISTINCT query terms
    * covered, ties to the earliest start. Occurrences come from the
    * stored positional index — the same `.pos`-style probe the phrase
    * path uses — so snippet selection reads O(query-term position lists)
    * plus the k texts, never re-tokenizing the corpus.
    *
    * Scale shape: the match relation is (top-k docs × their query-term
    * occurrences) — Q·k docs regardless of corpus size; the
    * window self-join is keyed on (query_id, doc_id) within that tiny
    * relation; the final text pull pushes a ≤ Q·k-element In(doc_id)
    * into the documents scan (bounded driver collect, the MLT
    * contract). Determinism: coverage counts are integers; ties break
    * on start position, then ranking rides the stored top-k's
    * (rounded score, doc_id) order. */
  def qSnippets(s: SparkSession, d: String): DataFrame = {
    val (terms, qterms) = queryTerms(s, Bm25Queries)
    val top = qBm25Stored(s, d).select(col("query_id"), col("rank"), col("doc_id"))
    snippetsFor(s, d, top, terms, qterms)
  }

  /** The snippet kernel behind [[qSnippets]] and the ad-hoc
    * [[searchPage]] serving path: best [[SnippetW]]-token window per
    * (query, doc) of `top` — one positional-index probe + the tiny
    * within-doc window self-join. */
  private def snippetsFor(s: SparkSession, d: String, topPlan: DataFrame,
      terms: Seq[String], qterms: DataFrame): DataFrame = {
    val (posTable, _) = phraseIndex(s, d)
    // ≤ Q·k rows, consumed by the match semi-join, the docIds collect
    // below AND the final projection — without the checkpoint the
    // whole upstream ranking plan (a full BM25 pass) re-evaluated three
    // times across the two actions (r16, guide §2.4 shared subtrees)
    val top = topPlan.localCheckpoint()
    val matches = s.table(posTable)
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), explode(col("positions")).as("pos"))
      .join(broadcast(qterms), "term")
      .join(broadcast(top.select(col("query_id"), col("doc_id"))),
        Seq("query_id", "doc_id"), "left_semi")
    val windows = matches
      .join(matches.select(col("query_id"), col("doc_id"),
          col("term").as("t2"), col("pos").as("p2")),
        Seq("query_id", "doc_id"))
      .filter(col("p2") >= col("pos") &&
        col("p2") < col("pos") + lit(SnippetW))
      .groupBy(col("query_id"), col("doc_id"), col("pos"))
      .agg(countDistinct(col("t2")).as("n_cover"))
    val wb = Window.partitionBy(col("query_id"), col("doc_id"))
      .orderBy(col("n_cover").desc, col("pos"))
    // ≤ Q·k rows again: the docIds collect and the final projection both
    // consume `best` — checkpoint so the positional probe + window
    // kernel runs once, not once per action
    val best = windows.withColumn("rn", row_number().over(wb))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("doc_id"),
        col("pos").as("snip_start"), col("n_cover"))
      .localCheckpoint()
    // bounded collect (≤ |queries|·k ids) → pushed In() on the text scan
    val docIds = best.select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val toks = Tables.documents(s, d)
      .filter(col("doc_id").isin(docIds: _*))
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
    best
      .join(broadcast(top), Seq("query_id", "doc_id"))
      .join(broadcast(toks), "doc_id")
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("snip_start").cast("long").as("snip_start"),
        col("n_cover"),
        concat_ws(" ",
          slice(col("w"), col("snip_start").cast("int"), lit(SnippetW)))
          .as("snippet"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qSnippetsSql: String = {
    val values = Bm25Queries
      .map { case (id, q) => s"(${id}::BIGINT, '$q')" }.mkString(", ")
    s"""WITH ${bm25Sql(
      s"""q(query_id, qtext) AS (VALUES $values),
         |qt AS (
         |  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) term
         |  FROM q)""".stripMargin)},
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) rank
       |  FROM bm25),
       |top AS (
       |  SELECT query_id, rank::INTEGER rank, doc_id
       |  FROM ranked WHERE rank <= 5),
       |pos AS (
       |  SELECT doc_id, unnest(w) term, generate_subscripts(w, 1) pos
       |  FROM d2),
       |m AS (
       |  SELECT t.query_id, t.doc_id, p.term, p.pos
       |  FROM top t
       |  JOIN pos p ON p.doc_id = t.doc_id
       |  JOIN qt ON qt.query_id = t.query_id AND qt.term = p.term),
       |win AS (
       |  SELECT m1.query_id, m1.doc_id, m1.pos,
       |    count(DISTINCT m2.term) n_cover
       |  FROM m m1 JOIN m m2
       |    ON m1.query_id = m2.query_id AND m1.doc_id = m2.doc_id
       |    AND m2.pos >= m1.pos AND m2.pos < m1.pos + $SnippetW
       |  GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT query_id, doc_id, pos snip_start, n_cover,
       |    row_number() OVER (PARTITION BY query_id, doc_id
       |      ORDER BY n_cover DESC, pos) rn
       |  FROM win)
       |SELECT b.query_id, t.rank, b.doc_id,
       |  b.snip_start::BIGINT AS snip_start, b.n_cover,
       |  array_to_string(d.w[b.snip_start : b.snip_start + ${SnippetW - 1}], ' ') AS snippet
       |FROM best b
       |JOIN top t ON t.query_id = b.query_id AND t.doc_id = b.doc_id
       |JOIN docs d ON d.doc_id = b.doc_id
       |WHERE b.rn = 1
       |ORDER BY b.query_id, t.rank""".stripMargin
  }

  /** Per-query facet counts over the full BM25 match set (Lucene
    * faceting semantics: for each hit-set, document counts per metadata
    * field value — the refinement panel every search UI ships). The
    * match set comes from the bucket-pruned postings probe (docs sharing
    * ≥ 1 query term); metadata arrives by joining the column-pruned
    * documents scan on doc_id — the docvalues pattern: at 100 TB the
    * (doc_id, lang, source) projection is a narrow columnar read, and
    * the join shuffles only the match set + that projection, never text.
    * Counts are exact integers — no rounding concerns. */
  def qFacets(s: SparkSession, d: String): DataFrame = {
    val idx = bm25Index(s, d)
    val (terms, qterms) = queryTerms(s, Bm25Queries)
    val matched = s.table(idx.postingsTable)
      .filter(col("term").isin(terms: _*))
      .join(broadcast(qterms), "term")
      .select(col("query_id"), col("doc_id")).distinct()
    facetsFor(s, d, matched)
  }

  /** The facet kernel behind [[qFacets]] and [[searchPage]]: per-query
    * (facet, value) doc counts for a (query_id, doc_id) match set. */
  private def facetsFor(s: SparkSession, d: String,
      matched: DataFrame): DataFrame = {
    val meta = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"))
    matched.join(meta, "doc_id")
      .select(col("query_id"),
        expr("stack(2, 'lang', lang, 'source', source) AS (facet, facet_value)"))
      .groupBy(col("query_id"), col("facet"), col("facet_value"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("query_id"), col("facet"), col("facet_value"))
  }

  val qFacetsSql: String = {
    val values = Bm25Queries
      .map { case (id, q) => s"(${id}::BIGINT, '$q')" }.mkString(", ")
    s"""WITH ${bm25Sql(
      s"""q(query_id, qtext) AS (VALUES $values),
         |qt AS (
         |  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) term
         |  FROM q)""".stripMargin)},
       |matched AS (SELECT DISTINCT query_id, doc_id FROM post),
       |joined AS (
       |  SELECT m.query_id, d.lang, d.source
       |  FROM matched m JOIN documents d USING (doc_id)),
       |stacked AS (
       |  SELECT query_id, 'lang' facet, lang facet_value FROM joined
       |  UNION ALL
       |  SELECT query_id, 'source', source FROM joined)
       |SELECT query_id, facet, facet_value, count(*) AS n_docs
       |FROM stacked GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  /** Proximity rerank pool width and output k. */
  private val ProxPool = 20
  private val ProxK = 5

  /** Proximity-boosted ranking (the term-distance relevance signal —
    * Lucene's sloppy-phrase/span scoring, Tao & Zhai 2007 "An
    * exploration of proximity measures in information retrieval",
    * SIGIR — public paper): rerank the BM25 top-[[ProxPool]] by
    * score + 1/(1 + minspan), where minspan is the SMALLEST token
    * window containing every matched query term of the doc (docs
    * matching one distinct term get no bonus). Two-phase by design —
    * the span search runs over the top pool only, never the corpus:
    * position lists arrive via the bucket-pruned positional probe
    * restricted to pool docs, and the span program is the classic
    * anchor-at-occurrence cover (for each occurrence p₀: the earliest
    * position ≥ p₀ of EACH term; a window exists iff all terms have
    * one; span = max − p₀ + 1), a self-join bounded by per-doc
    * query-term occurrences — Q·pool·occ² worst case, corpus-size
    * independent. Determinism: spans are integers; the boost is an
    * exact rational added to the 4dp score, re-rounded to 6dp, doc_id
    * tiebreak. */
  def qProximity(s: SparkSession, d: String): DataFrame = {
    val idx = bm25Index(s, d)
    val (terms, qterms) = queryTerms(s, Bm25Queries)
    val pool = scoreIndex(
      s.table(idx.postingsTable).filter(col("term").isin(terms: _*)),
      s.table(idx.dfreqTable).filter(col("term").isin(terms: _*)),
      s.read.parquet(idx.statsPath), qterms, ProxPool)
      .select(col("query_id"), col("doc_id"), col("score"))
    val (posTable, _) = phraseIndex(s, d)
    // (r16 note: checkpointing `pool` and `occ` here was A/B'd with the
    // bench's min-of-3 methodology and came out a wash — 2.68 vs 2.75 s
    // — everything is one action and exchange reuse already covers the
    // occ self-join; left alone per guide §1.3)
    val occ = s.table(posTable)
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), explode(col("positions")).as("p"))
      .join(broadcast(qterms), "term")
      .join(broadcast(pool.select(col("query_id"), col("doc_id"))),
        Seq("query_id", "doc_id"), "left_semi")
    val nTerms = occ.groupBy(col("query_id"), col("doc_id"))
      .agg(countDistinct(col("term")).as("n_terms"))
    val anchors = occ.select(col("query_id"), col("doc_id"), col("p").as("p0"))
    val nxt = anchors
      .join(occ.select(col("query_id"), col("doc_id"),
          col("term"), col("p")),
        Seq("query_id", "doc_id"))
      .filter(col("p") >= col("p0"))
      .groupBy(col("query_id"), col("doc_id"), col("p0"), col("term"))
      .agg(min(col("p")).as("np"))
    val spans = nxt.groupBy(col("query_id"), col("doc_id"), col("p0"))
      .agg(count(lit(1)).as("nt"), max(col("np")).as("e"))
      .join(nTerms, Seq("query_id", "doc_id"))
      .filter(col("nt") === col("n_terms") && col("n_terms") >= 2)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(min(col("e") - col("p0") + 1).as("minspan"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score2").desc, col("doc_id"))
    pool.join(spans, Seq("query_id", "doc_id"), "left")
      .withColumn("score2", round(col("score") +
        when(col("minspan").isNotNull, lit(1.0) / (col("minspan") + 1))
          .otherwise(lit(0.0)), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= ProxK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score2").as("score"),
        coalesce(col("minspan"), lit(0L)).as("minspan"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qProximitySql: String = {
    val values = Bm25Queries
      .map { case (id, q) => s"(${id}::BIGINT, '$q')" }.mkString(", ")
    s"""WITH ${bm25Sql(
      s"""q(query_id, qtext) AS (VALUES $values),
         |qt AS (
         |  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) term
         |  FROM q)""".stripMargin)},
       |pool AS (
       |  SELECT query_id, doc_id, score FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY score DESC, doc_id) rnk
       |    FROM bm25)
       |  WHERE rnk <= $ProxPool),
       |pos AS (
       |  SELECT doc_id, unnest(w) term, generate_subscripts(w, 1) p
       |  FROM d2),
       |occ AS (
       |  SELECT pl.query_id, pl.doc_id, po.term, po.p
       |  FROM pool pl
       |  JOIN pos po ON po.doc_id = pl.doc_id
       |  JOIN qt ON qt.query_id = pl.query_id AND qt.term = po.term),
       |nterms AS (
       |  SELECT query_id, doc_id, count(DISTINCT term) n_terms
       |  FROM occ GROUP BY 1, 2),
       |nxt AS (
       |  SELECT a.query_id, a.doc_id, a.p p0, o.term, min(o.p) np
       |  FROM (SELECT query_id, doc_id, p FROM occ) a
       |  JOIN occ o ON o.query_id = a.query_id AND o.doc_id = a.doc_id
       |    AND o.p >= a.p
       |  GROUP BY 1, 2, 3, 4),
       |spans AS (
       |  SELECT x.query_id, x.doc_id, min(x.e - x.p0 + 1) minspan
       |  FROM (
       |    SELECT n.query_id, n.doc_id, n.p0, count(*) nt, max(n.np) e
       |    FROM nxt n GROUP BY 1, 2, 3) x
       |  JOIN nterms t ON t.query_id = x.query_id AND t.doc_id = x.doc_id
       |  WHERE x.nt = t.n_terms AND t.n_terms >= 2
       |  GROUP BY 1, 2),
       |boosted AS (
       |  SELECT pl.query_id, pl.doc_id,
       |    round(pl.score + CASE WHEN sp.minspan IS NOT NULL
       |      THEN 1.0::DOUBLE / (sp.minspan + 1) ELSE 0.0::DOUBLE END, 6) score,
       |    coalesce(sp.minspan, 0)::BIGINT minspan
       |  FROM pool pl
       |  LEFT JOIN spans sp
       |    ON sp.query_id = pl.query_id AND sp.doc_id = pl.doc_id)
       |SELECT query_id, rank::INTEGER AS rank, doc_id, score, minspan
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY query_id ORDER BY score DESC, doc_id) rank
       |      FROM boosted)
       |WHERE rank <= $ProxK ORDER BY query_id, rank""".stripMargin
  }

  private val deltaIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** BM25 served off a DELTA-MAINTAINED index — the batch-runnable twin
    * of [[graft.streaming.IndexStream]]'s micro-batch loop, so the
    * driver's DuckDB gate checks the merge-on-read index semantics, not
    * just the spec. The corpus is split into 3 pseudo-batches
    * (doc_id % 3 — deterministic arrival order) whose deltas land
    * exactly as the stream writes them, then the query serves off the
    * merged view; output is provably identical to [[qBm25]] (same
    * oracle). Built once per sf-dir — the index lifecycle, same as
    * [[bm25Index]]. */
  def qBm25Deltas(s: SparkSession, d: String): DataFrame =
    graft.streaming.IndexStream.search(s, deltaDir(s, d))

  /** The 3-pseudo-batch delta index for an sf-dir, built once — shared
    * by the BM25 and phrase delta-serving gates (one delivery, every
    * component maintained from it, exactly like a real index flush). */
  private def deltaDir(s: SparkSession, d: String): String =
    deltaIndexCache.getOrElseUpdate(d, {
      val dir = java.nio.file.Files.createTempDirectory("bm25deltas").toString
      val docs = Tables.documents(s, d).selectExpr("doc_id", "text")
      (0 until 3).foreach { b =>
        // pmod, not %: Spark % keeps the dividend's sign, so a negative
        // doc_id would match no pseudo-batch and silently vanish
        graft.streaming.IndexStream.writeDelta(
          docs.filter(pmod(col("doc_id"), lit(3)) === b), dir, b.toLong)
      }
      dir
    })

  /** [[qPhrase]] served off the DELTA-MAINTAINED positional component —
    * the streamed-index twin ([[qBm25Deltas]] relationship): per-batch
    * position lists union into the full positional postings, and the
    * shared [[phraseRank]] kernel scores them. Same oracle as
    * [[qPhrase]]: the delta merge is provably the batch relation under
    * the append-only doc_id contract. */
  def qPhraseDeltas(s: SparkSession, d: String): DataFrame =
    graft.streaming.IndexStream.searchPhrase(s, deltaDir(s, d))

  /** Exact phrase search over POSITIONAL postings — the Lucene
    * PhraseQuery semantics the bag-of-words ranker cannot express: the
    * query terms must occur CONSECUTIVELY, in order. Runs the same fixed
    * query set as [[qBm25]], so the pair demonstrates exactly what
    * position data buys (phrase df ≪ term df).
    *
    * The match is relational, not an array program: a token row
    * (doc_id, pos, term) joined against the broadcast (query_id, term,
    * offset) phrase table yields candidate START positions
    * (start = pos − offset), and a start is a real occurrence iff ALL
    * |phrase| offsets report it — a count(distinct offset) = qlen filter.
    * Scale shape: the corpus-side posexplode is pruned by the broadcast
    * phrase-term join BEFORE any shuffle (only positions of query terms
    * move, same contract as [[bm25Scores]]); the occurrence check
    * shuffles those pruned rows once on (query_id, doc_id, start).
    * Scoring: BM25 saturation over the PHRASE tf with the phrase's own
    * per-query df — one scalar expression per surviving doc, so the 4dp
    * round is engine-exact. */
  def qPhrase(s: SparkSession, d: String): DataFrame = {
    val (_, qoff, qlen) = phraseQuery(s)
    val toks = tokenized(s, d)
    val pos = toks.select(col("doc_id"), col("dl"),
        posexplode(col("w")).as(Seq("p0", "term")))
      .withColumn("pos", col("p0") + 1) // 1-based, = DuckDB generate_subscripts
    phraseRank(pos, qoff, qlen,
      toks.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")))
  }

  /** Match + score + top-k stage shared by the direct and stored phrase
    * paths (one implementation, two physical feeders — the
    * [[scoreIndex]]/[[bm25Scores]] relationship). `pos` carries
    * (doc_id, dl, pos, term) rows already restricted to SOME superset of
    * the query terms. (r16 note: a pre-grouped array-postings variant —
    * one row per (term, doc) carrying the positions array, phrase_tf by
    * folding array_intersect over per-offset start sets — was built and
    * MEASURED SLOWER: 0.9 → 2.1 s warm at sf0.1 direct, 0.96 → 1.67 s
    * stored; the per-row transform/filter array allocations cost more
    * than the row-form hash aggregate they replace, and the row form
    * already combines map-side. Reverted per guide §1.) */
  /** The fixed query set as phrase relations: (distinct terms,
    * (query_id, off, term) offsets, (query_id, qlen) lengths) — the ONE
    * phrase-query tokenization shared by the direct, stored and streamed
    * serving paths (the [[queryTerms]] contract). */
  private[graft] def phraseQuery(s: SparkSession)
      : (Seq[String], DataFrame, DataFrame) = {
    import s.implicits._
    val qoff = Bm25Queries.toDF("query_id", "qtext")
      .select(col("query_id"),
        posexplode(split(col("qtext"), " ")).as(Seq("off", "term")))
    val qlen = qoff.groupBy(col("query_id")).agg(count(lit(1)).as("qlen"))
    (Bm25Queries.flatMap(_._2.split(" ")).distinct, qoff, qlen)
  }

  private[graft] def phraseRank(pos: DataFrame, qoff: DataFrame, qlen: DataFrame,
      stats: DataFrame): DataFrame = {
    val hits = pos.join(broadcast(qoff), "term")
      .withColumn("start", col("pos") - col("off"))
      .filter(col("start") >= 1)
    val perDoc = hits
      .groupBy(col("query_id"), col("doc_id"), col("dl"), col("start"))
      .agg(countDistinct(col("off")).as("n_off"))
      .join(broadcast(qlen), "query_id")
      .filter(col("n_off") === col("qlen"))
      .groupBy(col("query_id"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("phrase_tf"))
    val dfreq = perDoc.groupBy(col("query_id")).agg(count(lit(1)).as("df"))
    val sat = col("idf") * (col("phrase_tf") * lit(K1 + 1)) /
      (col("phrase_tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    perDoc
      .join(broadcast(dfreq), "query_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("score", round(sat, 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("phrase_tf"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qPhraseSql: String = {
    val values = Bm25Queries
      .map { case (id, q) => s"(${id}::BIGINT, '$q')" }.mkString(", ")
    s"""WITH q(query_id, qtext) AS (VALUES $values),
       |qoff AS (
       |  SELECT query_id, unnest(string_split(qtext, ' ')) term,
       |    generate_subscripts(string_split(qtext, ' '), 1) - 1 qo
       |  FROM q),
       |qlen AS (SELECT query_id, count(*) qlen FROM qoff GROUP BY 1),
       |docs AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') w
       |  FROM documents),
       |d2 AS (SELECT doc_id, w, len(w) dl FROM docs),
       |stats AS (SELECT count(*) n_docs, avg(dl) avgdl FROM d2),
       |pos AS (
       |  SELECT doc_id, dl, unnest(w) term, generate_subscripts(w, 1) pos
       |  FROM d2),
       |hits AS (
       |  SELECT query_id, doc_id, dl, pos - qo AS start, qo
       |  FROM pos JOIN qoff USING (term) WHERE pos - qo >= 1),
       |occ AS (
       |  SELECT query_id, doc_id, dl, start, count(DISTINCT qo) n_off
       |  FROM hits GROUP BY 1, 2, 3, 4),
       |perdoc AS (
       |  SELECT query_id, doc_id, dl, count(*)::BIGINT phrase_tf
       |  FROM occ JOIN qlen USING (query_id)
       |  WHERE n_off = qlen GROUP BY 1, 2, 3),
       |dfreq AS (SELECT query_id, count(*) df FROM perdoc GROUP BY 1),
       |scored AS (
       |  SELECT query_id, doc_id, phrase_tf,
       |    round(
       |      ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)) *
       |      (phrase_tf * ${K1 + 1}::DOUBLE) /
       |      (phrase_tf + $K1::DOUBLE * (${1 - B}::DOUBLE + $B::DOUBLE * dl / avgdl)), 4) score
       |  FROM perdoc JOIN dfreq USING (query_id), stats)
       |SELECT query_id, rank::INTEGER AS rank, doc_id, phrase_tf, score
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY query_id ORDER BY score DESC, doc_id) rank
       |      FROM scored)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** The positional index: (term, doc_id, dl, positions) bucketed by term
    * — the companion table a positions-aware engine stores INSIDE its
    * postings (Lucene's .prx/.pos files); kept as its own bucketed table
    * here so the frequency-only probes never pay the positions IO. Built
    * once per sf-dir, [[bm25Index]] lifecycle (same bucket count, same
    * orphan reclaim, same pinned bucketed-scan conf). */
  private val phraseIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  def phraseIndex(s: SparkSession, d: String): (String, String) = {
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    phraseIndexCache.getOrElseUpdate(d, {
      val suffix = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(8)
      val table = s"bm25_pos_$suffix"
      reclaimOrphanTables(s, Seq(table))
      val statsPath = java.nio.file.Files
        .createTempDirectory("bm25pos").toString + "/stats"
      val toks = tokenized(s, d)
      toks.select(col("doc_id"), col("dl"),
          posexplode(col("w")).as(Seq("p0", "term")))
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(sort_array(collect_list(col("p0") + 1)).as("positions"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "term").sortBy("term", "doc_id")
        .saveAsTable(table)
      toks.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
        .write.mode("overwrite").parquet(statsPath)
      (table, statsPath)
    })
  }

  /** [[qPhrase]] served off the stored positional index — identical
    * output (same oracle): the probe arrives as an `In(term, …)` pushed
    * filter on the bucketed positions table (bucket-pruned scan, the
    * [[qBm25Stored]] contract), the positions array explodes back into
    * the (doc_id, pos, term) rows the shared [[phraseRank]] kernel
    * consumes, and everything downstream is the one implementation. At
    * 100 TB the direct path's corpus posexplode is the index build;
    * THIS plan is the per-query cost: O(query-term position lists). */
  def qPhraseStored(s: SparkSession, d: String): DataFrame = {
    val (table, statsPath) = phraseIndex(s, d)
    val (terms, qoff, qlen) = phraseQuery(s)
    val pos = s.table(table)
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("dl"), col("term"),
        explode(col("positions")).as("pos"))
    phraseRank(pos, qoff, qlen, s.read.parquet(statsPath))
  }

  /** Ad-hoc single-query BM25 off the stored index — the serving-path
    * entry the HTTP shim exposes as `GET /search`: the query string is
    * normalized exactly like document text (trim/lower/whitespace
    * split), its terms become the pushed `In(term, …)` probe, and the
    * plan is [[qBm25Stored]]'s per-query cost — O(query-term postings)
    * regardless of corpus size. */
  def searchStored(s: SparkSession, d: String, query: String,
      k: Int = 5): DataFrame = {
    val idx = bm25Index(s, d)
    val normalized = query.trim.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).mkString(" ")
    val (terms, qterms) = queryTerms(s, Seq(0L -> normalized))
    scoreIndex(
      s.table(idx.postingsTable).filter(col("term").isin(terms: _*)),
      s.table(idx.dfreqTable).filter(col("term").isin(terms: _*)),
      s.read.parquet(idx.statsPath), qterms, k)
  }

  /** One fully-assembled search result page for an ad-hoc query — the
    * SERP a search frontend renders: ranked hits with KWIC snippets,
    * plus facet counts over the FULL match set (not just the page).
    * Composes the stored-index probe ([[searchStored]]'s plan), the
    * [[snippetsFor]] positional kernel and the [[facetsFor]] metadata
    * rollup — three bucket/In-pruned probes total, no corpus scan.
    * Returns (hits with snippets, facets). */
  def searchPage(s: SparkSession, d: String, query: String,
      k: Int = 5): (DataFrame, DataFrame) = {
    val idx = bm25Index(s, d)
    val normalized = query.trim.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).mkString(" ")
    val (terms, qterms) = queryTerms(s, Seq(0L -> normalized))
    val post = s.table(idx.postingsTable).filter(col("term").isin(terms: _*))
    // the page ranks through MaxScore — provably identical to exact
    // scoring (the ks_maxscore bound), so the SERVED path pays the
    // pruned aggregation cost by default
    val ranked = maxscoreIndex(s, idx, Seq(0L -> normalized), k)._2
    val snips = snippetsFor(s, d,
      ranked.select(col("query_id"), col("rank"), col("doc_id")),
      terms, qterms)
    val hits = ranked.join(
        snips.select(col("doc_id"), col("snippet"), col("n_cover")),
        Seq("doc_id"), "left")
      .select(col("rank"), col("doc_id"), col("score"),
        coalesce(col("snippet"), lit("")).as("snippet"))
      .orderBy(col("rank"))
    val matched = post.join(broadcast(qterms), "term")
      .select(col("query_id"), col("doc_id")).distinct()
    (hits, facetsFor(s, d, matched))
  }

  /** More-like-this seed documents and expansion width (Lucene's
    * MoreLikeThis defaults scaled to the corpus: maxQueryTerms). */
  private val MltSeeds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)
  private val MltTerms = 8

  /** Query-by-document retrieval — Lucene's MoreLikeThis (public API
    * semantics): each seed document's most characteristic terms (top
    * [[MltTerms]] by tf·idf, the MLT selection criterion) become a
    * keyword query, and BM25 ranks the rest of the corpus against it,
    * seed excluded. This is THE similar-docs feature every search
    * deployment ships, and it exercises the inverted+forward index pair
    * end to end: the term-vector pull is a bucket-pruned FORWARD-table
    * probe by doc id (no tokenization, no corpus scan), the search is a
    * bucket-pruned INVERTED-table probe by the selected terms.
    *
    * Two bounded driver collects, both intrinsic to a served plan (the
    * [[qBm25Rm3Stored]] contract): the seed term vectors (≤ seeds ×
    * doc-length rows) so the df probe and selection are driver-pushable
    * literals, and the selected terms (≤ seeds × [[MltTerms]]) so the
    * final scan carries In(term, …). Determinism: term selection ranks
    * the 6dp-rounded tf·idf with term-string tiebreak; doc ranking is
    * the shared 4dp-rounded BM25 with doc-id tiebreak. */
  def qMoreLikeThis(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val idx = bm25Index(s, d)
    val stats = s.read.parquet(idx.statsPath)
    val seedRows = s.table(idx.fwdTable)
      .filter(col("doc_id").isin(MltSeeds: _*))
      .select(col("doc_id").as("query_id"), col("term"), col("tf"))
      .collect()
    val seedTerms = seedRows.map(_.getString(1)).distinct.toSeq
    val seedt = seedRows.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.toDF("query_id", "term", "tf")
    val wsel = Window.partitionBy(col("query_id"))
      .orderBy(col("tw").desc, col("term"))
    val selRows = seedt
      .join(s.table(idx.dfreqTable).filter(col("term").isin(seedTerms: _*)),
        "term")
      .crossJoin(broadcast(stats))
      .withColumn("tw", round(col("tf") *
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))), 6))
      .withColumn("r", row_number().over(wsel))
      .filter(col("r") <= MltTerms)
      .select(col("query_id"), col("term"))
      .collect()
    val terms2 = selRows.map(_.getString(1)).distinct.toSeq
    val qterms = selRows.map(r => (r.getLong(0), r.getString(1)))
      .toSeq.toDF("query_id", "term")
    scoreIndex(
      s.table(idx.postingsTable).filter(col("term").isin(terms2: _*)),
      s.table(idx.dfreqTable).filter(col("term").isin(terms2: _*)),
      stats, qterms, k = 5, excludeSelf = true)
  }

  val qMoreLikeThisSql: String = {
    val seeds = MltSeeds.mkString(", ")
    s"""WITH ${bm25Sql(
      s"""fullpost AS (SELECT doc_id, unnest(w) term FROM d2),
         |post0 AS (SELECT doc_id, term, count(*) tf FROM fullpost GROUP BY 1, 2),
         |gdf AS (SELECT term, count(*) df FROM post0 GROUP BY 1),
         |seedt AS (
         |  SELECT p.doc_id query_id, p.term,
         |    round(p.tf * ln(1.0::DOUBLE +
         |      (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)), 6) tw
         |  FROM post0 p JOIN gdf USING (term), stats
         |  WHERE p.doc_id IN ($seeds)),
         |qt AS (
         |  SELECT query_id, term FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY query_id ORDER BY tw DESC, term) r
         |    FROM seedt) WHERE r <= $MltTerms)""".stripMargin)},
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) rank
       |  FROM bm25 WHERE doc_id <> query_id)
       |SELECT query_id, rank::INTEGER AS rank, doc_id, score, n_terms_hit
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Fuzzy (edit-distance ≤ 1) keyword search — typo-tolerant term
    * matching via the SymSpell delete-neighborhood (Garbe's public
    * algorithm, the standard spell-index trick): two strings are within
    * Levenshtein distance 1 ONLY IF their {self} ∪ {single-char deletes}
    * key sets intersect, so candidate generation is an EQUI-join on
    * delete keys — |vocab|·(len+1) key rows hash-joined against the tiny
    * query-key side — never the vocab × query-terms cross join the naive
    * formulation needs (and which a 100 TB vocab cannot pay). The true
    * Levenshtein check then verifies the survivors, so the neighborhood
    * is a pruner, not the semantics: the match set is EXACTLY
    * {(q, t) : lev(t, corrupt(q)) ≤ 1}, which is what the oracle
    * recomputes with its (small, oracle-only) cross join.
    *
    * The query side runs the fixed [[Bm25Queries]] set with each term ≥ 3
    * chars deterministically corrupted (one char deleted at an
    * md5-derived index, the portable-hash idiom) — so exact lookup
    * genuinely fails and the fuzzy expansion is what recovers the
    * ranking. Scoring: plain BM25 over the expanded (query, term) set. */
  def qFuzzy(s: SparkSession, d: String): DataFrame = {
    val toks = tokenized(s, d)
    // delete position: md5-derived, 1-based — identical arithmetic in
    // the oracle; terms shorter than 3 chars pass through uncorrupted
    val qc = corruptedTerms(s)
    val vocab = toks.select(explode(col("w")).as("term")).distinct()
    val qterms = symspellMatch(vocab, qc)
      .select(col("query_id"), col("term")).distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    bm25Scores(toks, qterms)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score"), col("n_terms_hit"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The SymSpell candidate join + Levenshtein verify on its own:
    * vocab (term) × qc (query_id, ct) → the exact distance-≤1 match set
    * (query_id, term). Factored so the spec can pin equivalence with the
    * naive cross-join formulation on a crafted vocabulary (including the
    * transposition case, which is distance 2 and must NOT match). */
  private[graft] def symspellMatch(vocab: DataFrame, qc: DataFrame): DataFrame = {
    def keys(c: String): String =
      s"array_union(array($c), transform(sequence(1, length($c)), " +
        s"i -> concat(substr($c, 1, i - 1), substr($c, i + 1, length($c)))))"
    val vk = vocab.select(col("term"), explode(expr(keys("term"))).as("k"))
    val qk = qc.select(col("query_id"), col("ct"),
      explode(expr(keys("ct"))).as("k")).distinct()
    vk.join(broadcast(qk), "k")
      .select(col("query_id"), col("ct"), col("term")).distinct()
      .filter(levenshtein(col("term"), col("ct")) <= 1)
  }

  /** The deterministically corrupted query-term relation (query_id, ct)
    * shared by [[qFuzzy]] and [[qSuggest]] — md5-indexed single-char
    * delete, identical arithmetic in both oracles. */
  private def corruptedTerms(s: SparkSession): DataFrame = {
    import s.implicits._
    val hi = conv(substring(md5(col("term")), 1, 4), 16, 10).cast("int") %
      length(col("term")) + 1
    Bm25Queries.toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(split(col("qtext"), " ")).as("term")).distinct()
      .select(col("query_id"),
        when(length(col("term")) >= 3,
          concat(col("term").substr(lit(1), hi - 1),
            col("term").substr(hi + 1, lit(64))))
          .otherwise(col("term")).as("ct"))
  }

  /** Did-you-mean suggestion (the spell-correct feature over the same
    * SymSpell delete-neighborhood as [[qFuzzy]]; ranking follows the
    * public SymSpell/Norvig-corrector rule: smallest edit distance
    * first, then CORPUS FREQUENCY — the noisy-channel prior — then the
    * term string for a total order). For each corrupted query term, the
    * best vocabulary correction within distance 1; an exact vocabulary
    * hit suggests itself (distance 0 dominates). Document frequency
    * comes from the pruned candidate set only — the df lookup joins the
    * ≤ |candidates| surviving terms, never the whole vocabulary. */
  def qSuggest(s: SparkSession, d: String): DataFrame = {
    val toks = tokenized(s, d)
    val qc = corruptedTerms(s)
    val vocab = toks.select(explode(col("w")).as("term")).distinct()
    val cand = symspellMatch(vocab, qc)
      .withColumn("dist", levenshtein(col("ct"), col("term")))
    val dfreq = toks
      .select(col("doc_id"), explode(col("w")).as("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("query_id"), col("ct"))
      .orderBy(col("dist").asc, col("df").desc, col("term").asc)
    cand.join(dfreq, "term")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("ct").as("corrupted"),
        col("term").as("suggestion"), col("dist"), col("df"))
      .orderBy(col("query_id"), col("corrupted"))
  }

  val qSuggestSql: String = {
    val values = Bm25Queries
      .map { case (id, q) => s"(${id}::BIGINT, '$q')" }.mkString(", ")
    val hiSql = "(('0x' || substr(md5(term), 1, 4))::BIGINT % length(term) + 1)"
    s"""WITH q(query_id, qtext) AS (VALUES $values),
       |qt0 AS (
       |  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) term
       |  FROM q),
       |qc AS (
       |  SELECT query_id,
       |    CASE WHEN length(term) >= 3 THEN
       |      substr(term, 1, $hiSql - 1) || substr(term, $hiSql + 1, 64)
       |    ELSE term END ct
       |  FROM qt0),
       |docs AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') w
       |  FROM documents),
       |vocab AS (SELECT DISTINCT unnest(w) term FROM docs),
       |dfreq AS (
       |  SELECT term, count(*) df FROM (
       |    SELECT DISTINCT doc_id, unnest(w) term FROM docs)
       |  GROUP BY 1),
       |cand AS (
       |  SELECT qc.query_id, qc.ct, v.term,
       |    levenshtein(qc.ct, v.term) dist
       |  FROM qc JOIN vocab v ON levenshtein(v.term, qc.ct) <= 1),
       |ranked AS (
       |  SELECT c.query_id, c.ct, c.term, c.dist, f.df,
       |    row_number() OVER (PARTITION BY c.query_id, c.ct
       |      ORDER BY c.dist, f.df DESC, c.term) rn
       |  FROM cand c JOIN dfreq f ON f.term = c.term)
       |SELECT query_id, ct AS corrupted, term AS suggestion, dist, df
       |FROM ranked WHERE rn = 1 ORDER BY query_id, corrupted""".stripMargin
  }

  val qFuzzySql: String = {
    val values = Bm25Queries
      .map { case (id, q) => s"(${id}::BIGINT, '$q')" }.mkString(", ")
    val hiSql = "(('0x' || substr(md5(term), 1, 4))::BIGINT % length(term) + 1)"
    s"""WITH ${bm25Sql(
      s"""q(query_id, qtext) AS (VALUES $values),
         |qt0 AS (
         |  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) term
         |  FROM q),
         |qc AS (
         |  SELECT query_id,
         |    CASE WHEN length(term) >= 3 THEN
         |      substr(term, 1, $hiSql - 1) || substr(term, $hiSql + 1, 64)
         |    ELSE term END ct
         |  FROM qt0),
         |vocab AS (SELECT DISTINCT unnest(w) term FROM d2),
         |qt AS (
         |  SELECT DISTINCT qc.query_id, v.term
         |  FROM qc JOIN vocab v ON levenshtein(v.term, qc.ct) <= 1)""".stripMargin)},
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) rank
       |  FROM bm25)
       |SELECT query_id, rank::INTEGER AS rank, doc_id, score, n_terms_hit
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Prefix width the wildcard query set truncates each term to. */
  private val WildcardPrefixLen = 4

  /** Prefix (trailing-wildcard) search — Lucene's PrefixQuery / the
    * term-dictionary range scan (Zobel & Moffat 2006, "Inverted files
    * for text search engines", ACM Computing Surveys §8 — public):
    * each query term truncates to its [[WildcardPrefixLen]]-char prefix
    * and matches EVERY vocabulary term sharing it ("hash join" →
    * `hash* join*`); the expanded term set then scores through the
    * standard pruned BM25.
    *
    * Scale shape: expansion runs against the DICTIONARY, not the
    * corpus — the distinct-term relation joins the broadcast prefix
    * table on the computed (plen, prefix) key, an EQUI-join (the
    * dictionary-sorted range scan's relational twin; no LIKE scan, no
    * nested loop). The matched terms then prune the token stream
    * before aggregation exactly like every other ks_ query, so corpus
    * cost is O(matched-term postings). */
  def qWildcard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = tokenized(s, d)
    val pref = Bm25Queries.toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(split(col("qtext"), " ")).as("term")).distinct()
      .select(col("query_id"),
        substring(col("term"), 1, WildcardPrefixLen).as("prefix"))
      .withColumn("plen", length(col("prefix")))
      .distinct()
    // ≤ |query terms| distinct prefix lengths — the dictionary keys
    // itself once per length, then the match is a broadcast equi-join
    val plens = pref.select(col("plen")).distinct()
    val vocab = toks.select(explode(col("w")).as("term")).distinct()
    val qterms = vocab
      .join(broadcast(plens), expr("length(term) >= plen"))
      .withColumn("prefix", expr("substring(term, 1, plen)"))
      .join(broadcast(pref), Seq("plen", "prefix"))
      .select(col("query_id"), col("term")).distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    bm25Scores(toks, qterms)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score"), col("n_terms_hit"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qWildcardSql: String = {
    val values = Bm25Queries
      .map { case (id, q) => s"(${id}::BIGINT, '$q')" }.mkString(", ")
    s"""WITH ${bm25Sql(
      s"""q(query_id, qtext) AS (VALUES $values),
         |qt0 AS (
         |  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) term
         |  FROM q),
         |qp AS (
         |  SELECT DISTINCT query_id, substr(term, 1, $WildcardPrefixLen) prefix
         |  FROM qt0),
         |vocab AS (SELECT DISTINCT unnest(w) term FROM d2),
         |qt AS (
         |  SELECT DISTINCT qp.query_id, v.term
         |  FROM qp JOIN vocab v
         |    ON length(v.term) >= length(qp.prefix)
         |   AND substr(v.term, 1, length(qp.prefix)) = qp.prefix)""".stripMargin)},
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) rank
       |  FROM bm25)
       |SELECT query_id, rank::INTEGER AS rank, doc_id, score, n_terms_hit
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ks_bm25" -> (qBm25 _),
    "ks_wildcard" -> (qWildcard _),
    "ks_boolean" -> (qBoolean _),
    "ks_bm25f" -> (qBm25F _),
    "ks_bm25_stored" -> (qBm25Stored _),
    "ks_bm25_deltas" -> (qBm25Deltas _),
    "ks_hybrid_rrf" -> (qHybridRrf _),
    "ks_rm3" -> (qBm25Rm3 _),
    "ks_rm3_stored" -> (qBm25Rm3Stored _),
    "ks_phrase" -> (qPhrase _),
    "ks_phrase_stored" -> (qPhraseStored _),
    "ks_fuzzy" -> (qFuzzy _),
    "ks_mlt" -> (qMoreLikeThis _),
    "ks_phrase_deltas" -> (qPhraseDeltas _),
    "ks_maxscore" -> (qMaxscore _),
    "ks_snippets" -> (qSnippets _),
    "ks_facets" -> (qFacets _),
    "ks_suggest" -> (qSuggest _),
    "ks_proximity" -> (qProximity _),
  )

  def oracles: Map[String, String] = Map(
    "ks_bm25" -> qBm25Sql,
    "ks_boolean" -> qBooleanSql,
    "ks_bm25f" -> qBm25FSql,
    // stored-index path: provably identical output (same scoring over the
    // same postings, served from the materialized index)
    "ks_bm25_stored" -> qBm25Sql,
    // delta-maintained index path: same scoring over the same postings,
    // merged from per-batch deltas
    "ks_bm25_deltas" -> qBm25Sql,
    "ks_hybrid_rrf" -> qHybridRrfSql,
    "ks_rm3" -> qBm25Rm3Sql,
    // index-served RM3: provably identical output (same stages over the
    // same postings, served from the materialized index)
    "ks_rm3_stored" -> qBm25Rm3Sql,
    "ks_phrase" -> qPhraseSql,
    // positional-index path: provably identical output (the positions
    // explode feeds the same phraseRank kernel)
    "ks_phrase_stored" -> qPhraseSql,
    "ks_fuzzy" -> qFuzzySql,
    "ks_wildcard" -> qWildcardSql,
    "ks_mlt" -> qMoreLikeThisSql,
    // delta-maintained positional component: same phrase relation,
    // merged from per-batch deltas
    "ks_phrase_deltas" -> qPhraseSql,
    // MaxScore dynamic pruning: provably lossless (the bound argument in
    // the scaladoc), so the exact-scoring oracle IS the gate
    "ks_maxscore" -> qBm25Sql,
    "ks_snippets" -> qSnippetsSql,
    "ks_facets" -> qFacetsSql,
    "ks_suggest" -> qSuggestSql,
    "ks_proximity" -> qProximitySql,
  )
}
