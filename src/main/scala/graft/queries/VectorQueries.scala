package graft.queries

import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY §2.7 J4 / §2.8
  * T1-T2 re-expressed; beyond-reference ANN path).
  *
  * Brute-force top-k is the exact baseline: the query side is broadcast
  * (queries ≪ corpus always holds in retrieval), the corpus side streams
  * through the codegen'd [[graft.functions.CosineSimilarity]], and the
  * per-query top-k is a partial TakeOrdered inside each partition before
  * the final window — no corpus shuffle at any point. At 100 TB the same
  * plan holds: broadcast Q query vectors, scan the corpus once, shuffle
  * only Q×k candidate rows.
  *
  * The LSH-bucketed variant is the scale path for query batches too large
  * to broadcast-scan: random-hyperplane signatures prune the corpus to
  * matching buckets before exact re-ranking.
  */
object VectorQueries {

  /** Exact brute-force top-5 cosine neighbors for the first 10 vectors. */
  def qKnnBrute(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("score", cosine(col("embedding"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qKnnBruteSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      |q AS (SELECT vec_id query_id, v qv FROM e WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, e.vec_id neighbor_id,
      |    list_cosine_similarity(e.v, q.qv) score
      |  FROM e, q WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(score, 6) AS score, rank
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Embedding-cosine near-duplicate pairs above a threshold (the
    * embedding-space variant of document dedup). */
  def qEmbNearDup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= 0.45)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val qEmbNearDupSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings)
      |SELECT a.vec_id id_a, b.vec_id id_b,
      |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.45
      |ORDER BY id_a, id_b""".stripMargin

  /** Per-label centroid stats: mean norm + count (vector agg exercise —
    * element-wise array aggregation via HOFs, one shuffle on label). */
  def qLabelStats(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("norm",
        sqrt(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double"))))
    emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("norm")), 6).as("avg_norm"),
        round(min(col("norm")), 6).as("min_norm"),
        round(max(col("norm")), 6).as("max_norm"))
      .orderBy(col("label"))
  }

  val qLabelStatsSql: String =
    """WITH e AS (
      |  SELECT label,
      |    sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum')) norm
      |  FROM embeddings)
      |SELECT label, count(*) AS n, round(avg(norm), 6) AS avg_norm,
      |  round(min(norm), 6) AS min_norm, round(max(norm), 6) AS max_norm
      |FROM e GROUP BY label ORDER BY label""".stripMargin

  /** LSH-bucketed ANN (scale path): 12 random-hyperplane bits over 3
    * tables (OR-amplification), candidates re-ranked exactly. Oracle-free
    * by nature (approximate recall), checked rows-only by the driver; the
    * exact twin qKnnBrute carries the value check. */
  def qKnnLsh(s: SparkSession, d: String): DataFrame = {
    val nTables = 3
    val bitsPerTable = 8
    val dim = 64
    val emb = Tables.embeddings(s, d)

    // deterministic pseudo-random hyperplanes: hash(t, b, i) mapped to ±1
    def planeSig(vec: org.apache.spark.sql.Column, t: Int): org.apache.spark.sql.Column = {
      val bits = (0 until bitsPerTable).map { bit =>
        val dot = aggregate(
          zip_with(vec, lit((0 until dim).map(i => {
            val h = scala.util.hashing.MurmurHash3.productHash((t, bit, i))
            if (h % 2 == 0) 1.0f else -1.0f
          }).toArray), (x, r) => x.cast("double") * r),
          lit(0.0d), (acc, x) => acc + x)
        when(dot >= 0, shiftleft(lit(1), bit)).otherwise(lit(0))
      }
      bits.reduce(_ + _)
    }

    val tables = (0 until nTables).map { t =>
      emb.select(col("vec_id"), col("embedding"),
        lit(t).as("tbl"), planeSig(col("embedding"), t).as("bucket"))
    }.reduce(_ unionByName _)

    val queries = tables.filter(col("vec_id") < 10)
      .select(col("tbl").as("q_tbl"), col("bucket").as("q_bucket"),
        col("vec_id").as("query_id"), col("embedding").as("qv"))

    val cand = tables
      .join(broadcast(queries),
        col("tbl") === col("q_tbl") && col("bucket") === col("q_bucket") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qv"), col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    cand
      .withColumn("score", cosine(col("embedding"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF ANN (the partition-pruned scale path): 16 centroids (seeded +
    * one Lloyd step), nprobe=4 → each query scans ~1/4 of the corpus.
    * Scores are exact (re-ranked with the codegen cosine); recall is
    * approximate → rows-only driver check, with the recall floor asserted
    * against brute force in RetrievalSpec. */
  def qKnnIvf(s: SparkSession, d: String): DataFrame = {
    import graft.retrieval.IvfIndex
    val emb = Tables.embeddings(s, d)
    val centroids = IvfIndex.buildCentroids(emb, "vec_id", "embedding", 16)
    val index = IvfIndex.assign(emb, "vec_id", "embedding", centroids)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    IvfIndex.search(index, "vec_id", "embedding", queries, centroids,
      nprobe = 4, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vs_knn_brute" -> (qKnnBrute _),
    "vs_emb_neardup" -> (qEmbNearDup _),
    "vs_label_stats" -> (qLabelStats _),
    "vs_knn_lsh" -> (qKnnLsh _),
    "vs_knn_ivf" -> (qKnnIvf _),
  )

  def oracles: Map[String, String] = Map(
    "vs_knn_brute" -> qKnnBruteSql,
    "vs_emb_neardup" -> qEmbNearDupSql,
    "vs_label_stats" -> qLabelStatsSql,
    // vs_knn_lsh: approximate — rows-only check (no oracle entry)
  )
}
