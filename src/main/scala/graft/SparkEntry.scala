package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from the SURVEY §2 inventory
  * (or a beyond-reference training-data op), expressed Spark-first over the
  * driver's parquet tables; [[oracleSql]] holds the DuckDB-equivalent SQL
  * the driver uses for the hash-match correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    // expose the engine's SQL functions (cosine_sim, minhash_sig,
    // simhash60, word_ngrams) on the driver-owned session
    graft.functions.VectorFunctions.register(spark)
    RelationalQueries.q3TopOrders(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      EventQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      PipelineQueries.queries ++
      VectorQueries.queries ++
      MultimodalQueries.queries ++
      SearchQueries.queries ++
      RagQueries.queries

  /** Opt-in exact audits EXCLUDED from the default bench run (VERDICT
    * r10 item 2): both have a bounded `_topk` twin that IS the default
    * report — at 100× bench scale (sf10, PERF.md) the full-pair forms
    * are output/compute-bound (dd_winnowing 73.5 s vs 27.3 s top-k;
    * vs_emb_neardup 151.9 s vs 93.8 s) and at 100 TB they cannot run
    * at all, so the DEFAULT harness rows must be the forms that
    * survive the scale-up. Both stay in [[queries]]/[[oracleSql]], so
    * the correctness gate still checks them every round; the bench
    * includes them only under SPARK_GRAFT_BENCH_AUDIT=1. */
  val auditOnly: Set[String] = Set("dd_winnowing", "vs_emb_neardup")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++
      EventQueries.oracles ++
      TextQueries.oracles ++
      DedupQueries.oracles ++
      PipelineQueries.oracles ++
      VectorQueries.oracles ++
      MultimodalQueries.oracles ++
      SearchQueries.oracles ++
      RagQueries.oracles
}
