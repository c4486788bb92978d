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
