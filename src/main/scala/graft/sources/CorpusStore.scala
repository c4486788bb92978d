package graft.sources

import graft.model.{Node, RawDoc, RepoRef}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources and sinks (SURVEY §2.1).
  *
  * The corpus store is one parquet dataset partitioned by `scope` — the
  * Spark twin of the reference's five Cassandra tables
  * (ingest_controller.py:369-375): reading one scope prunes to one
  * partition directory, and the (namespace, repo) filter pushes into
  * parquet row-group stats. At 100 TB add bucketing by (namespace, repo)
  * when writing to a metastore-backed table; the query shapes here are
  * unchanged.
  */
object CorpusStore {

  /** S5: scope-partitioned corpus sink. */
  def write(nodes: Dataset[Node], path: String): Unit =
    nodes.write.mode(SaveMode.Overwrite).partitionBy("scope").parquet(path)

  /** Metastore-backed corpus table, partitioned by scope and bucketed +
    * sorted by (namespace, repo): the retrieval filters prune on scope,
    * the (namespace, repo) equality filters and the rollup/self joins are
    * co-located — two tables bucketed the same way join with NO exchange
    * on either side. This is the 100 TB layout (SURVEY §4: "bucketed/
    * sorted by (namespace, repo)"); the path-based writer stays for
    * catalog-less deployments. */
  def writeBucketed(
      nodes: Dataset[Node],
      table: String,
      buckets: Int = 8): Unit =
    nodes.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .partitionBy("scope")
      .bucketBy(buckets, "namespace", "repo")
      .sortBy("namespace", "repo")
      .saveAsTable(table)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S7: per-scope row counts (health check surface). */
  def counts(spark: SparkSession, path: String): Map[String, Long] =
    read(spark, path).groupBy("scope").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** S1+F5: repo enumeration — the driver-side HTTP listing lands in a
    * `Seq[RepoRef]`; ingest-eligible repos are the non-fork, non-archived,
    * non-private ones (reference github_service.py:63-71). The enumeration
    * itself stays driver-side by design: it is a paginated API walk, tiny
    * next to the file fetch that follows, and its output seeds the
    * per-repo partition parallelism of [[readRepoDir]]. */
  def eligibleRepos(
      spark: SparkSession,
      listed: Seq[RepoRef],
      includeForks: Boolean = false): Dataset[RepoRef] = {
    import spark.implicits._
    spark.createDataset(listed)
      .filter(r => !r.isArchived && !r.isPrivate && (includeForks || !r.isFork))
  }

  /** S2-as-local-files: read a repo checkout from a directory tree into
    * Dataset[RawDoc] (the GithubRepositoryReader twin; executors read
    * files in parallel via binaryFile). */
  def readRepoDir(
      spark: SparkSession,
      root: String,
      namespace: String,
      repo: String,
      branch: String = "main"): Dataset[RawDoc] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(
        lit(namespace).as("namespace"),
        lit(repo).as("repo"),
        lit(branch).as("branch"),
        regexp_replace(col("path"), s"^file:${java.util.regex.Pattern.quote(root)}/?", "")
          .as("filePath"),
        col("content").cast("string").as("text"))
      .as[RawDoc]
  }

  /** S3: debug dump of transformed docs. */
  def dumpJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
