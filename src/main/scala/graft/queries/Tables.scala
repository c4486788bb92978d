package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic parquet tables (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned-parquet scans on a cluster; the
  * queries in this package are written so Catalyst pushes filters + prunes
  * columns into the scan (verify with `.explain("formatted")` →
  * `PushedFilters` / `ReadSchema`).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Conditional kernel spread (optimization guide §2.5, input skew): a
    * small parquet table is ONE input split (`maxPartitionBytes`), so an
    * expensive per-row kernel fused into the scan stage (md5 per char
    * position, DP cells, signature hashing) runs on one core of the
    * whole machine. When the scan has fewer partitions than the cluster
    * has cores, hash-repartition on a deterministic key BEFORE the
    * kernel — the explicit partition count keeps AQE from coalescing
    * the tiny exchange back to one partition. At 100 TB the scan side
    * has thousands of splits and this is a provable no-op (no exchange
    * added). Only safe on scan-rooted frames (no upstream exchange —
    * `.rdd` here materializes the physical plan, which must not trigger
    * query-stage execution). */
  private[graft] def spread(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts =
      try df.rdd.getNumPartitions
      catch { case scala.util.control.NonFatal(_) => target }
    if (parts < target) df.repartition(target, keys: _*) else df
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  /** The events parquet's `ts` physical type varies by generator version:
    * TIMESTAMP(NANOS) (unreadable by Spark's vectorized reader except as
    * nanos-as-long), TIMESTAMP(MICROS) without UTC adjustment (read as
    * TIMESTAMP_NTZ), or a plain session-TZ timestamp. Normalize all three
    * to Spark's native micro-precision TimestampType so every downstream
    * query (and its DuckDB oracle, which sees a naive timestamp in all
    * cases) gets identical values under the UTC session zone. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")

  /** The embeddings table is scanned several times per vector query
    * (query-side, corpus-side, centroid build) and by five queries per
    * run — persist it once per sf-dir, like a production vector store
    * pinning its index segment in memory. */
  private val embCache = Caches.register(
    scala.collection.concurrent.TrieMap.empty[String, DataFrame])
  def embeddings(s: SparkSession, d: String): DataFrame =
    embCache.getOrElseUpdate(d, t(s, d, "embeddings").persist())
}
