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
  /** One resolved relation per (sf-dir, table): `spark.read.parquet`
    * lists the directory and reads parquet footers for schema inference
    * EVERY call, and a bench/verify run calls each loader hundreds of
    * times — that repeated driver-side metadata work is pure
    * planner-constant overhead (guide §6 file listing, §7.3). The cached
    * DataFrame is only the analyzed logical relation (no data is
    * persisted; every action still computes from parquet), exactly what
    * a catalog table would give. Evicted with the sf-dir through the
    * [[Caches]] lifecycle like every other per-dir cache. */
  private val relCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  Caches.addCloser {
    case Some(dir) =>
      relCache.keys.filter(_._1 == dir).foreach(relCache.remove)
    case None => relCache.clear()
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    relCache.getOrElseUpdate((dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))

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
    // enforce the scan-rooted precondition structurally (ADVICE r15):
    // under AQE, `.rdd` on a frame with an upstream shuffle would
    // eagerly RUN its query stages just to read a partition count. Only
    // narrow nodes over a leaf may appear; anything else skips the probe
    // and leaves the frame untouched.
    import org.apache.spark.sql.catalyst.plans.logical._
    val scanRooted = df.queryExecution.analyzed.collect {
      case _: Project | _: Filter | _: SubqueryAlias | _: Generate => 0
      case _: LeafNode => 0
      case other => 1
    }.sum == 0
    val parts =
      if (!scanRooted) target
      else
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
