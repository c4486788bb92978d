package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two clustering
  * dimensions so that sorting by the combined value co-locates rows that
  * are close in BOTH dimensions — the multi-dimensional clustering trick
  * behind Delta/Iceberg `ZORDER BY` (public: Morton 1966; Databricks/
  * Iceberg docs describe the technique).
  *
  * Why it matters at 100 TB: parquet scans skip row groups whose min/max
  * stats exclude the predicate. A linear sort clusters ONE column, so a
  * two-dimensional box query (e.g. `n_chars BETWEEN a AND b AND quality
  * BETWEEN c AND d`) prunes on one dimension and reads everything the
  * other dimension would have excluded. Z-ordered files carry tight
  * min/max on BOTH columns, so the same box query reads a fraction of
  * the row groups (ZOrderSpec measures scan-emitted rows on both
  * layouts).
  *
  * The z-value is a pure Column program — shifts/masks unrolled per bit,
  * all inside whole-stage codegen (tier (a): no custom expression
  * needed); the write is `repartitionByRange(zval)` + an in-partition
  * sort, i.e. one range shuffle over the data being laid out, the same
  * cost as any linear re-sort.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative int
    * columns: result bit 2i = bit i of x, bit 2i+1 = bit i of y. Values
    * are clamped to the representable range first so outliers cannot
    * wrap. */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val max = (1L << bits) - 1
    val cx = least(greatest(x.cast("long"), lit(0L)), lit(max))
    val cy = least(greatest(y.cast("long"), lit(0L)), lit(max))
    (0 until bits).map { i =>
      (shiftright(cx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(cy, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** N-column Morton interleave: result bit (i·n + j) = bit i of column
    * j — the general form of [[zvalue]] (which it reproduces for n = 2
    * with arguments (x, y)). Total bits (bits × n) must fit a signed
    * long. Use 2–4 columns; beyond that each column contributes so few
    * high-order bits that the curve degenerates toward the first
    * columns' linear order. */
  def zvalueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "at least one column")
    require(bits >= 1 && bits * n <= 62, s"bits*$n must fit a long, got $bits")
    val max = (1L << bits) - 1
    val clamped = cols.map(c => least(greatest(c.cast("long"), lit(0L)), lit(max)))
    (for {
      i <- 0 until bits
      (c, j) <- clamped.zipWithIndex
    } yield shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j)))
      .reduce(_ + _)
  }

  /** Write `df` parquet-clustered by the z-value of (xCol, yCol): one
    * range shuffle, sorted within partitions so every output file covers
    * a contiguous z-range (tight min/max on both source columns).
    * `maxRecordsPerFile` bounds file granularity — the pruning unit. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
                    path: String, maxRecordsPerFile: Int = 0): Unit = {
    val z = zvalue(col(xCol), col(yCol), bits).as("__z")
    val withZ = df.withColumn("__z", z)
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val writer = withZ
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
      writer.option("maxRecordsPerFile", maxRecordsPerFile.toLong)
    else writer).parquet(path)
  }
}
