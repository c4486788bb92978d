package graft

import graft.operators.ZOrder
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness (bit-level reference) and the
  * measured effect the layout exists for — a two-dimensional box query
  * reads fewer parquet rows from a z-ordered table than from a linearly
  * sorted one, because row-group min/max stats stay tight on BOTH
  * dimensions. The td_zorder DuckDB oracle value-checks the same
  * interleave arithmetic at the driver gate.
  */
class ZOrderSpec extends SparkSpec {

  private def interleaveRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zvalue matches a bit-twiddling reference, clamps out-of-range") {
    import spark.implicits._
    val rows = Seq[(Long, Long)](
      (0, 0), (1, 0), (0, 1), (3, 5), (1023, 1023), (512, 17),
      (-5, 2), (4096, 9) // clamped to 0 and 1023
    ).toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y"), 10).as("z"))
      .collect()
    rows.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      val cx = math.min(math.max(x, 0L), 1023L)
      val cy = math.min(math.max(y, 0L), 1023L)
      assert(r.getLong(2) == interleaveRef(cx, cy, 10),
        s"z($x,$y) = ${r.getLong(2)}")
    }
    // locality sanity: neighbors in both dims sit closer in z than rows
    // far apart in the second dim alone
    assert(math.abs(interleaveRef(100, 100, 10) - interleaveRef(101, 101, 10)) <
      math.abs(interleaveRef(100, 100, 10) - interleaveRef(100, 900, 10)))
  }

  test("box query reads fewer rows from z-ordered files than linear-sorted") {
    import spark.implicits._
    val n = 40000
    // two independent uniform dimensions derived from the row id
    val data = spark.range(n.toLong)
      .select(
        pmod(xxhash64(col("id")), lit(1024)).as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(1024)).as("y"),
        col("id"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    // linear layout: globally sorted by x (the best single-column layout)
    data.repartitionByRange(4, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").option("maxRecordsPerFile", 250)
      .parquet(s"$base/linear")
    ZOrder.writeZOrdered(data, "x", "y", 10, s"$base/zorder",
      maxRecordsPerFile = 250)

    def scanRows(path: String): (Long, Long) = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = spark.read.parquet(path)
          .filter(col("x").between(100, 227) && col("y").between(300, 427))
        val matched = df.count()
        val df2 = spark.read.parquet(path)
          .filter(col("x").between(100, 227) && col("y").between(300, 427))
        df2.collect()
        val scanned = df2.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s.metrics("numOutputRows").value
        }.sum
        (matched, scanned)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    val (matchLin, rowsLin) = scanRows(s"$base/linear")
    val (matchZ, rowsZ) = scanRows(s"$base/zorder")
    assert(matchLin == matchZ, "layout must not change query results")
    assert(matchZ > 0, "box query should match something")
    // the point of the exercise: both-dimension clustering prunes row
    // groups the single-column sort cannot
    assert(rowsZ < rowsLin * 0.7,
      s"z-order read $rowsZ rows vs linear $rowsLin for a 2-D box query")
  }
}
