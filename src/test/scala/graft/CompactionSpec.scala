package graft

import graft.operators.{Compaction, ZOrder}
import org.apache.spark.sql.functions._

/** Compaction planner: file-count math from real on-disk sizes, value
  * preservation, and the N-column z-value generalization. */
class CompactionSpec extends SparkSpec {

  test("compaction collapses a many-small-files table to the planned count") {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    // fragment: 40 files of ~250 rows
    spark.range(10000).select(col("id"), md5(col("id").cast("string")).as("pay"))
      .repartition(40).write.mode("overwrite").parquet(s"$base/frag")
    val frag = spark.read.parquet(s"$base/frag")
    assert(frag.inputFiles.length >= 40)

    val bytes = Compaction.inputBytes(frag)
    assert(bytes > 0)
    // target quarter-of-total per file → plan 4 files
    val n = Compaction.compact(frag, s"$base/out", targetBytes = bytes / 4 + 1)
    assert(n == 4, s"planned $n files")
    val out = spark.read.parquet(s"$base/out")
    assert(out.inputFiles.length == 4, s"wrote ${out.inputFiles.length} files")
    // values preserved exactly
    assert(out.collect().map(_.toSeq).toSet ==
      frag.collect().map(_.toSeq).toSet)
  }

  test("zvalueN generalizes zvalue and interleaves three columns") {
    import spark.implicits._
    val df = Seq((3L, 5L, 9L)).toDF("x", "y", "w")
    val r = df.select(
      ZOrder.zvalue(col("x"), col("y"), 10).as("z2"),
      ZOrder.zvalueN(Seq(col("x"), col("y")), 10).as("z2n"),
      ZOrder.zvalueN(Seq(col("x"), col("y"), col("w")), 10).as("z3")).head()
    assert(r.getLong(0) == r.getLong(1), "zvalueN(2 cols) == zvalue")
    // bit-twiddled reference for 3 columns
    def ref3(x: Long, y: Long, w: Long): Long = {
      var z = 0L
      for (i <- 0 until 10) {
        z |= ((x >> i) & 1L) << (i * 3)
        z |= ((y >> i) & 1L) << (i * 3 + 1)
        z |= ((w >> i) & 1L) << (i * 3 + 2)
      }
      z
    }
    assert(r.getLong(2) == ref3(3, 5, 9))
  }
}
