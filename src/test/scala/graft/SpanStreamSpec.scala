package graft

import graft.queries.DedupQueries
import graft.streaming.SpanStream
import org.apache.spark.sql.functions._

/** Delta-maintained duplicated-span postings (SpanStream +
  * dd_substring_deltas): merge-on-read coverage equals the batch query,
  * cross-batch duplicated spans are found, and a redelivered batch is
  * byte-idempotent.
  */
class SpanStreamSpec extends SparkSpec {

  test("merged deltas reproduce the batch coverage on the real corpus") {
    val sf = "/root/testdata/sf0.001"
    val direct = DedupQueries.qDedupSubstring(spark, sf).collect().toSeq
    val deltas = DedupQueries.qDedupSubstringDeltas(spark, sf).collect().toSeq
    assert(deltas == direct,
      "delta-merged span coverage must equal the direct scan")
  }

  test("cross-batch duplicated span: each batch alone is clean, the union is not") {
    import spark.implicits._
    // doc 0 (batch 0) and doc 1 (batch 1) share an 8-token span; doc 2
    // (batch 2) is unique — only the MERGED postings can see the dup
    val span = "s1 s2 s3 s4 s5 s6 s7 s8"
    val dir = java.nio.file.Files.createTempDirectory("spanx").toString
    SpanStream.writeDelta(
      Seq((0L, s"$span a b")).toDF("doc_id", "text"), dir, 0L)
    SpanStream.writeDelta(
      Seq((1L, s"c d $span")).toDF("doc_id", "text"), dir, 1L)
    SpanStream.writeDelta(
      Seq((2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")).toDF("doc_id", "text"), dir, 2L)
    val cov = SpanStream.coverage(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cov(0L) == 8L, s"doc 0 dup span found across batches: $cov")
    assert(cov(1L) == 8L)
    assert(cov(2L) == 0L, "unique doc stays clean")
  }

  test("redelivered batch is byte-idempotent; coverage unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spanr").toString
    val b0 = Seq((0L, "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8"))
      .toDF("doc_id", "text")
    SpanStream.writeDelta(b0, dir, 0L)
    val before = SpanStream.coverage(spark, dir).collect().toSeq
    SpanStream.writeDelta(b0, dir, 0L) // crash-replay redelivery
    val after = SpanStream.coverage(spark, dir).collect().toSeq
    assert(after == before, "replay must overwrite, never double-count")
    assert(before.head.getLong(2) == 16L, "within-doc repeat fully covered")
  }

  test("batch dirs fold under compaction; coverage byte-identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spanc").toString
    (0 until 4).foreach { b =>
      SpanStream.writeDelta(
        Seq((b.toLong, s"w$b x1 x2 x3 x4 x5 x6 x7 x8")).toDF("doc_id", "text"),
        dir, b.toLong)
    }
    val before = SpanStream.coverage(spark, dir).collect().toSeq
    assert(graft.operators.Compaction.foldBatchDirs(spark, s"$dir/ng", upTo = 4L))
    assert(graft.operators.Compaction.foldBatchDirs(spark, s"$dir/doclen", upTo = 4L))
    val after = SpanStream.coverage(spark, dir).collect().toSeq
    assert(after == before, "folded store must serve identical coverage")
    // the fold actually reduced the directory count
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ngDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/ng"))
      .count(_.getPath.getName.startsWith("batch="))
    assert(ngDirs == 1, s"4 deltas must fold into one dir, got $ngDirs")
  }

  test("empty index base case: coverage over no deltas is empty, not an error") {
    val dir = java.nio.file.Files.createTempDirectory("spane").toString
    assert(SpanStream.coverage(spark, dir).collect().isEmpty)
  }
}
