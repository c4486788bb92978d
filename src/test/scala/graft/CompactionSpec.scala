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

  test("foldBatchDirs: deltas fold into one batch dir, rows and visibility kept") {
    val root = java.nio.file.Files.createTempDirectory("fold").toString
    (0L to 3L).foreach { b =>
      spark.range(b * 100, b * 100 + 100)
        .select(col("id"), md5(col("id").cast("string")).as("pay"))
        .repartition(5).write.parquet(s"$root/batch=$b")
    }
    val before = spark.read.parquet(s"$root/batch=0", s"$root/batch=1",
      s"$root/batch=2").collect().map(_.toSeq).toSet

    // upTo=3: ids 0..2 fold into batch=2; batch=3 (the only id that may
    // still replay) is untouched
    assert(Compaction.foldBatchDirs(spark, root, upTo = 3L))
    // batch= entries only: the commit also leaves its _fold_stamp.N
    // marker (the serving brackets' swap counter) in the root
    val dirs = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=2", "batch=3"), s"dirs after fold: $dirs")
    assert(Compaction.storeStamp(spark, root) == 1L,
      "the fold commit must have bumped the store stamp")
    val folded = spark.read.parquet(s"$root/batch=2")
    assert(folded.collect().map(_.toSeq).toSet == before,
      "strictly-before readers of the replay batch see identical rows")
    assert(folded.inputFiles.length < 15,
      s"compaction must shrink the 15 delta files: ${folded.inputFiles.length}")
    // idempotent: a second pass has a single foldable dir → no-op
    assert(!Compaction.foldBatchDirs(spark, root, upTo = 3L))
  }

  test("foldBatchDirs: a crash between delete and rename resumes losslessly") {
    val root = java.nio.file.Files.createTempDirectory("foldcrash").toString
    (0L to 2L).foreach { b =>
      spark.range(b * 10, b * 10 + 10).select(col("id"))
        .write.parquet(s"$root/batch=$b")
    }
    val all = spark.read.parquet(s"$root/batch=0", s"$root/batch=1")
      .collect().map(_.getLong(0)).toSet

    // hand-build the exact on-disk state of a fold that crashed after
    // staging AND after deleting one original: stage = full union +
    // marker + _SUCCESS, batch=0 already gone
    spark.read.parquet(s"$root/batch=0", s"$root/batch=1")
      .repartition(1).write.parquet(s"$root/compact.tmp")
    new java.io.File(s"$root/compact.tmp/_folded_upto.1").createNewFile()
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rm(java.nio.file.Paths.get(root, "batch=0"))

    // the next maintenance pass completes the recorded swap first —
    // with upTo=2 nothing NEW is foldable afterwards (just the
    // resumed batch=1 plus the replayable batch=2)
    assert(!Compaction.foldBatchDirs(spark, root, upTo = 2L))
    val dirs = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=1", "batch=2"), s"dirs after resume: $dirs")
    assert(spark.read.parquet(s"$root/batch=1").collect()
      .map(_.getLong(0)).toSet == all, "no rows lost across the crash")
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

  test("stableAcrossFolds: blocks on the in-progress marker, recovers, throws with cause") {
    val root = java.nio.file.Files.createTempDirectory("stampbracket").toString
    spark.range(0, 10).select(col("id"))
      .write.parquet(s"$root/batch=0")
    spark.range(10, 20).select(col("id"))
      .write.parquet(s"$root/batch=1")

    // steady state: one attempt, result returned
    val n = Compaction.stableAcrossFolds(spark, Seq(root)) {
      spark.read.parquet(s"$root/batch=0", s"$root/batch=1").count()
    }
    assert(n == 20)

    // the delete->rename window: _fold_inprogress held. A reader BORN
    // inside it must not serve (the stamp alone would read the bumped
    // value on both sides of a subset listing) — it blocks, and serves
    // as soon as the marker clears
    val marker = new java.io.File(root, "_fold_inprogress")
    assert(marker.createNewFile())
    val cleared = new java.util.concurrent.atomic.AtomicBoolean(false)
    val clearer = new Thread(() => {
      Thread.sleep(300); cleared.set(true); marker.delete(); ()
    })
    clearer.start()
    val m = Compaction.stableAcrossFolds(spark, Seq(root)) {
      spark.read.parquet(s"$root/batch=0", s"$root/batch=1").count()
    }
    clearer.join()
    assert(m == 20 && cleared.get(),
      "the bracket must have waited for the marker to clear before serving")

    // a stamp moving between the bracket's sides also forces a retry:
    // builds that straddle a commit are discarded even with no
    // exception anywhere
    var calls = 0
    val r = Compaction.stableAcrossFolds(spark, Seq(root)) {
      calls += 1
      if (calls == 1) {
        // simulate a fold commit landing mid-build
        new java.io.File(root, "_fold_stamp.7").createNewFile()
      }
      calls
    }
    assert(r == 2, s"first build straddled the bump and must be discarded, got $r")

    // exhaustion surfaces the last underlying failure as the cause
    assert(marker.createNewFile())
    val ex = intercept[IllegalStateException] {
      Compaction.stableAcrossFolds(spark, Seq(root), attempts = 2,
        backoffMs = 1L) { 42 }
    }
    assert(ex.getMessage.contains("no fold-stable read"))
    marker.delete()
  }
}
