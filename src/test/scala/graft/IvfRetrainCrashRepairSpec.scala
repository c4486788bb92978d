package graft

import graft.retrieval.IvfIndex
import graft.streaming.EmbedStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** ADVICE r12 regression suite for the retrain crash-repair protocol
  * ([[EmbedStream.retrainIvf]] + [[graft.operators.Compaction]]).
  *
  * The high finding: a crash INSIDE the commit's delete→rename window
  * leaves some original `batch=` dirs deleted while the staged rewrite
  * (`_retrain.tmp`) holds those rows' only copy — and the old repair
  * discarded that stage at stage-entry and re-staged from the surviving
  * SUBSET, losing the deleted rows permanently. The fix makes the stage
  * self-contained (its centroids ride inside, `_staged/centroids`) and
  * the pending repair RESUME such a stage instead of discarding it.
  * Each test here constructs one crash state with the same primitives
  * the real path uses, then runs the repair and asserts losslessness
  * and geometry consistency.
  */
class IvfRetrainCrashRepairSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32

  private def famVec(fam: Int, salt: Long): Seq[Float] = {
    val rnd = new java.util.Random(salt * 6271L + fam)
    Seq.tabulate(dim) { i =>
      if (i == fam) 1.0f
      else if (i >= 8) (0.01 * rnd.nextGaussian()).toFloat
      else 0f
    }
  }

  /** Build a two-batch stored index (c=4) and return its dir. */
  private def buildIndex(): String = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val frame = input.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val dir = java.nio.file.Files.createTempDirectory("ivf-crash").toString
    val q = EmbedStream.startIvf(spark, frame, s"$dir/index", s"$dir/reports",
      s"$dir/ckpt", c = 4, k = 3, nprobe = 2)
    try {
      input.addData((0 until 24).map(i => (i.toLong, famVec(i % 4, i))): _*)
      q.processAllAvailable()
      input.addData((100 until 124).map(i => (i.toLong, famVec(i % 4, i))): _*)
      q.processAllAvailable()
    } finally q.stop()
    dir
  }

  private def storedIds(dir: String): Set[Long] =
    spark.read.parquet(s"$dir/index/lists")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet

  /** Stage a complete SELF-CONTAINED retrain rewrite exactly as
    * retrainIvf does (same primitives, same layout), stopping right
    * before the index-root centroid write — i.e. the moment the
    * `_retrain_pending` marker goes up. Returns the rebuilt centroids. */
  private def stageRetrain(dir: String, c: Int): Array[(Int, Array[Float])] = {
    val all = spark.read.parquet(s"$dir/index/lists")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val rebuilt = IvfIndex.buildCentroids(all, "vec_id", "embedding", c)
    val reassigned = IvfIndex.withQ8(
      IvfIndex.assign(all, "vec_id", "embedding", rebuilt), "embedding")
      .localCheckpoint()
    assert(graft.operators.Compaction.stageRewriteBatchDirs(
      spark, s"$dir/index/lists", Long.MaxValue,
      partitionCols = Seq("centroid_id"),
      rewrite = _ => reassigned, tmpName = "_retrain.tmp"))
    IvfIndex.writeCentroids(spark, rebuilt, s"$dir/index/lists/_retrain.tmp/_staged")
    new java.io.File(s"$dir/index/_retrain_pending").createNewFile()
    rebuilt
  }

  private def sameCentroids(a: Array[(Int, Array[Float])],
      b: Array[(Int, Array[Float])]): Boolean =
    a.length == b.length && a.zip(b).forall { case ((i, u), (j, v)) =>
      i == j && u.length == v.length &&
        u.zip(v).forall { case (x, y) => math.abs(x - y) < 1e-6f }
    }

  test("mid-commit crash (originals partially deleted): repair resumes the " +
    "stage and loses no rows — ADVICE r12 high") {
    val dir = buildIndex()
    val before = storedIds(dir)
    assert(before.size == 48)
    val rebuilt = stageRetrain(dir, c = 8)
    // ...retrainIvf then wrote the root centroids and entered the
    // commit: marker up, stamp bumped, one original dir already
    // deleted — and the process died before the rename
    IvfIndex.writeCentroids(spark, rebuilt, s"$dir/index")
    new java.io.File(s"$dir/index/lists/_fold_inprogress").createNewFile()
    new java.io.File(s"$dir/index/lists/_fold_stamp.1").createNewFile()
    val victim = new java.io.File(s"$dir/index/lists/batch=0")
    assert(victim.isDirectory)
    org.apache.commons.io.FileUtils.deleteDirectory(victim)
    assert(storedIds(dir) != before, "crash state must actually be a subset")

    // the repair: with the old discard-and-restage protocol this
    // rebuilt from the surviving subset and batch=0's rows were gone
    assert(EmbedStream.retrainIvf(spark, s"$dir/index"), "pending repair must run")
    assert(storedIds(dir) == before,
      "resume-first repair must recover every row from the staged copy")
    val live = IvfIndex.loadCentroids(spark, s"$dir/index")
    assert(sameCentroids(live, rebuilt.sortBy(_._1)),
      "root centroids must be the staged geometry the lists were assigned under")
    assert(!new java.io.File(s"$dir/index/_retrain_pending").exists())
    assert(!new java.io.File(s"$dir/index/lists/_fold_inprogress").exists())
    assert(!new java.io.File(s"$dir/index/lists/_retrain.tmp").exists())
    assert(EmbedStream.geomEpoch(spark, s"$dir/index") >= 1L)
    // the _staged residue that rode into the live dir with the rename
    // is swept, and serving works end to end on the repaired store
    val liveDirs = new java.io.File(s"$dir/index/lists").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(liveDirs.nonEmpty &&
      liveDirs.forall(d => !new java.io.File(d, "_staged").exists()))
    val hits = EmbedStream.probeVector(spark, s"$dir/index",
      famVec(1, 9001L).toArray, k = 3, nprobe = 8)
    assert(hits.nonEmpty)
  }

  test("crash between marker and root centroid write: repair commits the " +
    "staged pairing, never torn geometry") {
    val dir = buildIndex()
    val before = storedIds(dir)
    val old = IvfIndex.loadCentroids(spark, s"$dir/index")
    val rebuilt = stageRetrain(dir, c = 8)
    // died here: marker up, stage complete, root centroids still OLD —
    // committing the stage without re-writing the centroids from it
    // would serve old geometry over new assignments forever
    assert(EmbedStream.retrainIvf(spark, s"$dir/index"), "pending repair must run")
    assert(storedIds(dir) == before)
    val live = IvfIndex.loadCentroids(spark, s"$dir/index")
    assert(!sameCentroids(live, old), "repair must not keep the old geometry")
    assert(sameCentroids(live, rebuilt.sortBy(_._1)),
      "repair must install the centroids the staged lists were assigned under")
    assert(!new java.io.File(s"$dir/index/_retrain_pending").exists())
  }

  test("a STALE stage (store grew since staging) is discarded, never " +
    "resumed — r13 review find: resume would duplicate or tear") {
    val dir = buildIndex()
    val oldCents = IvfIndex.loadCentroids(spark, s"$dir/index")
    stageRetrain(dir, c = 8)
    // ...the process died pre-commit; ingest restarted and appended a
    // batch assigned under the still-current OLD geometry
    val extra = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (200 until 212).map(i => org.apache.spark.sql.Row(
          i.toLong, famVec(i % 4, i)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val assignedExtra = IvfIndex.withQ8(
      IvfIndex.assign(extra, "vec_id", "embedding", oldCents), "embedding")
    assignedExtra.write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$dir/index/lists/batch=2")
    val want = storedIds(dir)
    assert(want.size == 60)

    // a fold must defer to the unresolved pending swap (it would fold
    // a listing the stage no longer matches)
    assert(!EmbedStream.compactIndex(spark, s"$dir/index", Long.MaxValue),
      "fold must skip while a pending retrain stage is stale/unresolved")

    // the repair must DISCARD the stale stage and rebuild over the
    // grown store: every id exactly once, assignments consistent with
    // the root centroids (a resume would have left batch=2 torn)
    assert(EmbedStream.retrainIvf(spark, s"$dir/index"), "pending repair must run")
    val rows = spark.read.parquet(s"$dir/index/lists")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(rows.size == rows.distinct.size, "no id may appear twice")
    assert(rows.toSet == want, "all ids exactly once after repair")
    val cents = IvfIndex.loadCentroids(spark, s"$dir/index")
    val fresh = IvfIndex.assign(
      spark.read.parquet(s"$dir/index/lists")
        .select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", cents)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val stored = spark.read.parquet(s"$dir/index/lists")
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(stored.forall { case (id, cid) => fresh(id) == cid },
      "no torn assignments after the stale-stage repair")
    assert(!new java.io.File(s"$dir/index/_retrain_pending").exists())
    assert(!new java.io.File(s"$dir/index/lists/_retrain.tmp").exists())
  }

  test("mid-commit crash WITH a post-crash ingest append: resume is " +
    "mandatory and keeps the appended batch consistent") {
    val dir = buildIndex()
    val before = storedIds(dir)
    val rebuilt = stageRetrain(dir, c = 8)
    IvfIndex.writeCentroids(spark, rebuilt, s"$dir/index")
    new java.io.File(s"$dir/index/lists/_fold_inprogress").createNewFile()
    new java.io.File(s"$dir/index/lists/_fold_stamp.1").createNewFile()
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$dir/index/lists/batch=0"))
    // restart ingest appends under the (already durable) NEW geometry —
    // exactly what ivfReportFor would do reading the root centroids
    val extra = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (300 until 310).map(i => org.apache.spark.sql.Row(
          i.toLong, famVec(i % 4, i)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    IvfIndex.withQ8(
      IvfIndex.assign(extra, "vec_id", "embedding", rebuilt), "embedding")
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$dir/index/lists/batch=2")

    assert(EmbedStream.retrainIvf(spark, s"$dir/index"), "pending repair must run")
    val ids = spark.read.parquet(s"$dir/index/lists")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(ids.size == ids.distinct.size, "no duplicates after resume")
    assert(ids.toSet == before ++ (300L until 310L),
      "staged rows recovered AND the appended batch preserved")
    val cents = IvfIndex.loadCentroids(spark, s"$dir/index")
    assert(sameCentroids(cents, rebuilt.sortBy(_._1)))
    assert(!new java.io.File(s"$dir/index/_retrain_pending").exists())
  }

  test("pending repair over a PRE-UPGRADE stage ('='-form marker, no input " +
    "record) REFUSES to auto-rebuild — ADVICE r13: its commit may have begun") {
    val dir = buildIndex()
    // a stage written by a pre-_staged_inputs build: '='-form fold
    // marker + _SUCCESS, no _staged_inputs, no _staged centroids — and
    // the pending marker is set, so the crashed run may have begun
    // deleting original dirs whose rows survive only in this stage
    val tmp = new java.io.File(s"$dir/index/lists/_retrain.tmp")
    tmp.mkdirs()
    new java.io.File(tmp, "_folded_upto=1").createNewFile()
    new java.io.File(tmp, "_SUCCESS").createNewFile()
    new java.io.File(s"$dir/index/_retrain_pending").createNewFile()
    val e = intercept[IllegalStateException] {
      EmbedStream.retrainIvf(spark, s"$dir/index")
    }
    assert(e.getMessage.contains("PRE-UPGRADE"))
    assert(tmp.exists(), "the refusal must leave the stage untouched")
    // manual adjudication path (b): operator verified originals intact
    org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    new java.io.File(s"$dir/index/_retrain_pending").delete()
    assert(storedIds(dir).size == 48, "store readable after manual repair")
  }

  test("pending repair over an INTERMEDIATE-generation stage (dot marker + " +
    "staged centroids, no input record) also refuses — its commit gate was " +
    "marker + _SUCCESS too") {
    val dir = buildIndex()
    // the generation that staged centroids inside the tmp dir but did
    // not yet record _staged_inputs: its commit could begin on marker +
    // _SUCCESS alone, so a surviving stage may hold deleted rows' only
    // copy exactly like the '='-form case (review find on the first
    // '='-only discriminator: dot-form stages of that generation were
    // silently discarded)
    val all = spark.read.parquet(s"$dir/index/lists")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val rebuilt = IvfIndex.buildCentroids(all, "vec_id", "embedding", 8)
    assert(graft.operators.Compaction.stageRewriteBatchDirs(
      spark, s"$dir/index/lists", Long.MaxValue,
      partitionCols = Seq("centroid_id"),
      rewrite = _ => IvfIndex.withQ8(
        IvfIndex.assign(all, "vec_id", "embedding", rebuilt), "embedding"),
      tmpName = "_retrain.tmp"))
    IvfIndex.writeCentroids(spark, rebuilt,
      s"$dir/index/lists/_retrain.tmp/_staged")
    // strip the input record this build wrote — the stage now looks
    // exactly like the intermediate generation's
    new java.io.File(s"$dir/index/lists/_retrain.tmp/_staged_inputs").delete()
    new java.io.File(s"$dir/index/_retrain_pending").createNewFile()
    val e = intercept[IllegalStateException] {
      EmbedStream.retrainIvf(spark, s"$dir/index")
    }
    assert(e.getMessage.contains("PRE-UPGRADE"))
    assert(new java.io.File(s"$dir/index/lists/_retrain.tmp").exists(),
      "the refusal must leave the stage untouched")
  }

  test("pending repair with an INCOMPLETE stage falls back to the " +
    "deterministic restage (originals intact by construction)") {
    val dir = buildIndex()
    val before = storedIds(dir)
    stageRetrain(dir, c = 8) // staged geometry will be legitimately discarded
    // strip the staged centroids: the stage is no longer provably
    // paired, so the repair must discard it and rebuild from the
    // (necessarily intact) originals
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$dir/index/lists/_retrain.tmp/_staged"))
    assert(EmbedStream.retrainIvf(spark, s"$dir/index"), "pending repair must run")
    assert(storedIds(dir) == before)
    val live = IvfIndex.loadCentroids(spark, s"$dir/index")
    // the restage re-derives c from the corpus scale rule — geometry is
    // consistent even though it need not equal the crashed attempt's
    assert(live.nonEmpty)
    assert(IvfIndex.assign(
      spark.read.parquet(s"$dir/index/lists").select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", live).groupBy(col("centroid_id")).count().count() > 0)
    assert(!new java.io.File(s"$dir/index/_retrain_pending").exists())
    assert(!new java.io.File(s"$dir/index/lists/_retrain.tmp").exists())
  }
}
