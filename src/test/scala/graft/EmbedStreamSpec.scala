package graft

import graft.streaming.EmbedStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental embedding probe: each micro-batch is matched
  * against the corpus accumulated by the PRIOR batches (cross-batch
  * near-dups found, first batch all-new), writes are idempotent per
  * batch id, and the corpus store grows by exactly the arrivals.
  */
class EmbedStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32

  private def vecLow(seed: Long): Seq[Float] = {
    val rnd = new java.util.Random(seed)
    Seq.tabulate(dim)(i => if (i < 16) rnd.nextGaussian().toFloat else 0f)
  }

  test("cross-batch probe: dup found against an earlier batch, writes idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val frame = input.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val dir = java.nio.file.Files.createTempDirectory("embstream").toString
    val q = EmbedStream.start(spark, frame, s"$dir/corpus", s"$dir/reports",
      s"$dir/ckpt")
    try {
      // batch 0: fresh corpus — everything is new
      input.addData((0 until 10).map(i => (i.toLong, vecLow(i * 7919L + 5))): _*)
      q.processAllAvailable()
      // batch 1: id 100 duplicates id 3 from batch 0; id 101 is orthogonal
      // (dims 16..31 — cosine exactly 0 against every corpus vector)
      val ortho = {
        val rnd = new java.util.Random(991L)
        Seq.tabulate(dim)(i => if (i >= 16) rnd.nextGaussian().toFloat else 0f)
      }
      input.addData((100L, vecLow(3 * 7919L + 5)), (101L, ortho))
      q.processAllAvailable()
    } finally q.stop()

    val r0 = spark.read.parquet(s"$dir/reports/batch=0")
    assert(r0.count() == 10 &&
      r0.filter(col("n_matches") =!= 0 || col("best_old_id").isNotNull).count() == 0,
      "first batch has no corpus to match against")

    val r1 = spark.read.parquet(s"$dir/reports/batch=1").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(r1.keySet == Set(100L, 101L))
    val (n, best, cos) = r1(100L)
    assert(n >= 1 && best.contains(3L) && cos.contains(1.0),
      s"batch-1 duplicate must match batch-0 id 3 at cosine 1: ${r1(100L)}")
    assert(r1(101L)._1 == 0L && r1(101L)._2.isEmpty,
      s"orthogonal arrival must be clean: ${r1(101L)}")

    // corpus store accumulated both batches exactly once, WITH their
    // stored cluster assignments (the probe never re-assigns old data)
    val corpus = spark.read.parquet(s"$dir/corpus/batch=0", s"$dir/corpus/batch=1")
    assert(corpus.count() == 12)
    assert(corpus.select(col("vec_id")).distinct().count() == 12)
    assert(corpus.filter(col("cluster_id").isNull).count() == 0,
      "every stored vector carries its assignment")

    // replay defense: foreachBatch re-delivers batch 1 after a crash —
    // reportFor with the same id must reproduce the SAME report even
    // though batch 1's own pre-crash corpus write is on disk (the
    // strictly-before id filter keeps it out of the probe)
    val b1 = spark.read.parquet(s"$dir/corpus/batch=1")
      .select(col("vec_id"), col("embedding"))
    val (replayReport, _) = EmbedStream.reportFor(spark, b1, s"$dir/corpus", 1L)
    val replayed = replayReport.collect()
      .map(r => r.getLong(0) -> ((r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(replayed == r1, "replayed batch must reproduce the same report")
  }

  // 4 orthogonal families + small deterministic wobble: within-family
  // cosine ≈ 1, across ≈ 0 — so each vector's true neighbors are its
  // family and a one-list probe suffices
  private def famVec(fam: Int, salt: Long): Seq[Float] = {
    val rnd = new java.util.Random(salt * 6271L + fam)
    Seq.tabulate(dim) { i =>
      if (i == fam) 1.0f
      else if (i >= 8) (0.01 * rnd.nextGaussian()).toFloat
      else 0f
    }
  }

  test("stored-IVF probe: stream≡batch parity, narrow probe scan, recall floor") {
    import graft.retrieval.IvfIndex
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val frame = input.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val dir = java.nio.file.Files.createTempDirectory("embstream-ivf").toString
    val batch0 = (0 until 40).map(i => (i.toLong, famVec(i % 4, i)))
    val batch1 = (100 until 112).map(i => (i.toLong, famVec(i % 4, i)))
    val q = EmbedStream.startIvf(spark, frame, s"$dir/index", s"$dir/reports",
      s"$dir/ckpt", c = 4, k = 5, nprobe = 2)
    try {
      input.addData(batch0: _*)
      q.processAllAvailable()
      input.addData(batch1: _*)
      q.processAllAvailable()
    } finally q.stop()

    // first batch: index seeded, no corpus to probe
    assert(spark.read.parquet(s"$dir/reports/batch=0").count() == 0)
    // the store accumulated both batches with assignment + q8 codes
    val lists = spark.read.option("basePath", s"$dir/index/lists")
      .parquet(s"$dir/index/lists/batch=0", s"$dir/index/lists/batch=1")
    assert(lists.count() == 52 &&
      lists.filter(col("centroid_id").isNull || col("q8").isNull).count() == 0)

    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val streamed = key(spark.read.parquet(s"$dir/reports/batch=1"))

    // batch twin: the same two-phase q8 search, called directly over the
    // batch-0 lists — the streamed report must be byte-identical
    val cents = IvfIndex.loadCentroids(spark, s"$dir/index")
    val direct = IvfIndex.searchQ8Lists(
      spark.read.parquet(s"$dir/index/lists/batch=0"), "vec_id", "embedding",
      batch1.map { case (id, v) => (id, v.toArray) }, cents, nprobe = 2, k = 5)
    assert(streamed == key(direct), "stream must equal the batch search")

    // recall floor vs driver-side brute force (the vs_knn_ivf_q8_recall
    // contract): every query's top-5 from the probed lists must recover
    // ≥ 0.8 of the true top-5 over the batch-0 corpus
    val got = spark.read.parquet(s"$dir/reports/batch=1").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def cosL(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    batch1.foreach { case (qid, qv) =>
      val truth = batch0.map { case (id, v) => (id, cosL(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      val recall = (got.getOrElse(qid, Set.empty) & truth).size / 5.0
      assert(recall >= 0.8, s"query $qid recall $recall < 0.8")
    }

    // replay: re-running batch 1 with its own pre-crash writes on disk
    // reproduces the same report (strictly-before list read), and its
    // probe phase scans only (vec_id, centroid_id, q8) — never floats
    val b1 = spark.read.parquet(s"$dir/index/lists/batch=1")
      .select(col("vec_id"), col("embedding"))
    val (replay, _) = EmbedStream.ivfReportFor(spark, b1, s"$dir/index", 1L,
      c = 4, k = 5, nprobe = 2)
    assert(key(replay) == streamed, "replayed IVF batch must reproduce the report")
    val p = replay.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.exists(l => l.contains("q8") && !l.contains("embedding")),
      s"no narrow probe scan:\n${scans.mkString("\n")}")
  }

  test("store compaction: batch dirs fold, replays still reproduce their reports") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val frame = input.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val dir = java.nio.file.Files.createTempDirectory("embstream-compact").toString
    val q = EmbedStream.start(spark, frame, s"$dir/corpus", s"$dir/reports",
      s"$dir/ckpt", c = 4)
    val batches = (0 until 3).map(b =>
      (b * 10 until b * 10 + 10).map(i => (i.toLong + 100 * b, famVec(i % 4, i))))
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val before = spark.read.parquet(s"$dir/corpus/batch=0",
      s"$dir/corpus/batch=1", s"$dir/corpus/batch=2")
      .collect().map(_.toSeq).toSet
    val r2 = spark.read.parquet(s"$dir/reports/batch=2")
      .collect().map(_.toSeq).toSet

    // fold everything the replayable batch (id 2) probes
    assert(EmbedStream.compactCorpus(spark, s"$dir/corpus", upTo = 2L))
    val dirs = new java.io.File(s"$dir/corpus").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=1", "batch=2"), s"after fold: $dirs")
    assert(spark.read.parquet(s"$dir/corpus/batch=1", s"$dir/corpus/batch=2")
      .collect().map(_.toSeq).toSet == before, "fold keeps every stored row")

    // a post-crash replay of batch 2 probes the compacted store and
    // reproduces the exact pre-compaction report
    val b2 = spark.read.parquet(s"$dir/corpus/batch=2")
      .select(col("vec_id"), col("embedding"))
    val (replay, _) = EmbedStream.reportFor(spark, b2, s"$dir/corpus", 2L, c = 4)
    assert(replay.collect().map(_.toSeq).toSet == r2,
      "replay over the compacted store must be byte-identical")

    // same pass over the IVF store: centroid_id layout survives the fold
    val input2 = MemoryStream[(Long, Seq[Float])]
    val frame2 = input2.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val q2 = EmbedStream.startIvf(spark, frame2, s"$dir/index", s"$dir/ivfrep",
      s"$dir/ckpt2", c = 4, k = 3, nprobe = 2)
    try {
      batches.foreach { b => input2.addData(b: _*); q2.processAllAvailable() }
    } finally q2.stop()
    val ivfR2 = spark.read.parquet(s"$dir/ivfrep/batch=2")
      .collect().map(_.toSeq).toSet
    assert(EmbedStream.compactIndex(spark, s"$dir/index", upTo = 2L))
    val listDirs = new java.io.File(s"$dir/index/lists").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(listDirs == Seq("batch=1", "batch=2"), s"after fold: $listDirs")
    assert(new java.io.File(s"$dir/index/lists/batch=1").listFiles()
      .exists(_.getName.startsWith("centroid_id=")),
      "folded lists keep the centroid_id partition layout")
    val ib2 = spark.read.parquet(s"$dir/index/lists/batch=2")
      .select(col("vec_id"), col("embedding"))
    val (ivfReplay, _) = EmbedStream.ivfReportFor(spark, ib2, s"$dir/index", 2L,
      c = 4, k = 3, nprobe = 2)
    assert(ivfReplay.collect().map(_.toSeq).toSet == ivfR2,
      "IVF replay over the compacted index must be byte-identical")
  }

  test("stored-IVF retrain: skew triggers a rebuild, recall recovers, no-op after") {
    import graft.retrieval.IvfIndex
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val frame = input.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val dir = java.nio.file.Files.createTempDirectory("embstream-retrain").toString
    // batch 0 spans four balanced families (centroids seed one per
    // family); the later batches drift into a FAT family-0-aligned blob
    // of four separable subfamilies — everything lands in list 0 (hot),
    // and a rebuild CAN rebalance by splitting the subfamilies (with
    // c = 4 the max possible skew is 4.0, so the trigger here is 2.5)
    def driftVec(salt: Long): Seq[Float] = {
      val rnd = new java.util.Random(salt * 7013L)
      val sub = 4 + (salt % 4).toInt
      Seq.tabulate(dim) { i =>
        if (i == 0) 1.0f
        else if (i == sub) 0.8f
        else if (i >= 8) (0.01 * rnd.nextGaussian()).toFloat
        else 0f
      }
    }
    val batch0 = (0 until 24).map(i => (i.toLong, famVec(i % 4, i)))
    val drift = (100 until 160).map(i => (i.toLong, driftVec(i)))
    val q = EmbedStream.startIvf(spark, frame, s"$dir/index", s"$dir/reports",
      s"$dir/ckpt", c = 4, k = 5, nprobe = 2)
    try {
      input.addData(batch0: _*)
      q.processAllAvailable()
      input.addData(drift.take(30): _*)
      q.processAllAvailable()
      input.addData(drift.drop(30): _*)
      q.processAllAvailable()
    } finally q.stop() // quiescent — the retrain contract

    def skewOf(nLists: Int): Double = {
      val counts = spark.read.parquet(s"$dir/index/lists")
        .groupBy(col("centroid_id")).count().collect().map(_.getLong(1))
      counts.max.toDouble / (counts.sum.toDouble / nLists)
    }
    val skewBefore = skewOf(4)
    assert(skewBefore > 2.5, s"fixture must drift into skew, got $skewBefore")
    val total = spark.read.parquet(s"$dir/index/lists").count()

    // a crashed mid-stage attempt (tmp, no marker) must be discarded;
    // the retrain grows c (4 → 8) — the grown corpus needs more lists
    // to split the hot blob, the scale-rule story
    val tmpDir = new java.io.File(s"$dir/index/lists/compact.tmp")
    tmpDir.mkdirs()
    assert(EmbedStream.retrainIvf(spark, s"$dir/index", c = 8, maxSkew = 2.5),
      "retrain must trigger")
    assert(!tmpDir.exists(), "crashed stage must be cleaned up")

    // every vector survives, reassigned with q8, in ONE folded dir
    val lists = spark.read.parquet(s"$dir/index/lists")
    assert(lists.count() == total)
    assert(lists.filter(col("centroid_id").isNull || col("q8").isNull).count() == 0)
    val batchDirs = new java.io.File(s"$dir/index/lists").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(batchDirs.length == 1, batchDirs.map(_.getName).mkString(","))
    assert(skewOf(8) <= 2.5, s"rebuild must balance the lists, got ${skewOf(8)}")

    // probes over the rebuilt, swapped index: at full probe width the
    // two-phase q8 search must equal driver-side brute force exactly —
    // the swapped lists carry every vector with consistent codes
    val cents = IvfIndex.loadCentroids(spark, s"$dir/index")
    val queries = (0 until 4).map(f => (f.toLong + 900L, famVec(f, 9000L + f).toArray))
    val res = IvfIndex.searchQ8Lists(
      spark.read.parquet(s"$dir/index/lists"), "vec_id", "embedding",
      queries, cents, nprobe = 8, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def cosL(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    queries.foreach { case (qid, qv) =>
      val truth = (batch0 ++ drift)
        .map { case (id, v) => (id, cosL(qv.toSeq, v)) }
        .sortBy { case (id, sc) => (-sc, id) }.take(5).map(_._1).toSet
      assert(res.getOrElse(qid, Set.empty) == truth,
        s"query $qid: ${res.getOrElse(qid, Set.empty)} != brute $truth")
    }

    // balanced index → the next maintenance pass is a no-op
    assert(!EmbedStream.retrainIvf(spark, s"$dir/index", c = 8, maxSkew = 2.5))
  }

  test("stored-IVF retrain repair: a pending marker forces the swap to complete") {
    import graft.retrieval.IvfIndex
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val frame = input.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val dir = java.nio.file.Files.createTempDirectory("embstream-repair").toString
    val rows = (0 until 32).map(i => (i.toLong, famVec(i % 4, i)))
    val q = EmbedStream.startIvf(spark, frame, s"$dir/index", s"$dir/reports",
      s"$dir/ckpt", c = 4, k = 5, nprobe = 2)
    try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()

    // the 4 equal families under c=4 are balanced: without a marker the
    // maintenance pass is a no-op (the existing trigger contract)
    assert(!EmbedStream.retrainIvf(spark, s"$dir/index", c = 8, maxSkew = 2.5))

    // simulate the crash window: a previous retrain attempt wrote the
    // marker AND the new c=8 centroids, then died before the list swap —
    // probes now see new geometry over old (c=4) assignments, and the
    // skew measured against the stored lists can sit below the trigger
    val all = spark.read.parquet(s"$dir/index/lists")
      .select(col("vec_id"), col("embedding"))
    val rebuilt = IvfIndex.buildCentroids(all, "vec_id", "embedding", 8)
    new java.io.File(s"$dir/index/_retrain_pending").createNewFile()
    IvfIndex.writeCentroids(spark, rebuilt, s"$dir/index")

    // the repair pass must complete the swap unconditionally
    assert(EmbedStream.retrainIvf(spark, s"$dir/index", c = 8, maxSkew = 2.5),
      "pending repair must bypass the skew/thrash gates and swap")
    assert(!new java.io.File(s"$dir/index/_retrain_pending").exists(),
      "marker must be cleared after the swap commits")

    // lists now consistent with the swapped c=8 geometry: every vector
    // present, re-assigned, exact search parity at full probe width
    val lists = spark.read.parquet(s"$dir/index/lists")
    assert(lists.count() == rows.length)
    val cents = IvfIndex.loadCentroids(spark, s"$dir/index")
    assert(cents.length == 8)
    val storedIds = lists.select(col("centroid_id")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(storedIds.subsetOf(cents.map(_._1).toSet),
      s"assignments must reference the swapped geometry: $storedIds")

    // and the repaired state is stable: next pass is a no-op again
    assert(!EmbedStream.retrainIvf(spark, s"$dir/index", c = 8, maxSkew = 2.5))
  }
}
