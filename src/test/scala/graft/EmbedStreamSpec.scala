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
}
