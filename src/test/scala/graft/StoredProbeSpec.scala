package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** The stored-assignment probe path (VERDICT r6 item 1): a corpus whose
  * seeds + (vec_id, cluster_id) assignments were persisted once is probed
  * per-batch WITHOUT any corpus-side assignment work — the same
  * [[VectorQueries.probeAssignedCorpus]] kernel the streaming loop
  * ([[graft.streaming.EmbedStream]]) runs every micro-batch.
  */
class StoredProbeSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32

  private def vec(seed: Long): Seq[Float] = {
    val rnd = new java.util.Random(seed)
    Seq.tabulate(dim)(_ => rnd.nextGaussian().toFloat)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }.toSet

  test("stored probe: report parity, and the raw corpus is never touched") {
    val dir = java.nio.file.Files.createTempDirectory("storedprobe").toString
    // corpus on disk; batch ids 100..109 duplicate corpus ids 0..9 exactly
    (0L until 60L).map(i => (i, vec(i * 31 + 7))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .write.parquet(s"$dir/corpus")
    val corpus = spark.read.parquet(s"$dir/corpus")
    val batch = (100L until 110L).map(i => (i, vec((i - 100) * 31 + 7)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .localCheckpoint() // in-memory: must survive the corpus deletion below

    val oneShot = rowsOf(
      VectorQueries.probeNewAgainstCorpus(batch, corpus, c = 8, t = 0.35))

    // one-time preparation, then DELETE the raw corpus: any code path
    // that still re-reads or re-assigns it can only fail from here on —
    // the strongest possible "no corpus-side assignment job" assertion
    VectorQueries.writeAssignedCorpus(corpus, s"$dir/store", c = 8)
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rm(java.nio.file.Paths.get(dir, "corpus"))

    val report = VectorQueries.probeStored(spark, batch, s"$dir/store", t = 0.35)
    assert(rowsOf(report) == oneShot,
      "stored-path report must equal the one-shot kernel's")

    // every duplicated arrival found its twin at cosine 1
    val dups = report.filter(col("best_cos") === 1.0)
      .select(col("vec_id"), col("best_old_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((100L until 110L).forall(i => dups.get(i).contains(i - 100)),
      s"expected each batch id i to match corpus id i-100: $dups")

    // plan: the probe joins the PERSISTED assignments — no cross join
    // (= no seed-assignment of the corpus side) appears anywhere, and the
    // only file relations are the store's
    val p = report.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"corpus-side assignment leaked into the probe plan:\n$p")
    assert(p.contains("store/assigned"),
      s"probe must read the persisted assignments:\n$p")
  }

  test("empty store dir contract: no corpus yet means everything is new") {
    val batch = (0L until 4L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val seeds = VectorQueries.seededCentroids(batch, 2)
    val (report, assigned) =
      VectorQueries.probeAssignedCorpus(batch, seeds, None, c = 2, t = 0.35)
    assert(assigned.count() == 4)
    val rows = rowsOf(report)
    assert(rows.size == 4 && rows.forall { case (_, _, n, b, c) =>
      n == 0L && b.isEmpty && c.isEmpty
    }, s"no-corpus probe must report all-new: $rows")
  }
}
