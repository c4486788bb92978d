package graft

import graft.operators.{Checkpoints, Compaction}
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Block-manager lifecycle fixes (ADVICE r11): localCheckpoint frames
  * are persisted RDDs with no Dataset-level release API, so iterative
  * peels and long-lived serving sessions must unpersist dead
  * generations explicitly or accumulate storage without bound. */
class CheckpointHygieneSpec extends SparkSpec {

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("Checkpoints.unpersist releases a localCheckpoint's blocks; no-op otherwise") {
    val before = persistedIds
    val df = spark.range(100).toDF("id").localCheckpoint()
    val added = persistedIds -- before
    assert(added.nonEmpty, "localCheckpoint must register a persistent RDD")
    Checkpoints.unpersist(df, blocking = true)
    assert((persistedIds -- before).isEmpty,
      "unpersist must release the checkpoint's RDD")
    // non-checkpointed plan: no-op, no throw
    Checkpoints.unpersist(spark.range(10).toDF("id"))
  }

  test("k-truss peel releases per-round checkpoints (only base + result survive)") {
    import spark.implicits._
    // the cascade fixture: a triangle strip peels over MULTIPLE rounds,
    // and cap=0 forces the over-cap branch (tEdges/adjT/radj
    // checkpoints) every round — the regression surface
    val strip = (0L until 40L).flatMap { s =>
      val n0 = s * 4
      Seq((n0, n0 + 1), (n0 + 1, n0 + 2), (n0, n0 + 2),
        (n0 + 1, n0 + 3), (n0 + 2, n0 + 3))
    }
    val clique = for (i <- 1000L to 1003L; j <- (i + 1) to 1003L) yield (i, j)
    val before = persistedIds
    val out = DedupQueries.ktrussEdges(
      (strip ++ clique).toDF("a", "b"), 4, 8, maxBroadcastAdjacency = 0L)
    val survivors = out.collect()
    assert(survivors.length == 6, "only the clique survives")
    val leaked = persistedIds -- before
    // the peel owns exactly two live checkpoints at exit: the distinct
    // base and the returned (final) edges generation — every
    // intermediate generation and every per-round temp must be gone
    assert(leaked.size <= 2,
      s"peel leaked ${leaked.size} persistent RDDs (want ≤2: base + result)")
  }

  test("winnow report: a refresh releases the previous generation's checkpoint") {
    import graft.streaming.WinnowStream
    val dir = java.nio.file.Files.createTempDirectory("wn-hyg").toString
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(60)
    WinnowStream.writeDelta(docs, s"$dir/idx", 0L)
    val before = persistedIds
    val r1 = WinnowStream.report(spark, s"$dir/idx")
    r1.count()
    val afterFirst = persistedIds -- before
    val r2 = WinnowStream.report(spark, s"$dir/idx")
    val afterSecond = persistedIds -- before
    // the second refresh must not stack on the first: the serving
    // session holds at most ONE report generation per store
    assert(afterSecond.size <= afterFirst.size,
      s"report generations accumulate: ${afterFirst.size} -> ${afterSecond.size}")
    assert(r2.count() > 0, "the live generation stays queryable")
  }

  test("retryFileGone: a circular cause chain is bounded, not a stack overflow") {
    val a = new RuntimeException("a")
    val b = new RuntimeException("b", a)
    a.initCause(b) // a -> b -> a: the ADVICE r11 cycle
    var calls = 0
    val ex = intercept[RuntimeException] {
      Compaction.retryFileGone[Int]({ calls += 1; throw b },
        attempts = 3, backoffMs = 0L)
    }
    // not file-gone anywhere on the (cyclic) chain → rethrown first try
    assert(ex eq b)
    assert(calls == 1, "a non-fileGone failure must not retry")
    // and a FileNotFound buried in a cycle still retries (and backs off)
    val fnf = new java.io.FileNotFoundException("gone")
    val c = new RuntimeException("c", fnf)
    fnf.initCause(c)
    var tries = 0
    val got = Compaction.retryFileGone[Int]({
      tries += 1
      if (tries < 3) throw c else 42
    }, attempts = 3, backoffMs = 1L)
    assert(got == 42 && tries == 3)
  }
}
