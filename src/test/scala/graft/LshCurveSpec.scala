package graft

import graft.queries.DedupQueries

/** LSH band-tuning curve (dd_lsh_tuning_curve): exact-duplicate recall
  * saturation on a crafted corpus, the nested-band superset/monotone
  * invariants, and floor headroom on testdata. Oracle parity vs DuckDB
  * is the driver gate.
  */
class LshCurveSpec extends SparkSpec {

  test("exact duplicates saturate recall at every band split") {
    import spark.implicits._
    // identical texts → identical shingle sets → identical signatures →
    // every band matches at every split; truth = the 4 J=1.0 pairs
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine"
    val docs = Seq(
      (0L, a, "en", "web", 46L), (1L, a, "en", "web", 46L),
      (2L, a, "en", "web", 46L),
      (3L, b, "en", "web", 44L), (4L, b, "en", "web", 44L),
      (5L, "lone wolf document text here", "en", "web", 28L),
      (6L, "another completely different unique body", "en", "web", 40L))
    val dir = java.nio.file.Files.createTempDirectory("lshcurve").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = DedupQueries.lshCurveMeasured(spark, dir)
    assert(m.map(_._1) == Seq(32, 16, 8, 4))
    m.foreach { case (bands, _, _, recall, rOk, sOk) =>
      assert(recall == 1.0, s"bands=$bands lost an exact-duplicate pair")
      assert(rOk && sOk)
    }
    val rows = DedupQueries.qLshTuningCurve(spark, dir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(32, 16, 8, 4))
    rows.foreach(r => assert(r.getBoolean(3) && r.getBoolean(4)))
  }

  test("testdata: supersets hold, recall never rises as bands coarsen, floors clear") {
    val m = DedupQueries.lshCurveMeasured(spark, "/root/testdata/sf0.001")
    m.foreach { case (bands, rws, floor, recall, rOk, sOk) =>
      info(f"bands=$bands%2d rows=$rws%2d floor=$floor recall=$recall%.4f")
      assert(sOk, s"bands=$bands: coarser candidates escaped the finer set")
      assert(rOk, s"bands=$bands: recall $recall under floor $floor")
    }
    // nested bands ⇒ candidate sets shrink ⇒ recall is nonincreasing
    m.map(_._4).sliding(2).foreach {
      case Seq(hi, lo) => assert(hi >= lo)
      case _ =>
    }
  }
}
