package graft

import graft.queries.SearchQueries
import org.apache.spark.sql.functions._

/** MaxScore dynamic pruning (ks_maxscore): lossless-parity vs exact
  * scoring, pruning actually engaging, and the graceful degrade when the
  * seed term matches too few docs for a trusted threshold. The driver's
  * DuckDB hash gate re-proves parity at sf0.01/sf1; these specs pin the
  * mechanism.
  */
class MaxscoreSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("pruned top-k is identical to exact scoring (testdata)") {
    val exact = SearchQueries.qBm25(spark, sf).collect().toSeq
    val pruned = SearchQueries.qMaxscore(spark, sf).collect().toSeq
    assert(pruned == exact,
      s"MaxScore must be lossless: ${pruned.diff(exact)} vs ${exact.diff(pruned)}")
  }

  test("pruning engages: candidate set smaller than the full match set") {
    val (cand, _) = SearchQueries.maxscorePruned(spark, sf)
    val nCand = cand.distinct().count()
    // full match set = every (query, doc) pair sharing >= 1 term —
    // what exact scoring aggregates over
    val full = SearchQueries.qBm25(spark, sf) // warms nothing; recompute matches
    val nFull = {
      import spark.implicits._
      val qterms = SearchQueries.Bm25Queries.toDF("query_id", "qtext")
        .select(col("query_id"),
          explode(split(col("qtext"), " ")).as("term")).distinct()
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        .join(qterms, "term")
        .select(col("query_id"), col("doc_id")).distinct().count()
    }
    assert(nCand < nFull,
      s"expected pruning on the testdata corpus: $nCand candidates vs $nFull matches")
    assert(full.count() > 0)
  }

  test("adversarial fixture: near-threshold scores survive the margin") {
    import spark.implicits._
    // A corpus engineered around query 0 ("hash join") so several docs
    // land within a hair of the rank-k boundary: 'hash' is rare (exactly
    // k=5 postings, so theta is trusted and comes from hash-matching
    // docs), 'join' is everywhere — the join-only docs are the ones a
    // sloppy bound would drop at the non-essential cutoff.
    val corpus: Seq[(Long, String)] =
      (0L to 4L).map(i => i -> ("hash join " + Seq.fill(i.toInt)("pad").mkString(" "))) ++
        (5L to 30L).map(i => i -> ("join " + Seq.fill((i % 7).toInt)("x").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("msfix").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = SearchQueries.qBm25(spark, dir).collect().toSeq
    val pruned = SearchQueries.qMaxscore(spark, dir).collect().toSeq
    assert(pruned == exact, "near-boundary docs must not be pruned")
  }

  test("degrade path: seed matching < k docs disables pruning, stays correct") {
    import spark.implicits._
    // every query term is rare (< 5 postings): no trusted theta anywhere,
    // essential = all terms, result must still equal exact scoring
    val corpus: Seq[(Long, String)] = Seq(
      0L -> "hash join",
      1L -> "window merge",
      2L -> "stream batch",
      3L -> "filter scan",
      4L -> "vector query")
    val dir = java.nio.file.Files.createTempDirectory("msdeg").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = SearchQueries.qBm25(spark, dir).collect().toSeq
    val pruned = SearchQueries.qMaxscore(spark, dir).collect().toSeq
    assert(pruned == exact)
  }

  test("stored upper bound dominates every per-doc contribution") {
    // UB(t) = idf(t) * max_sat(t) must bound the exact contribution of
    // every posting — recompute contributions from the stored index and
    // compare against the stored metadata, term by term
    val idx = SearchQueries.bm25Index(spark, sf)
    val stats = spark.read.parquet(idx.statsPath).head
    val avgdl = stats.getDouble(1)
    val sat = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))
    val viol = spark.table(idx.postingsTable)
      .join(spark.table(idx.dfreqTable), "term")
      .filter(sat > col("max_sat"))
      .count()
    assert(viol == 0L, s"$viol postings exceed their term's stored max impact")
  }
}
