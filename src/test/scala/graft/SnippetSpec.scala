package graft

import graft.queries.SearchQueries
import org.apache.spark.sql.functions._

/** KWIC snippet extraction (ks_snippets): hand-traced fixture winner,
  * coverage/anchoring invariants on testdata, and the one-row-per-top-hit
  * contract. Oracle parity vs DuckDB is the driver gate.
  */
class SnippetSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("fixture: the window covering both query terms beats the earlier single-term one") {
    import spark.implicits._
    // query 0 = "hash join". Doc 0: an early lone 'hash', then far away
    // 'hash join' adjacent — the 2-term window must win despite starting
    // later. Filler is unique junk so no accidental matches.
    val text0 = "hash f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 hash join f12"
    val corpus = Seq(0L -> text0, 1L -> "g1 g2 g3 g4 g5")
    val dir = java.nio.file.Files.createTempDirectory("snipfix").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = SearchQueries.qSnippets(spark, dir)
      .filter(col("query_id") === 0 && col("doc_id") === 0)
      .head()
    // 'hash join' sits at 1-based positions 13,14 → best start = 13
    assert(row.getAs[Long]("snip_start") == 13L, s"got $row")
    assert(row.getAs[Long]("n_cover") == 2L)
    assert(row.getAs[String]("snippet").startsWith("hash join"))
  }

  test("testdata: one snippet per stored-BM25 top hit, anchored on a match") {
    val top = SearchQueries.qBm25Stored(spark, sf)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val snips = SearchQueries.qSnippets(spark, sf).collect()
    assert(snips.map(r => (r.getLong(0), r.getLong(2))).toSet == top,
      "exactly the top-k (query, doc) pairs get a snippet")
    snips.foreach { r =>
      val qid = r.getLong(0)
      val qterms = SearchQueries.Bm25Queries.toMap.apply(qid).split(" ").toSet
      val toks = r.getAs[String]("snippet").split(" ")
      assert(toks.length <= 8)
      assert(qterms.contains(toks.head),
        s"snippet must start at a query-term occurrence: $r")
      assert(r.getAs[Long]("n_cover") >= 1 &&
        r.getAs[Long]("n_cover") <= qterms.size)
    }
  }

  test("determinism: identical across evaluations") {
    val a = SearchQueries.qSnippets(spark, sf).collect().toSeq
    val b = SearchQueries.qSnippets(spark, sf).collect().toSeq
    assert(a == b)
  }
}
