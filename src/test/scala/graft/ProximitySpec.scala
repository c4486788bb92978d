package graft

import graft.queries.SearchQueries
import org.apache.spark.sql.functions._

/** Proximity rerank (ks_proximity): hand-traced min-span cover, the
  * adjacency boost flipping a ranking, and the no-bonus single-term
  * case. Oracle parity vs DuckDB is the driver gate.
  */
class ProximitySpec extends SparkSpec {

  test("adjacent terms outrank scattered terms of equal BM25 weight") {
    import spark.implicits._
    // query 0 = "hash join". Docs 0 and 1 have IDENTICAL term stats
    // (one 'hash', one 'join', dl 8) so base BM25 ties — doc 1's
    // adjacency (minspan 2) must beat doc 0's spread (minspan 8).
    val corpus = Seq(
      0L -> "hash a b c d e f join",
      1L -> "hash join a b c d e f",
      2L -> "x y z w q r s t")
    val dir = java.nio.file.Files.createTempDirectory("proxfix").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SearchQueries.qProximity(spark, dir)
      .filter(col("query_id") === 0).collect()
    val byDoc = rows.map(r => r.getLong(2) -> (r.getInt(1), r.getLong(4))).toMap
    assert(byDoc(1L)._1 < byDoc(0L)._1, s"adjacency must win: $byDoc")
    assert(byDoc(1L)._2 == 2L && byDoc(0L)._2 == 8L, s"spans: $byDoc")
  }

  test("single-matched-term docs get no bonus; boosted never below base") {
    val sf = "/root/testdata/sf0.001"
    val base = SearchQueries.qBm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    SearchQueries.qProximity(spark, sf).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val (score, span) = (r.getDouble(3), r.getLong(4))
      base.get(key).foreach { b =>
        assert(score >= b - 1e-9, s"boost must not lower a score: $r vs $b")
        assert(score <= b + 0.5 + 1e-9, "bonus is bounded by 1/(1+minspan) <= 1/3 for spans >= 2")
      }
      if (span > 0) assert(span >= 2, s"a multi-term cover spans >= 2: $r")
    }
  }
}
