package graft

import graft.queries.SearchQueries
import org.apache.spark.sql.functions._

/** Boolean retrieval (ks_boolean): naive driver-side recomputation of
  * the full Lucene clause semantics + BM25 ranking over sf0.001 — set
  * logic evaluated per document with no pruning or relational tricks —
  * must equal the engine's one-aggregation clause plan exactly.
  */
class BooleanSearchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val (k1, b) = (1.2, 0.75)

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ks_boolean equals a naive driver-side evaluation on sf0.001") {
    val toks = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    val nDocs = toks.size
    val avgdl = toks.values.map(_.length.toDouble).sum / nDocs
    val df = scala.collection.mutable.HashMap.empty[String, Int]
    toks.values.foreach(_.distinct.foreach(t => df(t) = df.getOrElse(t, 0) + 1))

    def bm25(term: String, tf: Int, dl: Int): Double = {
      val d = df(term).toDouble
      val idf = math.log(1.0 + (nDocs - d + 0.5) / (d + 0.5))
      idf * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl / avgdl))
    }

    val want = SearchQueries.BoolQueries.flatMap { case (qid, must, should, not) =>
      val matches = toks.toSeq.flatMap { case (id, w) =>
        val tf = w.groupBy(identity).view.mapValues(_.size).toMap
        val mustOk = must.forall(tf.contains)
        val notOk = !not.exists(tf.contains)
        val shouldHits = should.count(tf.contains)
        val orOk = must.nonEmpty || shouldHits >= 1
        if (mustOk && notOk && orOk) {
          val score = r4((must ++ should).filter(tf.contains)
            .map(t => bm25(t, tf(t), w.length)).sum)
          Some((id, score, must.count(tf.contains).toLong, shouldHits.toLong))
        } else None
      }
      matches.sortBy { case (id, s, _, _) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, s, nm, ns), i) => (qid, i + 1, id, s, nm, ns) }
    }.toSet

    val got = SearchQueries.qBoolean(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want, s"engine vs naive:\n  only engine: ${got -- want}\n  only naive: ${want -- got}")

    // the clause semantics must each have bite on this corpus:
    // a must_not term excludes at least one otherwise-matching doc
    val q0 = SearchQueries.BoolQueries.head
    val excluded = toks.exists { case (_, w) =>
      val set = w.toSet
      q0._2.forall(set) && q0._4.exists(set)
    }
    assert(excluded, "some doc is excluded by must_not for query 0")
    assert(want.exists(_._1 == 3L), "the no-must OR query matches docs")
  }
}
