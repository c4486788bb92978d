package graft

import graft.queries.SearchQueries
import org.apache.spark.sql.functions._

/** BM25F (ks_bm25f): naive driver-side recomputation of the pseudo-field
  * split, per-field length normalization, pre-saturation field-weighted
  * pseudo-frequency, and ranking over sf0.001 — plus proof the title
  * boost has bite (some query ranks differently than plain BM25).
  */
class Bm25FSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val (k1, b, titleW, boost) = (1.2, 0.75, 8, 2.0)

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ks_bm25f equals a naive driver-side evaluation on sf0.001") {
    val toks = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    val nDocs = toks.size
    // per-field token arrays and average field lengths
    val fields = toks.view.mapValues(w => Map(
      "title" -> w.take(titleW), "body" -> w.drop(titleW))).toMap
    val avgF = Seq("title", "body").map { f =>
      f -> fields.values.map(_(f).length.toDouble).sum / nDocs
    }.toMap
    val df = scala.collection.mutable.HashMap.empty[String, Int]
    toks.values.foreach(_.distinct.foreach(t => df(t) = df.getOrElse(t, 0) + 1))

    val want = SearchQueries.Bm25Queries.flatMap { case (qid, qtext) =>
      val terms = qtext.split(" ").distinct
      val scored = toks.keys.toSeq.flatMap { id =>
        val hit = terms.filter(t => toks(id).contains(t))
        if (hit.isEmpty) None
        else {
          val score = r4(hit.map { t =>
            val tft = Seq("title" -> boost, "body" -> 1.0).map { case (f, wf) =>
              val tf = fields(id)(f).count(_ == t)
              if (tf == 0) 0.0
              else wf * tf / (1.0 + b * (fields(id)(f).length / avgF(f) - 1.0))
            }.sum
            val d = df(t).toDouble
            math.log(1.0 + (nDocs - d + 0.5) / (d + 0.5)) * tft / (k1 + tft)
          }.sum)
          Some((id, score, hit.length.toLong))
        }
      }
      scored.sortBy { case (id, s, _) => (-s, id) }.take(5).zipWithIndex
        .map { case ((id, s, nh), i) => (qid, i + 1, id, s, nh) }
    }.toSet

    val got = SearchQueries.qBm25F(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSet
    assert(got == want,
      s"engine vs naive:\n  only engine: ${got -- want}\n  only naive: ${want -- got}")

    // the field boost must actually reorder something vs plain BM25
    val plain = SearchQueries.qBm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val fTop = got.toSeq.map(t => (t._1, t._2) -> t._3).toMap
    assert(fTop != plain.view.filterKeys(k => fTop.contains(k)).toMap,
      "title boost changes at least one top-5 slot vs plain BM25")
  }
}
