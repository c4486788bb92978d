package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Stupid Backoff LM scoring (td_backoff_lm): a crafted fixture proving
  * each scoring path in isolation (seen bigram, backoff to seen unigram,
  * OOV floor, sub-2-token null row), plus a full driver-side
  * recomputation over the real sf0.001 corpus — the independent third
  * implementation next to the DuckDB oracle.
  */
class BackoffLmSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  /** The engine's split bucket: first 16 bits of md5(doc_id) mod 100. */
  private def bucket(id: Long): Int =
    Integer.parseInt(md5hex(id.toString).substring(0, 4), 16) % 100

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Plain-Scala Stupid Backoff over a (doc_id, text) corpus: returns
    * doc_id -> (n_bigrams, lp, backoff_frac) with null lp/frac as None. */
  private def ref(docs: Seq[(Long, String)])
      : Map[Long, (Long, Option[Double], Option[Double])] = {
    def words(t: String): Array[String] =
      t.trim.toLowerCase.split("\\s+", -1)
    val train = docs.filter(d => bucket(d._1) < 90)
    val uni = train.flatMap(d => words(d._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum.toDouble
    val big = train.flatMap(d => words(d._2).sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1)))).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    docs.map { case (id, t) =>
      val w = words(t)
      if (w.length < 2) id -> ((0L, None, None))
      else {
        val scores = w.sliding(2).map { p =>
          big.get((p(0), p(1))) match {
            case Some(c12) => (c12.toDouble / uni(p(0)), 0)
            case None => (0.4 * uni.getOrElse(p(1), 1L) / n, 1)
          }
        }.toSeq
        val lp = round4(scores.map(s => math.log10(s._1)).sum / scores.size)
        val bf = round4(scores.map(_._2).sum.toDouble / scores.size)
        id -> ((scores.size.toLong, Some(lp), Some(bf)))
      }
    }.toMap
  }

  test("each scoring path, on a fixture with controlled split membership") {
    import spark.implicits._
    // ids are CHOSEN BY BUCKET so split membership is explicit: three
    // train docs fix the model, one held-out doc walks every path
    val trainIds = (1L to 200L).filter(bucket(_) < 90).take(3)
    val heldId = (1L to 200L).find(bucket(_) >= 90).get
    // model: uni a:3 b:2 c:1 (N=6); bigrams (a,b):2 (a,c):1
    val docs = Seq(
      (trainIds(0), "a b"), (trainIds(1), "a b"), (trainIds(2), "a c"),
      (heldId, "a b a d x"))
    val dir = java.nio.file.Files.createTempDirectory("backoff").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.qBackoffLm(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_ => r.getDouble(2)),
          Option(r.get(3)).map(_ => r.getDouble(3))))).toMap
    // held-out bigrams: (a,b) seen → 2/3; (b,a) backoff → 0.4·3/6;
    // (a,d) OOV floor → 0.4·1/6; (d,x) OOV floor → 0.4·1/6
    val want = round4(
      (math.log10(2.0 / 3) + math.log10(0.2) + 2 * math.log10(0.4 / 6)) / 4)
    assert(got(heldId) == ((4L, Some(want), Some(0.75))),
      s"held-out doc walks seen/backoff/OOV: ${got(heldId)}")
    // a train doc never backs off against its own model
    assert(got(trainIds(0)) == ((1L, Some(round4(math.log10(2.0 / 3))),
      Some(0.0))))
  }

  test("a sub-2-token doc yields n_bigrams = 0 and null scores") {
    import spark.implicits._
    val trainId = (1L to 200L).filter(bucket(_) < 90).head
    val dir = java.nio.file.Files.createTempDirectory("backoff1").toString
    Seq((trainId, "solo"), (trainId + 1000, "a b"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextQueries.qBackoffLm(spark, dir).collect()
      .find(_.getLong(0) == trainId).get
    assert(r.getLong(1) == 0L && r.isNullAt(2) && r.isNullAt(3))
  }

  test("td_backoff_lm equals a driver-side recomputation on every sf0.001 doc") {
    val texts = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val want = ref(texts)
    val rows = TextQueries.qBackoffLm(spark, sf).collect()
    assert(rows.length == texts.size, "one row per document")
    rows.foreach { r =>
      val id = r.getLong(0)
      val (wn, wlp, wbf) = want(id)
      assert(r.getLong(1) == wn, s"doc $id n_bigrams")
      (Option(r.get(2)).map(_ => r.getDouble(2)), wlp) match {
        case (Some(g), Some(w)) =>
          // engine sums partials in partition order; both sides round to
          // 4 dp, so they can differ by at most one final-digit step
          assert(math.abs(g - w) <= 1.0001e-4, s"doc $id lp: $g vs $w")
        case (g, w) => assert(g == w, s"doc $id lp nullity")
      }
      assert(Option(r.get(3)).map(_ => r.getDouble(3)) == wbf, s"doc $id bf")
    }
    // the model-miss path must actually fire on the held-out split
    assert(rows.exists(r => !r.isNullAt(3) && r.getDouble(3) > 0),
      "some held-out doc backs off")
  }
}
