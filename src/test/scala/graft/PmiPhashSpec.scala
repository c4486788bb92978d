package graft

import graft.multimodal.Media
import graft.queries.{MultimodalQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Driver-side third implementations for td_pmi (windowed co-occurrence
  * PMI) and mm_phash / mm_phash_neardup (perceptual dHash + re-encode
  * detection) over sf0.001 — the same independent-recomputation pattern
  * as [[RfmNgramsSpec]]: a from-scratch Scala reimplementation, never a
  * re-run of the engine's own plan, checked row-exact.
  */
class PmiPhashSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("td_pmi equals a driver-side windowed PMI on sf0.001") {
    val texts = graft.queries.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0).trim.split("\\s+"))
    val uni = scala.collection.mutable.HashMap.empty[String, Long]
    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    var tTot = 0L
    var pTot = 0L
    texts.foreach { w =>
      w.foreach { x => uni(x) = uni.getOrElse(x, 0L) + 1; tTot += 1 }
      for (i <- w.indices; d <- 1 to 3 if i + d < w.length if w(i) != w(i + d)) {
        val key = if (w(i) < w(i + d)) (w(i), w(i + d)) else (w(i + d), w(i))
        pc(key) = pc.getOrElse(key, 0L) + 1
        pTot += 1
      }
    }
    val want = pc.toSeq.collect { case ((a, b), c) if c >= 5 =>
      val pmi = math.log((c.toDouble / pTot) /
        ((uni(a).toDouble / tTot) * (uni(b).toDouble / tTot)))
      (a, b, c, r4(pmi))
    }.sortBy { case (a, b, _, pmi) => (-pmi, a, b) }.take(30)
    val got = TextQueries.qPmi(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == want, s"engine: ${got.take(5)}…\nnaive: ${want.take(5)}…")
    assert(want.nonEmpty && want.head._4 > 0, "top pair is a real association")
  }

  /** The dHash recipe, recomputed from first principles on a byte array. */
  private def naiveDhash(blob: Array[Byte]): Long = {
    if (blob.isEmpty) return 0L
    val cell = Array.tabulate(70)(k => blob((k.toLong * blob.length / 70).toInt) & 0xff)
    var h = 0L
    for (r <- 0 until 10; c <- 0 until 6)
      if (cell(r * 7 + c) < cell(r * 7 + c + 1)) h |= 1L << (r * 6 + c)
    h
  }

  test("mm_phash equals a driver-side dHash on sf0.001") {
    val want = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val id = r.getLong(0)
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        (id, kind, naiveDhash(r.getString(1).getBytes("UTF-8")))
      }.sortBy(_._1).toSeq
    val got = MultimodalQueries.qPhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("dhash is invariant under strictly monotone brightness maps") {
    val blob = "the quick brown fox jumps over the lazy dog repeatedly and often"
      .getBytes("UTF-8")
    val brighter = blob.map(b => ((b & 0xff) + 50).toByte)  // strictly monotone
    assert(naiveDhash(blob) == naiveDhash(brighter))
  }

  test("mm_phash_neardup recovers every close re-encode pair, none spurious") {
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8"))
    val hashes = docs.map { case (id, blob) => id -> naiveDhash(blob) } ++
      docs.map { case (id, blob) =>
        val out = blob.zipWithIndex.map { case (b, j) =>
          ((b & 0xff) + 32 + (((id * 31 + j.toLong * 7) % 3).toInt - 1)).toByte
        }
        (id + 1000000L) -> naiveDhash(out)
      }
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).sortBy(p => (p._1, p._2)).toSeq
    val got = MultimodalQueries.qPhashNeardup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "some re-encodes land within the threshold")
    assert(got.forall { case (a, b, _) => b - a == 1000000L },
      "every pair is an original matched to its own re-encode")
  }
}
