package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffle (td_epoch_shuffle): the two-level rank is
  * a true permutation, epochs genuinely differ, and reruns are
  * bit-identical. Oracle parity (including the full-order checksum) is
  * the driver gate.
  */
class EpochShuffleSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("per-epoch positions are a contiguous permutation head") {
    val rows = PipelineQueries.qEpochShuffle(spark, sf).collect()
    val byEpoch = rows.groupBy(_.getInt(0))
    assert(byEpoch.keySet == Set(0, 1))
    byEpoch.foreach { case (e, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 10L),
        s"epoch $e positions not 1..10")
      assert(rs.map(_.getLong(2)).distinct.length == 10,
        s"epoch $e repeats a doc")
    }
  }

  test("epochs produce different orders; reruns are identical") {
    val rows = PipelineQueries.qEpochShuffle(spark, sf).collect()
    val e0 = rows.filter(_.getInt(0) == 0).sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    val e1 = rows.filter(_.getInt(0) == 1).sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    assert(e0 != e1, "epoch reshuffle must change the order")
    assert(PipelineQueries.qEpochShuffle(spark, sf).collect().toSeq == rows.toSeq)
  }

  test("checksum covers the full permutation (matches a driver-side rank)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = (0 to 1).map { e =>
      val order = docs.map(d => (md5hex(s"$d:$e"), d)).sortBy(identity)
      e -> order.zipWithIndex
        .map { case ((_, d), i) => ((i + 1L) % 100003L) * (d % 1009L) % 100003L }.sum
    }.toMap
    val got = PipelineQueries.qEpochShuffle(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(got == want, s"$got vs $want")
  }
}
