package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** Greedy k-center (vs_kcenter): a full driver-side re-derivation of the
  * Gonzalez traversal on the real sf0.001 embeddings (the independent
  * third implementation next to the DuckDB oracle), plus the structural
  * invariants that make the greedy a 2-approximation.
  */
class KcenterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The engine kernel's arithmetic: in-order double accumulation,
    * dot / (sqrt(nx)·sqrt(ny)), then the 6dp round. */
  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
    }
    1.0 - round6(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  /** Plain-Scala Gonzalez: (id -> vec) corpus, k rounds; returns
    * (rank, center id, radius) with the engine's tiebreaks. */
  private def ref(vecs: Seq[(Long, Array[Double])], k: Int)
      : Seq[(Int, Long, Double)] = {
    val seedId = vecs.map(v => (md5hex(v._1.toString), v._1))
      .sortBy(identity).head._2
    var centers = Vector(vecs.find(_._1 == seedId).get)
    (1 to k).map { r =>
      val far = vecs.map { case (id, v) =>
        (centers.map(c => dist(v, c._2)).min, id)
      }.minBy { case (m, id) => (-m, id) }
      val row = (r, centers(r - 1)._1, round6(far._1))
      if (r < k) centers = centers :+ vecs.find(_._1 == far._2).get
      row
    }
  }

  test("vs_kcenter equals a driver-side Gonzalez re-derivation on sf0.001") {
    val vecs = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toSeq
    val want = ref(vecs, 8)
    val got = VectorQueries.qKcenter(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, s"got $got\nwant $want")
  }

  test("the Gonzalez invariants hold: distinct centers, non-increasing radii") {
    val rows = VectorQueries.qKcenter(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.map(_._1) == (1 to 8), "one row per rank")
    assert(rows.map(_._2).distinct.size == 8, "centers never repeat")
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3, s"radius must not grow: $a -> $b")
    }
    assert(rows.last._3 < rows.head._3,
      "adding centers actually shrinks coverage radius on this corpus")
  }
}
