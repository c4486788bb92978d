package graft

import graft.queries.VectorQueries

import scala.util.Random

/** Centroid-silhouette quality report (vs_silhouette) and the IVF
  * nprobe tuning curve (vs_ivf_recall_curve): full driver-side
  * replication of the silhouette arithmetic against the engine's own
  * fitted centroids, the degenerate identical-vector guard, range/mass
  * invariants on testdata, and the curve's shape + monotonicity
  * contract. Oracle parity vs DuckDB is the driver gate.
  */
class SilhouetteSpec extends SparkSpec {

  private def r(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private def writeFixture(vecs: Seq[(Long, Array[Float])]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("silfix").toString
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("engine silhouette equals a driver replica against the fitted centroids") {
    import spark.implicits._
    val vecs = (0L until 60L).map { id =>
      val rnd = new Random(7000 + id)
      (id, Array.fill(8)(rnd.nextGaussian().toFloat))
    }
    val dir = writeFixture(vecs)
    val got = VectorQueries.qSilhouette(spark, dir, c = 5, rounds = 2).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap

    // replica: take the ENGINE's fitted centroids (bounded c-row table),
    // then redo top-2 + (rc1-rc2)/(1-rc2) + rollup in plain Scala
    val (_, seeds) = VectorQueries.kmeansFit(
      vecs.toDF("vec_id", "embedding"), c = 5, rounds = 2)
    val cents = seeds.collect()
      .map(x => (x.getLong(0), x.getSeq[Double](1).toArray))
    val sils = vecs.map { case (_, vf) =>
      val v = vf.map(_.toDouble)
      val scored = cents.map { case (cid, cv) => (r(cos(v, cv), 6), cid) }
        .sortBy { case (rc, cid) => (-rc, cid) }
      val (rc1, own) = scored(0); val rc2 = scored(1)._1
      val s = if (1.0 - rc2 <= 0) 0.0 else r((rc1 - rc2) / (1.0 - rc2), 6)
      (own, s)
    }
    val want = sils.groupBy(_._1).map { case (cid, xs) =>
      val vs = xs.map(_._2)
      cid -> (xs.size.toLong, r(vs.sum / vs.size, 4), vs.min, vs.max)
    }
    assert(got.keySet == want.keySet)
    got.foreach { case (cid, g) =>
      assert(g == want(cid), s"cluster $cid: got $g want ${want(cid)}")
    }
  }

  test("identical-vector corpus: the 1-rc2 <= 0 guard zeroes every silhouette") {
    val vecs = (0L until 12L).map(id => (id, Array(1.0f, 2.0f, 3.0f)))
    val rows = VectorQueries.qSilhouette(spark, writeFixture(vecs), c = 2, rounds = 1)
      .collect()
    assert(rows.map(_.getLong(1)).sum == 12L)
    rows.foreach { x =>
      assert(x.getDouble(2) == 0.0 && x.getDouble(3) == 0.0 && x.getDouble(4) == 0.0)
    }
  }

  test("testdata invariants: mass conservation and silhouette range") {
    val sf = "/root/testdata/sf0.001"
    val rows = VectorQueries.qSilhouette(spark, sf).collect()
    val n = graft.queries.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach { x =>
      // own cluster = argmax cosine → rc1 ≥ rc2 → s ∈ [0, 1]
      assert(x.getDouble(3) >= 0.0 && x.getDouble(4) <= 1.0)
      assert(x.getDouble(2) >= x.getDouble(3) && x.getDouble(2) <= x.getDouble(4))
    }
  }

  test("ivf recall curve: four ordered configs, supersets never lose recall") {
    val rows = VectorQueries.qIvfRecallCurve(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 6))
    rows.foreach { x =>
      assert(x.getBoolean(3), s"nprobe ${x.getInt(0)}: recall fell as the probe widened")
    }
    // the widest probe must clear its floor even on the tiny corpus
    assert(rows.last.getBoolean(2))
  }
}
