package graft

import graft.queries.VectorQueries

import scala.util.Random

/** Distributed power-iteration PCA (vs_pca_gate): direction recovery on
  * a corpus with a planted dominant component, partition-invariance of
  * the Gram partial sums, the zero-covariance guard, and gate truth on
  * testdata. Oracle parity vs DuckDB is the driver gate.
  */
class PcaPowerSpec extends SparkSpec {

  test("planted dominant direction is recovered") {
    import spark.implicits._
    // x = a·e0 + small noise, a ~ N(0, 3): the top component must align
    // with e0 and carry most of the variance
    val vecs = (0L until 200L).map { id =>
      val rnd = new Random(id)
      val a = 3.0 * rnd.nextGaussian()
      (id, Array.tabulate(8)(p =>
        (if (p == 0) a else 0.0) + 0.05 * rnd.nextGaussian()).map(_.toFloat))
    }
    val r = VectorQueries.pcaPower(vecs.toDF("vec_id", "embedding"))
    assert(math.abs(r.v(0)) > 0.99, s"top component off-axis: ${r.v.toSeq}")
    assert(r.lambda / r.trace > 0.9, "planted component should dominate the variance")
    assert(r.residual <= 0.01 * r.lambda)
    assert(r.rayleighs.sliding(2).forall {
      case Seq(a, b) => b >= a - 1e-9; case _ => true
    })
  }

  test("Gram partial sums are partitioning-insensitive to numeric noise") {
    import spark.implicits._
    val vecs = (0L until 100L).map { id =>
      val rnd = new Random(500 + id)
      (id, Array.fill(6)(rnd.nextGaussian().toFloat))
    }
    val a = VectorQueries.pcaPower(vecs.toDF("vec_id", "embedding"))
    val b = VectorQueries.pcaPower(vecs.toDF("vec_id", "embedding").repartition(13))
    assert(math.abs(a.lambda - b.lambda) < 1e-9 * math.max(1.0, a.lambda))
    // sign of v is arbitrary; compare |cos| of the two directions
    val cosv = math.abs(a.v.zip(b.v).map { case (x, y) => x * y }.sum)
    assert(cosv > 1.0 - 1e-6, s"directions diverged: |cos| = $cosv")
  }

  test("identical vectors: zero covariance passes every gate") {
    import spark.implicits._
    val vecs = (0L until 10L).map(id => (id, Array(1.0f, 2.0f, 3.0f)))
    val dir = java.nio.file.Files.createTempDirectory("pcafix").toString
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val row = VectorQueries.qPcaGate(spark, dir).collect().head
    assert(row.getInt(0) == 3)
    (3 to 6).foreach(i => assert(row.getBoolean(i), s"gate column $i failed"))
  }

  test("testdata: every gate column is true") {
    val row = VectorQueries.qPcaGate(spark, "/root/testdata/sf0.001").collect().head
    assert(row.getInt(0) == 64)
    (3 to 6).foreach(i => assert(row.getBoolean(i), s"gate column $i failed"))
  }
}
