package graft

import graft.queries.VectorQueries

import scala.util.Random

/** Distributed Lloyd k-means ([[VectorQueries.kmeansAssign]]): full
  * driver-side replication on random Gaussian data (the same
  * replicate-the-kernel pattern as the incremental probe spec),
  * determinism, and corpus smoke. The replica re-implements seeded init,
  * rounded-cosine argmax assignment and rounded mean updates in plain
  * Scala with Spark's own rounding semantics, so any engine-side
  * divergence (shuffle-order float drift, tiebreak slips, dropped
  * clusters) shows up as a value mismatch here before the DuckDB gate
  * ever sees it.
  */
class KmeansSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // Spark's round(col, 6) semantics: BigDecimal HALF_UP at scale 6
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // CosineSimilarity's exact accumulation: sequential double loop,
  // sqrt(nx)*sqrt(ny) denominator
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Plain-Scala Lloyd twin of kmeansAssign. */
  private def replica(
      vecs: Seq[(Long, Array[Float])], c: Int, rounds: Int): Map[Long, (Long, Double)] = {
    val e = vecs.map { case (id, v) => (id, v.map(_.toDouble)) }
    var cents: Seq[(Long, Array[Double])] = e
      .sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(c).map { case (id, v) => (id, v) }
    def assign(cs: Seq[(Long, Array[Double])]): Map[Long, (Long, Double)] =
      e.map { case (id, v) =>
        val best = cs.map { case (cid, cv) => (r6(cos(v, cv)), cid) }
          .minBy { case (rc, cid) => (-rc, cid) }
        id -> (best._2, best._1)
      }.toMap
    for (_ <- 1 to rounds) {
      val a = assign(cents)
      cents = e.groupBy { case (id, _) => a(id)._1 }.toSeq.map { case (cid, members) =>
        val dim = members.head._2.length
        val mean = Array.tabulate(dim) { p =>
          r6(members.map(_._2(p)).sum / members.size)
        }
        (cid, mean)
      }.sortBy(_._1)
    }
    assign(cents)
  }

  test("engine k-means equals the driver replica on random Gaussian data") {
    import spark.implicits._
    val vecs = (0L until 60L).map { id =>
      val rnd = new Random(id)
      (id, Array.fill(8)(rnd.nextGaussian().toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = VectorQueries.kmeansAssign(df, c = 5, rounds = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = replica(vecs, c = 5, rounds = 3)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (cid, rc)) =>
      assert((cid, rc) == want(id), s"vec $id: got ($cid,$rc) want ${want(id)}")
    }
  }

  test("k-means is deterministic across runs and partitionings") {
    import spark.implicits._
    val vecs = (0L until 40L).map { id =>
      val rnd = new Random(1000 + id)
      (id, Array.fill(6)(rnd.nextGaussian().toFloat))
    }
    val a = VectorQueries.kmeansAssign(vecs.toDF("vec_id", "embedding"), 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = VectorQueries.kmeansAssign(
        vecs.toDF("vec_id", "embedding").repartition(7), 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("sf0.001 corpus: one row per vector, ≤ c clusters, rc in [-1,1]") {
    val rows = VectorQueries.qKmeans(spark, "/root/testdata/sf0.001").collect()
    val n = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    assert(rows.length == n)
    assert(rows.map(_.getLong(1)).distinct.length <= 8)
    rows.foreach { r =>
      val rc = r.getDouble(2)
      assert(rc >= -1.0000001 && rc <= 1.0000001)
    }
    // iterative refinement genuinely improves on the one-shot seeded
    // assignment: mean final cosine ≥ mean cosine of round-0 assignment
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) embedding")
    val seeds = VectorQueries.seededCentroids(emb, 8)
    import org.apache.spark.sql.functions._
    val r0 = VectorQueries.assignToSeeds(emb, seeds)
      .join(seeds.withColumnRenamed("cid", "cluster_id"), "cluster_id")
      .select(graft.functions.VectorFunctions.cosine(col("embedding"), col("cv")).as("c"))
      .agg(avg(col("c"))).head().getDouble(0)
    val rN = rows.map(_.getDouble(2)).sum / rows.length
    assert(rN >= r0 - 1e-9, s"final mean cosine $rN below seeded $r0")
  }
}
