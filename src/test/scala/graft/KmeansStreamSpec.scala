package graft

import graft.streaming.KmeansStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming mini-batch k-means ([[KmeansStream]]): full driver-side
  * replication of the per-batch update (seeded init, rounded-cosine
  * assignment, exact batch sums, learning-rate drift), replay
  * idempotence under the strictly-before state read, and the fit
  * improvement the drift exists to buy.
  */
class KmeansStreamSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val C = 8

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private def nearest(x: Array[Double],
      cents: Seq[(Long, Array[Double])]): Long =
    cents.map { case (cid, cv) => (r6(cos(x, cv)), cid) }
      .minBy { case (rc, cid) => (-rc, cid) }._2

  /** Plain-Scala twin of [[KmeansStream.processBatch]] across batches. */
  private def replica(batches: Seq[Seq[(Long, Array[Float])]],
      c: Int): Seq[(Long, Array[Double], Long)] = {
    var state: Seq[(Long, Array[Double], Long)] = batches.head
      .sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(c)
      .map { case (id, v) => (id, v.map(_.toDouble), 0L) }
    batches.foreach { b =>
      val cents = state.map { case (cid, cv, _) => (cid, cv) }
      val byCluster = b.groupBy { case (_, v) => nearest(v.map(_.toDouble), cents) }
      state = state.map { case (cid, cv, v) =>
        byCluster.get(cid) match {
          case Some(members) =>
            val n = members.size.toLong
            val vNew = v + n
            val eta = n.toDouble / vNew
            val moved = Array.tabulate(cv.length) { p =>
              val sx = members.iterator.map(_._2(p).toDouble).sum
              (1.0 - eta) * cv(p) + eta * (sx / n)
            }
            (cid, moved, vNew)
          case None => (cid, cv, v)
        }
      }
    }
    state
  }

  test("mini-batch updates match the driver replica bit-for-bit; replay is a no-op") {
    val vecs = graft.queries.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      .sortBy(_._1)
    val batches = (0 until 3).map(i => vecs.filter(_._1 % 3 == i))
    val dir = java.nio.file.Files.createTempDirectory("kmstream").toString

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val q = KmeansStream.start(spark,
      input.toDF().toDF("vec_id", "embedding"), dir,
      java.nio.file.Files.createTempDirectory("kmckpt").toString, C)
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val got = KmeansStream.centroids(spark, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    val want = replica(batches, C).sortBy(_._1)
    assert(got.map(_._1).toSeq == want.map(_._1).toSeq, "centroid ids")
    assert(got.map(_._3).toSeq == want.map(_._3).toSeq, "per-centroid counts")
    got.zip(want).foreach { case ((cid, gv, _), (_, wv, _)) =>
      assert(gv.sameElements(wv), s"centroid $cid drifted from the replica")
    }
    // counts are lossless: every delivered vector fed exactly one update
    assert(got.map(_._3).sum == vecs.size.toLong)

    // state pruning keeps the newest snapshots; the live table and the
    // replay read (predecessor state) both survive it
    assert(KmeansStream.prune(spark, dir, keepLast = 2) == 1)
    assert(KmeansStream.centroids(spark, dir).count() == C)

    // redelivery of the LAST batch (at-least-once foreachBatch): the
    // strictly-before read recomputes from batch 1's state and rewrites
    // the same bytes — the live table is unchanged
    KmeansStream.processBatch(
      batches.last.toDF("vec_id", "embedding"), dir, 2L, C)
    val replayed = KmeansStream.centroids(spark, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    assert(replayed.map(_._3).toSeq == got.map(_._3).toSeq)
    replayed.zip(got).foreach { case ((cid, rv, _), (_, gv, _)) =>
      assert(rv.sameElements(gv), s"replay changed centroid $cid")
    }

    // the drift buys fit: mean best-cosine under the drifted centroids
    // is at least the seeds' (what frozen-seed maintenance would serve)
    val seeds = batches.head
      .sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(C).map { case (id, v) => (id, v.map(_.toDouble)) }
    val finalC = want.map { case (cid, cv, _) => (cid, cv) }
    def fit(cents: Seq[(Long, Array[Double])]): Double =
      vecs.iterator.map { case (_, v) =>
        val x = v.map(_.toDouble)
        cents.iterator.map { case (_, cv) => cos(x, cv) }.max
      }.sum / vecs.size
    assert(fit(finalC) >= fit(seeds) - 1e-9,
      s"drifted fit ${fit(finalC)} < seed fit ${fit(seeds)}")
  }

  test("drifted centroids power an IVF index; recall holds the family floor") {
    import graft.retrieval.IvfIndex
    val vecs = graft.queries.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      .sortBy(_._1)
    val dir = java.nio.file.Files.createTempDirectory("kmivf").toString
    (0 until 3).foreach { i =>
      KmeansStream.processBatch(
        vecs.filter(_._1 % 3 == i).toDF("vec_id", "embedding"), dir, i.toLong, C)
    }
    // the maintenance loop's output IS an IVF codebook: cast the drifted
    // double means to the index's float centroids and build/probe as usual
    val cents = KmeansStream.centroids(spark, dir).collect()
      .map(r => (r.getLong(0).toInt,
        r.getSeq[Double](1).iterator.map(_.toFloat).toArray))
    assert(cents.length == C)
    val emb = graft.queries.Tables.embeddings(spark, sfDir)
    val index = IvfIndex.assign(emb, "vec_id", "embedding", cents)
    val queries = vecs.take(10).map { case (id, v) => (id, v) }
    val got = IvfIndex.search(index, "vec_id", "embedding", queries, cents,
      nprobe = 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // brute-force truth, driver-side
    def cosF(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); nx += a(i).toDouble * a(i)
        ny += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val recalls = queries.map { case (qid, qv) =>
      val truth = vecs.filter(_._1 != qid)
        .map { case (id, v) => (cosF(qv, v), id) }
        .sortBy { case (s, id) => (-s, id) }.take(5).map(_._2).toSet
      (got.getOrElse(qid, Set.empty[Long]) & truth).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    // the vs_knn_ivf_recall family floor at a comparable scan fraction
    assert(mean >= 0.4, s"mean recall $mean under drifted centroids")
  }
}
