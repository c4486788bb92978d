package graft

import graft.queries.VectorQueries
import graft.retrieval.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The >32-centroid bulk assignment dispatch (VERDICT r5 "do this" #1):
  * the one-decode-per-row mapPartitions kernel must be BIT-IDENTICAL to
  * the max(struct) expression path it replaces — same rounded cosine,
  * same smaller-cid tiebreak, same null semantics — and the dispatcher
  * must actually plan it past the threshold. Plus the SemDeDup
  * cluster-size cap (r5 #2): recursive re-assignment bounds the
  * in-cluster pair volume by n·maxCluster while preserving the removal
  * contract inside every final cluster.
  */
class BulkAssignSpec extends SparkSpec {

  private val dim = 24

  private def gauss(id: Long, scale: Double = 1.0): Array[Float] = {
    val rnd = new java.util.Random(id * 6364136223846793005L + 1442695040888963407L)
    Array.fill(dim)((rnd.nextGaussian() * scale).toFloat)
  }

  private def floatDf(vecs: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    vecs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  private def planOf(df: DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString

  private def rows(df: DataFrame): Seq[(Long, Long, Option[Double])] =
    df.select(col("vec_id"), col("cluster_id"), col("rc")).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)

  test("bulk kernel is bit-identical to the expression path at c=128 (float)") {
    val side = floatDf((0L until 400L).map(id => (id, gauss(id))))
    val seeds = VectorQueries.seededCentroids(side, 128).localCheckpoint()
    val expr = rows(VectorQueries.assignSeedsExpr(side, seeds))
    val bulk = rows(VectorQueries.assignSeedsBulk(side, seeds))
    assert(expr.nonEmpty && expr.size == 400)
    assert(bulk == expr, "every (cluster, rc) must match exactly")
  }

  test("bulk kernel is bit-identical on double vectors (the k-means shape)") {
    val side = floatDf((0L until 300L).map(id => (id, gauss(id))))
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) embedding")
    val seeds = VectorQueries.seededCentroids(side, 64).localCheckpoint()
    val expr = rows(VectorQueries.assignSeedsExpr(side, seeds))
    val bulk = rows(VectorQueries.assignSeedsBulk(side, seeds))
    assert(bulk == expr)
  }

  test("dispatcher plans the expression path at c≤32 and the kernel past it") {
    val side = floatDf((0L until 100L).map(id => (id, gauss(id))))
    val seeds33 = VectorQueries.seededCentroids(side, 33).localCheckpoint()
    val pBulk = planOf(VectorQueries.assignToSeedsScored(side, seeds33, 33))
    assert(pBulk.contains("MapPartitions"),
      s"33 seeds must take the one-decode kernel:\n$pBulk")
    val seeds16 = VectorQueries.seededCentroids(side, 16).localCheckpoint()
    val pExpr = planOf(VectorQueries.assignToSeedsScored(side, seeds16, 16))
    assert(!pExpr.contains("MapPartitions") && pExpr.contains("partial_max"),
      s"16 seeds must keep the map-side-combinable max(struct):\n$pExpr")
  }

  test("null semantics match the expression: zero and ragged vectors") {
    import spark.implicits._
    // id 0 = zero vector (null cosine to everything), id 1 = ragged
    // (length mismatch), rest normal; every null-handling branch of the
    // kernel must land exactly where max(struct(rc, -cid)) lands
    val special: Seq[(Long, Seq[Float])] =
      Seq((0L, Seq.fill(dim)(0.0f)), (1L, Seq.fill(dim / 2)(0.5f))) ++
        (2L until 50L).map(id => (id, gauss(id).toSeq))
    val side = special.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    // seeds drawn from the NORMAL rows only, so the zero/ragged rows are
    // strictly score-null probes (a zero seed would null every row)
    val seeds = VectorQueries.seededCentroids(
      side.filter(col("vec_id") >= 2), 40).localCheckpoint()
    val expr = rows(VectorQueries.assignSeedsExpr(side, seeds))
    val bulk = rows(VectorQueries.assignSeedsBulk(side, seeds))
    assert(bulk == expr)
    val byId = bulk.map(t => (t._1, (t._2, t._3))).toMap
    assert(byId(0L)._2.isEmpty && byId(1L)._2.isEmpty,
      "zero/ragged vectors must carry a null score")
    val minCid = seeds.agg(min(col("cid"))).head().getLong(0)
    assert(byId(0L)._1 == minCid && byId(1L)._1 == minCid,
      "all-null rows must keep the smallest cid (null struct fields sort first)")
  }

  test("roundHalfUp6 replicates Spark round(x, 6) including half-way ties") {
    import spark.implicits._
    val rnd = new java.util.Random(42)
    val xs = Seq.tabulate(20000)(_ => rnd.nextDouble() * 2 - 1) ++
      // exact 7-digit decimals ending in 5: HALF_UP and HALF_EVEN differ
      Seq.tabulate(200)(i => (i * 10 + 5).toDouble / 1e7) ++
      Seq.tabulate(200)(i => -(i * 10 + 5).toDouble / 1e7)
    val viaSpark = xs.toDF("x").select(round(col("x"), 6)).collect().map(_.getDouble(0))
    val viaKernel = xs.map(IvfIndex.roundHalfUp6)
    viaSpark.zip(viaKernel).zip(xs).foreach { case ((s, k), x) =>
      assert(s == k, s"round($x, 6): spark=$s kernel=$k")
    }
  }

  test("SemDeDup cap: a giant cluster splits until pair volume ≤ n·M") {
    // 300 vectors tightly around one direction (one giant cluster under
    // any seeding) + 100 diffuse
    val base = gauss(999L)
    val vecs = (0L until 300L).map { id =>
      val noise = gauss(10000L + id)
      (id, base.zip(noise).map { case (b, n) => b + 0.05f * n })
    } ++ (300L until 400L).map(id => (id, gauss(id)))
    val side = floatDf(vecs).localCheckpoint()
    val m = 60
    val got = VectorQueries.semDedup(side, c = 4, t = 0.995, maxCluster = m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == 400)
    val sizes = got.groupBy(_._2).map(_._2.length)
    assert(sizes.max <= m, s"largest final cluster ${sizes.max} exceeds cap $m")
    assert(sizes.map(s => s.toLong * s).sum <= 400L * m,
      "in-cluster pair volume must stay ≤ n·M")
    // the removal contract must hold INSIDE the final clusters: removed
    // iff a lower-id member of the same final cluster has rc ≥ t
    val byId = vecs.toMap
    def r6cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; nx += x * x; ny += y * y; i += 1
      }
      BigDecimal.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cluster = got.map(t => (t._1, t._2)).toMap
    got.foreach { case (id, k, removed) =>
      val want = got.exists { case (oid, ok, _) =>
        oid < id && ok == k && r6cos(byId(oid), byId(id)) >= 0.995
      }
      assert(removed == want, s"vec $id in cluster $k: removed=$removed want=$want")
    }
  }

  test("SemDeDup cap is a no-op when no cluster is oversized") {
    val vecs = (0L until 120L).map(id => (id, gauss(id)))
    val side = floatDf(vecs).localCheckpoint()
    val capped = VectorQueries.semDedup(side, c = 8, t = 0.45, maxCluster = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val flat = VectorQueries.semDedup(side, c = 8, t = 0.45,
        maxCluster = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(capped == flat, "no oversized cluster ⇒ byte-identical output")
  }

  test("an irreducible identical-vector blob terminates at the depth cap") {
    // 80 copies of one vector: every sub-seed cosine is exactly 1.0, all
    // members tie to the smallest sub-seed cid — the cluster cannot
    // split. The cap must terminate and surface the blob as one cluster
    // of mutual duplicates, which is the answer SemDeDup exists to give.
    val v = gauss(7L)
    val vecs = (0L until 80L).map(id => (id, v)) ++
      (80L until 100L).map(id => (id, gauss(id)))
    val side = floatDf(vecs).localCheckpoint()
    val got = VectorQueries.semDedup(side, c = 4, t = 0.99, maxCluster = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == 100)
    val blob = got.filter(_._1 < 80L)
    assert(blob.map(_._2).distinct.length == 1, "blob stays one cluster")
    assert(blob.count(!_._3) == 1 && !blob.minBy(_._1)._3,
      "all but the lowest-id copy must be removed")
  }
}

/** Pins the IVF family's scale rules (the sf1 gate's round-6 findings):
  * √n centroids with a floor that keeps every driver-gate SF on the
  * historical c=16 config, and probe width preserving the scanned
  * corpus FRACTION as c grows. */
class IvfScaleRuleSpec extends SparkSpec {
  import graft.queries.VectorQueries.{ivfCentroidCount, scaledNprobe}

  private def embOf(n: Int) = {
    import spark.implicits._
    (0 until n).map(_.toLong).toDF("vec_id")
  }

  test("centroid count: floor 16 at driver-gate sizes, √n beyond") {
    assert(ivfCentroidCount(embOf(200)) == 16)   // sf0.01
    assert(ivfCentroidCount(embOf(256)) == 16)   // boundary: √256 = 16
    assert(ivfCentroidCount(embOf(2000)) == 45)  // sf0.1
    assert(ivfCentroidCount(embOf(20000)) == 141) // sf1 — past the 32-centroid
    // threshold, so assignment dispatches to the bulk kernel
  }

  test("probe width preserves the scan fraction as c scales") {
    assert(scaledNprobe(6, 16) == 6)    // historical config untouched
    assert(scaledNprobe(4, 16) == 4)
    // fraction nprobe/c stays ~3/8 and ~1/4 at sf1's c=141
    assert(scaledNprobe(6, 141) == 53)
    assert(math.abs(53.0 / 141 - 6.0 / 16) < 0.01)
    assert(scaledNprobe(4, 141) == 35)
    // never narrower than the caller's floor
    assert(scaledNprobe(6, 8) == 6)
  }
}
