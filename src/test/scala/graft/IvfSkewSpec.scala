package graft

import graft.queries.RagQueries
import graft.retrieval.IvfIndex
import org.apache.spark.sql.functions._

/** VERDICT r14 item 1: the adversarial-skew leg of the stored-IVF
  * serving path. The fixture puts ~49 % of rows in one TIGHT
  * (near-duplicate, eps 0.02) cluster — the shape that turns a plain
  * √n-centroid index's pruned probe scan back into a half-corpus read.
  * These tests pin (a) that the fixture really is adversarial (the
  * UNCAPPED build produces a hot list holding the hot cluster's full
  * mass), (b) that the balanced trainer restores the cap, and (c) that
  * the gate's recall floor holds over the capped index. */
class IvfSkewSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  lazy val skewed = RagQueries.skewedEmbeddings(spark, sf).cache()
  lazy val vecs = skewed.select("vec_id", "embedding")
  lazy val n = skewed.count()
  lazy val c = graft.queries.VectorQueries.ivfCentroidCount(n)

  private def maxShare(cents: Array[(Int, Array[Float])]): Double = {
    val counts = IvfIndex.assign(vecs, "vec_id", "embedding", cents)
      .groupBy(col("centroid_id")).count().collect().map(_.getLong(1))
    counts.max.toDouble / n
  }

  test("fixture: power-law mass, unit vectors, no null elements") {
    // a dim mismatch between SkewGeom centers and the embeddings table
    // would null-pad zip_with silently — pin against it
    val bad = skewed.filter(
      exists(col("embedding"), _.isNull) || col("embedding").isNull).count()
    assert(bad == 0, s"$bad rows with null embedding elements")
    val norms = skewed.select(
      sqrt(aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))).as("nrm"))
      .agg(min(col("nrm")), max(col("nrm"))).head()
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5 &&
      math.abs(norms.getDouble(1) - 1.0) < 1e-5,
      s"fixture vectors must be unit-norm: $norms")
    // hot cluster holds 30-50 % of rows (the adversarial band)
    val byCid = skewed.groupBy(col("cid")).count()
      .orderBy(col("count").desc).collect()
    val hotShare = byCid.head.getLong(1).toDouble / n
    assert(hotShare >= 0.3 && hotShare <= 0.55, s"hot share $hotShare")
    assert(byCid.head.getInt(0) == RagQueries.SkewGeom.hotCid(n),
      "driver-side hotCid must match the data's argmax cluster")
  }

  test("fixture: Spark-side cid expression matches the local cidOf twin") {
    val mismatches = skewed
      .select(col("vec_id"), col("cid")).collect()
      .count(r => r.getInt(1) != RagQueries.SkewGeom.cidOf(r.getLong(0)))
    assert(mismatches == 0)
  }

  test("uncapped build degrades: one list holds the hot cluster's mass") {
    val share = maxShare(IvfIndex.buildCentroids(vecs, "vec_id", "embedding", c))
    // farthest-first seeding puts at most one seed inside the tight
    // near-duplicate blob, so its whole mass lands in one list — the
    // scan-degradation this fixture exists to exhibit
    assert(share >= 0.3,
      f"expected an adversarial hot list (>=0.3), got $share%.3f — fixture no longer adversarial")
  }

  test("balanced build restores the cap; bounded centroid growth; deterministic") {
    val capFrac = 4.0 / c
    val cents = IvfIndex.buildCentroidsBalanced(
      vecs, "vec_id", "embedding", c, capFrac)
    val share = maxShare(cents)
    // the cap is enforced on the build sample; corpus shares track it to
    // sampling error — 1.25x slack absorbs that without hiding a miss
    assert(share <= capFrac * 1.25,
      f"balanced max list share $share%.3f exceeds cap $capFrac%.3f")
    assert(cents.length <= 4 * c, s"centroid growth unbounded: ${cents.length}")
    assert(cents.length >= c, "splits may only grow the centroid set")
    val again = IvfIndex.buildCentroidsBalanced(
      vecs, "vec_id", "embedding", c, capFrac)
    assert(cents.length == again.length && cents.zip(again).forall {
      case ((i1, v1), (i2, v2)) =>
        i1 == i2 && java.util.Arrays.equals(v1, v2)
    }, "balanced build must be deterministic")
  }

  test("balanced build is a no-op when no list exceeds the cap") {
    // cold clusters only (drop the near-duplicate blob): plain training
    // balances them fine, so the balanced trainer must not split
    val hot = RagQueries.SkewGeom.hotCid(n)
    val cold = skewed.filter(col("cid") =!= lit(hot))
      .select("vec_id", "embedding")
    val cc = graft.queries.VectorQueries.ivfCentroidCount(cold.count())
    val plain = IvfIndex.buildCentroids(cold, "vec_id", "embedding", cc)
    val capFrac = math.max(4.0 / cc, maxShareOf(cold, plain) + 0.01)
    val balanced = IvfIndex.buildCentroidsBalanced(
      cold, "vec_id", "embedding", cc, capFrac)
    assert(balanced.length == plain.length &&
      balanced.zip(plain).forall { case ((i1, v1), (i2, v2)) =>
        i1 == i2 && java.util.Arrays.equals(v1, v2) },
      "balanced build must equal the plain build when the cap already holds")
  }

  private def maxShareOf(df: org.apache.spark.sql.DataFrame,
      cents: Array[(Int, Array[Float])]): Double = {
    val counts = IvfIndex.assign(df, "vec_id", "embedding", cents)
      .groupBy(col("centroid_id")).count().collect().map(_.getLong(1))
    counts.max.toDouble / counts.sum
  }

  test("skew gate: recall floor holds for hot and cold probes") {
    val rows = RagQueries
      .queries("rag_retrieve_topk_ivf_skew_gate")(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getBoolean(2)),
      s"recall floor violated: ${rows.mkString(", ")}")
    // measured at sf0.001/sf0.01 (ProfileRagIvf): per-query recall@10
    // 0.60-1.00, mean 0.90 — the 0.4 floor keeps >=1.5x headroom
  }

  test("q8 two-phase search stays exact inside a near-duplicate blob") {
    // The r15 sf1 regression this pins: inside a blob of near-identical
    // vectors the true separations (~1e-4) sit far below q8 cosine
    // noise (~3e-3), so q8 ranks are noise and a FIXED overfetch window
    // drops the true top-k once the blob outgrows it — recall collapsed
    // at 20k rows under a 50 % duplicated cluster. The error-aware
    // margin (keep candidates within q8Margin of the k-th q8 score)
    // must make the two-phase result equal the exact float search over
    // the same probed lists, blob or no blob.
    import graft.retrieval.IvfIndex
    // sf0.01 here: the sf0.001 blob (~10 rows) fits inside the fixed
    // overfetch window and would never exercise the margin path
    val sk01 = RagQueries.skewedEmbeddings(spark, "/root/testdata/sf0.01")
    val n01 = sk01.count()
    val blob = sk01.filter(col("cid") === lit(RagQueries.SkewGeom.hotCid(n01)))
      .select(col("vec_id"), col("embedding"))
    val nb = blob.count()
    assert(nb > 60, s"hot blob too small to exercise the window: $nb")
    val cents = IvfIndex.buildCentroidsBalanced(
      blob, "vec_id", "embedding", c, capFrac = 4.0 / c)
    val index = IvfIndex.assign(blob, "vec_id", "embedding", cents)
    val queries = blob.orderBy(col("vec_id")).limit(3)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val exact = IvfIndex.search(index, "vec_id", "embedding", queries,
      cents, nprobe = cents.length, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val q8 = IvfIndex.searchQ8(index, "vec_id", "embedding", queries,
      cents, nprobe = cents.length, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(q8 == exact,
      s"q8 two-phase diverged from exact inside the blob:\n$q8\nvs\n$exact")
  }
}
