package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** Adaptive exact near-dup: the dispatch between the cluster-pruned join
  * (clustered data — pruning wins) and the blocked all-pairs sweep
  * (diffuse data — pruning provably admits everything), with both paths
  * checked against a driver-side brute force that replicates the
  * CosineSimilarity arithmetic op-for-op.
  */
class VectorNearDupSpec extends SparkSpec {

  private val dim = 32

  /** Same accumulation order + denominator as CosineSimilarity. */
  private def cosRef(a: Array[Float], b: Array[Float]): Option[Double] = {
    if (a.length == 0 || a.length != b.length) return None
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; nx += x * x; ny += y * y; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) None else Some(dot / denom)
  }

  /** Spark round(col, 6) semantics. */
  private def r6(d: Double): Double =
    BigDecimal.valueOf(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def bruteForce(vecs: Seq[(Long, Array[Float])], t: Double): Set[(Long, Long, Double)] =
    (for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      c <- cosRef(va, vb) if c >= t
    } yield (ia, ib, r6(c))).toSet

  private def writeFixture(vecs: Seq[(Long, Array[Float])]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neardup").toString
    vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString

  test("clustered data takes the pruned cluster join and matches brute force") {
    // 3 tight families, 20 vectors each: base direction + small
    // deterministic wobble — within-family cosine ≈ 1, across ≈ 0
    val vecs = for {
      fam <- 0 until 3; k <- 0 until 20
    } yield {
      val id = (fam * 20 + k).toLong
      val v = new Array[Float](dim)
      v(fam) = 1.0f
      v(3 + (k % (dim - 3))) = 0.05f + 0.001f * k
      (id, v)
    }
    val d = writeFixture(vecs)
    val df = VectorQueries.qEmbNearDup(spark, d)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == bruteForce(vecs, 0.45), "exact pair set on clustered data")
    // pruning engaged: the exact verify runs as the codegen expression
    // inside the candidate join, not the blocked object sweep
    val p = planOf(df)
    assert(p.contains("cosine_sim"), s"expected cluster-join path:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("top-k report equals the full pair report cut per vector, ≤3 rows each") {
    // one 10-member tight family: 45 pairs, so the per-vector top-3 cut
    // genuinely drops partners; plus an isolated vector with none
    val vecs = (0 until 10).map { k =>
      val v = new Array[Float](dim)
      v(0) = 1.0f
      v(3 + k) = 0.02f + 0.001f * k
      (k.toLong, v)
    } :+ { val v = new Array[Float](dim); v(1) = 1.0f; (99L, v) }
    val d = writeFixture(vecs)
    val full = VectorQueries.qEmbNearDup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = VectorQueries.qEmbNearDupTopk(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val want = full.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .groupBy(_._1).toSeq.flatMap { case (v, ps) =>
        ps.sortBy(p => (-p._3, p._2)).take(3).zipWithIndex
          .map { case ((_, p, c), i) => (v, p, c, i + 1) }
      }.sortBy(t => (t._1, t._4))
    assert(got.toSeq == want.toSeq, s"got ${got.toSeq}\nwant ${want.toSeq}")
    assert(full.length == 45 && got.length == 10 * 3,
      "the cut must genuinely drop partners on this corpus")
    assert(!got.exists(_._1 == 99L), "isolated vector reports no partners")
  }

  test("diffuse data takes the blocked sweep and matches brute force") {
    // deterministic pseudo-random directions: no cluster structure at all,
    // so every cluster radius exceeds the threshold angle and the sample
    // probe must dispatch to the blocked kernel (n ≫ c: with too few
    // points per centroid the sample radii overfit small and the probe
    // legitimately reads the data as clustered)
    val vecs = (0 until 500).map { i =>
      val rnd = new java.util.Random(i * 2654435761L)
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val d = writeFixture(vecs)
    val df = VectorQueries.qEmbNearDup(spark, d)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = bruteForce(vecs, 0.45)
    assert(want.nonEmpty, "fixture should produce at least one qualifying pair")
    assert(got == want, "exact pair set on diffuse data")
    val p = planOf(df)
    assert(!p.contains("cosine_sim"), s"expected blocked-sweep path:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("blocked sweep crosses block boundaries correctly (multi-block)") {
    // diffuse (blocked dispatch) but n > blockRows, so qualifying pairs
    // span DIFFERENT hash blocks — exercises the cross-block panels and
    // the same-block upper triangle together
    val vecs = (0 until 2100).map { i =>
      val rnd = new java.util.Random(i * 40503L + 7)
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val d = writeFixture(vecs)
    val got = VectorQueries.qEmbNearDup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = bruteForce(vecs, 0.45)
    assert(want.nonEmpty)
    assert(got == want,
      "pair set must be exact across hash-block boundaries")
  }

  test("SemDeDup matches a full driver-side replication of its contract") {
    // 4 near-dup families (within-family cosine ≈ 1) + diffuse Gaussian
    // singletons; expected relation replicated end-to-end: seeded
    // centroid pick → rounded-cosine argmax assignment → lower-id
    // in-cluster neighbor rule
    val vecs: Seq[(Long, Array[Float])] = (for {
      fam <- 0 until 4; k <- 0 until 6
    } yield {
      val v = new Array[Float](dim)
      v(fam) = 1.0f
      v(8 + fam) = 0.02f * k
      ((fam * 6 + k).toLong, v)
    }) ++ (24 until 60).map { i =>
      val rnd = new java.util.Random(i * 7919L + 13)
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
    val d = writeFixture(vecs)
    val c = 16; val tau = 0.45
    val got = VectorQueries.qSemDedup(spark, d, c, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seeds = vecs.map { case (id, v) => (md5hex(id.toString), id, v) }
      .sortBy(t => (t._1, t._2)).take(c)
    val assign = vecs.map { case (id, v) =>
      val best = seeds
        .map { case (_, cid, cv) => (r6(cosRef(v, cv).get), cid) }
        .maxBy { case (rc, cid) => (rc, -cid) }
      id -> best._2
    }.toMap
    val byId = vecs.toMap
    val want = vecs.map { case (id, v) =>
      val removed = vecs.exists { case (oid, ov) =>
        oid < id && assign(oid) == assign(id) &&
          r6(cosRef(ov, v).get) >= tau
      }
      (id, assign(id), removed)
    }
    assert(byId.size == vecs.size)
    assert(got.sortBy(_._1).toSeq == want.sortBy(_._1),
      "assignment + removal relation must match the replication")
    // families are near-dup (cosine ≈ 1) but may straddle a cluster
    // boundary — the documented SemDeDup approximation — so require
    // substantial removal mass, not a per-family exact count
    assert(want.count(_._3) >= 10,
      s"family members sharing a cluster must be removed: ${want.count(_._3)}")
    // deterministic across evaluations
    val again = VectorQueries.qSemDedup(spark, d, c, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("incremental probe: planted dup is found, orthogonal newcomer is clean") {
    // corpus (ids < 90, the bottom 90% by rank) lives in dims 0..15;
    // batch id 95 is an exact copy of corpus id 7; batch id 96 lives in
    // dims 16..31 — cosine exactly 0 against every corpus vector
    def lowDims(seed: Long): Array[Float] = {
      val rnd = new java.util.Random(seed)
      Array.tabulate(dim)(i => if (i < 16) rnd.nextGaussian().toFloat else 0f)
    }
    val corpus = (0 until 89).map(i => (i.toLong, lowDims(i * 104729L + 1)))
    val batchPlain = (Seq(89, 90, 91, 92, 93, 94, 97, 98, 99))
      .map(i => (i.toLong, lowDims(i * 104729L + 1)))
    val copied = (95L, corpus(7)._2.clone())
    val ortho = (96L, {
      val rnd = new java.util.Random(424243L)
      Array.tabulate(dim)(i => if (i >= 16) rnd.nextGaussian().toFloat else 0f)
    })
    val d = writeFixture(corpus ++ batchPlain ++ Seq(copied, ortho))
    val out = VectorQueries.qEmbIncremental(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // exactly one row per batch vector (n=100 → batch = top-10 ids 90..99)
    assert(out.keySet == (90L to 99L).toSet,
      s"one row per batch vector, got ${out.keySet}")
    val (nDup, bestId, bestCos) = out(95L)
    assert(nDup >= 1 && bestId.contains(7L) && bestCos.contains(1.0),
      s"planted copy must match corpus id 7 at cosine 1: ${out(95L)}")
    assert(out(96L) == ((0L, None, None)),
      s"orthogonal newcomer must be clean: ${out(96L)}")
    val again = VectorQueries.qEmbIncremental(spark, d).collect()
      .map(r => r.toString).toSeq
    assert(again == VectorQueries.qEmbIncremental(spark, d).collect()
      .map(r => r.toString).toSeq)
  }

  test("probe kernel matches a full driver-side replication on random data") {
    val corpus = (0 until 120).map { i =>
      val rnd = new java.util.Random(i * 6151L + 3)
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
    val batch = (200 until 230).map { i =>
      val rnd = new java.util.Random(i * 6151L + 3)
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
    val c = 16; val tau = 0.3
    import spark.implicits._
    def df(vs: Seq[(Long, Array[Float])]) =
      vs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>"))
    val got = VectorQueries.probeNewAgainstCorpus(df(batch), df(corpus), c, tau)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap

    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seeds = corpus.map { case (id, v) => (md5hex(id.toString), id, v) }
      .sortBy(t => (t._1, t._2)).take(c)
    def assignOf(v: Array[Float]): Long = seeds
      .map { case (_, cid, cv) => (r6(cosRef(v, cv).get), cid) }
      .maxBy { case (rc, cid) => (rc, -cid) }._2
    val corpusAssign = corpus.map { case (id, v) => (id, v, assignOf(v)) }
    val want = batch.map { case (id, v) =>
      val cl = assignOf(v)
      val ms = corpusAssign
        .filter { case (_, ov, ocl) => ocl == cl && r6(cosRef(ov, v).get) >= tau }
        .map { case (oid, ov, _) => (r6(cosRef(ov, v).get), oid) }
      val best = ms.sortBy { case (rc, oid) => (-rc, oid) }.headOption
      id -> ((cl, ms.size.toLong,
        best.map(_._2), best.map(_._1)))
    }.toMap
    assert(want.values.map(_._2).sum > 0, "fixture must produce matches")
    assert(got == want, "probe report must equal the replication")
  }
}
