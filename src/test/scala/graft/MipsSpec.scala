package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions.col

/** MIPS retrieval (vs_knn_mips) and the norm-augmentation reduction
  * gate (vs_knn_mips_gate): driver replica of the dot top-k, the
  * reduction identity aug-cos = dot/(‖q‖·M), and the crafted case
  * where MIPS and cosine genuinely disagree — proving the operator is
  * not a renamed vs_knn_brute. Oracle parity vs DuckDB is the gate.
  */
class MipsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("engine MIPS top-5 equals a driver replica on sf0.001") {
    val vecs = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val want = vecs.filter(_._1 < 10).flatMap { case (q, qv) =>
      vecs.filter(_._1 != q)
        .map { case (id, v) => (id, dot(v, qv)) }
        .sortBy { case (id, sc) => (-sc, id) }.take(5).zipWithIndex
        .map { case ((id, sc), i) =>
          (q, id, TestHash.roundHalfUp(sc, 6), i + 1) }
    }.toSeq
    val got = VectorQueries.qKnnMips(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
  }

  test("the reduction identity: augmented cosine is dot scaled by 1/(norm_q * M)") {
    val vecs = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val m = vecs.map { case (_, v) => math.sqrt(dot(v, v)) }.max
    val (qi, qv) = vecs.head
    vecs.filter(_._1 != qi).take(50).foreach { case (_, v) =>
      val aug = v :+ math.sqrt(math.max(m * m - dot(v, v), 0.0))
      val qa = qv :+ 0.0
      val ac = dot(aug, qa) /
        (math.sqrt(dot(aug, aug)) * math.sqrt(dot(qa, qa)))
      val expected = dot(v, qv) / (math.sqrt(dot(qv, qv)) * m)
      assert(math.abs(ac - expected) <= 1e-9,
        s"aug-cos $ac vs dot/(|q|M) $expected")
    }
  }

  test("MIPS through the cosine IVF tier: measured recall clears the floor") {
    // the operational reduction: per-query recall@5 of the augmented-
    // index probe vs exact MIPS, the number the 0.4 floor prices
    val truth = VectorQueries.qKnnMips(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val ann = VectorQueries.qKnnMipsIvfParam(spark, sf, nprobe = 6)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      q -> (t & ann.getOrElse(q, Set.empty)).size.toDouble / t.size
    }
    info(s"per-query recall: ${recalls.toSeq.sortBy(_._1)}")
    assert(recalls.values.forall(_ >= 0.4),
      s"floor 0.4 must hold per query: $recalls")
    assert(recalls.values.sum / recalls.size >= 0.6,
      "mean recall keeps headroom over the floor")
  }

  private def recallsVsMips(ann: org.apache.spark.sql.DataFrame): Map[Long, Double] = {
    val truth = VectorQueries.qKnnMips(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val a = ann.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    truth.map { case (q, t) =>
      q -> (t & a.getOrElse(q, Set.empty)).size.toDouble / t.size
    }
  }

  test("MIPS through the LSH tier: measured recall clears the floor") {
    // the second serving row of the reduction claim: the UNMODIFIED
    // hyperplane-LSH tier over augmented vectors, recall vs exact MIPS
    val recalls = recallsVsMips(
      VectorQueries.qKnnMipsLshParam(spark, sf, nTables = 8, bitsPerTable = 4))
    info(s"per-query recall: ${recalls.toSeq.sortBy(_._1)}")
    assert(recalls.values.forall(_ >= 0.2),
      s"floor 0.2 must hold per query: $recalls")
    assert(recalls.values.sum / recalls.size >= 0.4,
      "mean recall keeps headroom over the floor")
  }

  test("MIPS through the PQ tier: measured recall clears the floor") {
    val recalls = recallsVsMips(
      VectorQueries.qKnnMipsPqParam(spark, sf, nprobe = 6, overfetch = 16))
    info(s"per-query recall: ${recalls.toSeq.sortBy(_._1)}")
    assert(recalls.values.forall(_ >= 0.2),
      s"floor 0.2 must hold per query: $recalls")
    assert(recalls.values.sum / recalls.size >= 0.4,
      "mean recall keeps headroom over the floor")
  }

  test("MIPS through the q8 tier: measured recall clears the floor") {
    // completes the four-tier claim: the report itself is the ann check
    val rep = VectorQueries.qKnnMipsQ8Recall(spark, sf).collect()
    assert(rep.length == 10 && rep.forall(_.getBoolean(2)),
      s"q8-tier MIPS recall must clear 0.4 per query: ${rep.toSeq}")
  }

  test("MIPS and cosine disagree when the norm carries the signal") {
    import spark.implicits._
    // q = (1, 0); a points exactly at q but is tiny; b is 10° off but
    // 100× longer: cosine prefers a, MIPS prefers b
    val vecs = Seq(
      (0L, Seq(1f, 0f)),
      (1L, Seq(0.01f, 0f)),
      (2L, Seq((100 * math.cos(0.17)).toFloat, (100 * math.sin(0.17)).toFloat)),
      (3L, Seq(0.005f, 0.001f)))
    val dir = java.nio.file.Files.createTempDirectory("mips").toString
    vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val mips = VectorQueries.qKnnMips(spark, dir).collect()
      .filter(_.getLong(0) == 0L).sortBy(_.getInt(3)).map(_.getLong(1))
    assert(mips.head == 2L, s"MIPS must rank the long vector first: ${mips.toSeq}")
    val brute = VectorQueries.qKnnBrute(spark, dir).collect()
      .filter(_.getLong(0) == 0L).sortBy(_.getInt(3)).map(_.getLong(1))
    assert(brute.head == 1L, s"cosine must rank the aligned vector first: ${brute.toSeq}")
    // and the reduction gate still certifies order equality vs MIPS
    val gate = VectorQueries.qKnnMipsGate(spark, dir).collect()
    assert(gate.forall(_.getBoolean(3)), s"gate rows: ${gate.toSeq}")
  }
}
