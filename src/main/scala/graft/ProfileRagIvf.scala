package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: raw per-query recall and wall comparison of the batched
  * rag retrieval gates — the exact tier (one full chunk-scope scan per
  * query batch, linear in corpus) vs the stored-IVF tier (centroid
  * shortlist → statically pruned partition scan → q8 two-phase re-rank,
  * ~n/√c rows scanned). Prints per-query recall@10 so the gate floor's
  * headroom is measured, not asserted, and cold/warm walls for both
  * tiers (the index build cost prints separately via the `[rag] ivf
  * index build` stderr line). */
object ProfileRagIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // corpus build lands here (untimed, like Bench's setup step)
    graft.queries.RagQueries.corpusFor(spark, sfDir).count()

    val (brute, ann) = graft.queries.RagQueries.ivfGateParts(spark, sfDir)
    val truth = brute.localCheckpoint()
    val hits = truth
      .join(ann.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    val rec = truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .withColumn("recall",
        coalesce(col("n_hits"), lit(0)).cast("double") / col("n_true"))
      .orderBy(col("query_id")).collect()
    rec.foreach(r => println(
      f"[ragivf] $sfDir q=${r.getLong(0)} recall@10=${r.getDouble(3)}%.2f"))
    println(f"[ragivf] $sfDir mean=${rec.map(_.getDouble(3)).sum / rec.length}%.2f " +
      f"min=${rec.map(_.getDouble(3)).min}%.2f")

    def time(label: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[ragivf] $sfDir $label run$i n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("ivf_gate")(
      graft.queries.RagQueries.queries("rag_retrieve_topk_ivf_gate")(spark, sfDir).count())
    time("exact_gate")(
      graft.queries.RagQueries.queries("rag_retrieve_topk_gate")(spark, sfDir).count())
    // the serving path alone (the gate's walls above include their
    // built-in exact-truth compare — a full corpus scan on both sides)
    time("ivf_serve")(
      graft.queries.RagQueries.ivfGateParts(spark, sfDir)._2.count())
    time("exact_serve") {
      import graft.llm.HashEmbedder
      import graft.retrieval.{BatchRetrieval, Retrieval}
      val specs = (0 until 5).map(i =>
        BatchRetrieval.Spec(i.toString, s"probe query number $i", "chunk"))
      BatchRetrieval.retrieveAllNoExpand(
        graft.queries.RagQueries.corpusFor(spark, sfDir),
        new HashEmbedder(384), specs).values.map(_.docs.size).sum.toLong
    }

    // ---- adversarial-skew leg (VERDICT r14 item 1) ----------------------
    // power-law fixture: ~50 % of rows in one tight near-duplicate
    // cluster. Reports: cluster mass, capped vs uncapped list shares,
    // per-query recall of the skew gate, and serving walls so the
    // "within 3× of the uniform leg" bar is measured.
    {
      import graft.queries.RagQueries
      import graft.retrieval.IvfIndex
      val sk = RagQueries.skewedEmbeddings(spark, sfDir).select("vec_id", "embedding")
      val n = sk.count()
      val byCid = RagQueries.skewedEmbeddings(spark, sfDir)
        .groupBy(col("cid")).count().orderBy(col("count").desc).collect()
      println(s"[ragivf-skew] $sfDir n=$n hot cluster share=" +
        f"${byCid.head.getLong(1).toDouble / n}%.3f (cid ${byCid.head.getInt(0)})")
      val c = graft.queries.VectorQueries.ivfCentroidCount(n)
      def maxShare(cents: Array[(Int, Array[Float])]): (Int, Double) = {
        val counts = IvfIndex.assign(sk, "vec_id", "embedding", cents)
          .groupBy(col("centroid_id")).count().collect().map(_.getLong(1))
        (cents.length, counts.max.toDouble / n)
      }
      val (nu, shU) = maxShare(IvfIndex.buildCentroids(sk, "vec_id", "embedding", c))
      val (nb, shB) = maxShare(IvfIndex.buildCentroidsBalanced(
        sk, "vec_id", "embedding", c, capFrac = 4.0 / c))
      println(f"[ragivf-skew] $sfDir uncapped c=$nu max_list_share=$shU%.3f " +
        f"| balanced c=$nb max_list_share=$shB%.3f (cap=${4.0 / c}%.3f)")
      val (bruteS, annS) = RagQueries.ivfSkewGateParts(spark, sfDir)
      val truthS = bruteS.localCheckpoint()
      val recS = truthS.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
        .join(truthS.join(annS.select(col("query_id"), col("neighbor_id")),
            Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits")),
          Seq("query_id"), "left")
        .withColumn("recall",
          coalesce(col("n_hits"), lit(0)).cast("double") / col("n_true"))
        .orderBy(col("query_id")).collect()
      recS.foreach(r => println(
        f"[ragivf-skew] $sfDir q=${r.getLong(0)} recall@10=${r.getDouble(3)}%.2f"))
      println(f"[ragivf-skew] $sfDir mean=${recS.map(_.getDouble(3)).sum / recS.length}%.2f " +
        f"min=${recS.map(_.getDouble(3)).min}%.2f")
      time("skew_gate")(
        RagQueries.queries("rag_retrieve_topk_ivf_skew_gate")(spark, sfDir).count())
      time("skew_serve")(RagQueries.ivfSkewGateParts(spark, sfDir)._2.count())
    }
    spark.stop()
  }
}
