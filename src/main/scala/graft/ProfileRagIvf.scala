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
    spark.stop()
  }
}
