package graft

import graft.queries.{Tables, VectorQueries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Developer tool: stage-by-stage timing of the stored-assignment
  * incremental probe (vs_emb_incremental), warm-cache rounds — isolates
  * which job the per-probe wall goes to.
  *
  * Usage: runMain graft.ProfileProbe [sfDir]
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    // warm: full query twice (first builds the store)
    (1 to 2).foreach { i =>
      time(s"full qEmbIncremental #$i")(
        VectorQueries.qEmbIncremental(spark, sfDir).count())
    }
    // stages, warm
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val n = time("emb.count")(emb.count())
    val kBatch = math.ceil(n * 0.1).toInt
    val thr = time("thr takeOrdered")(
      emb.orderBy(col("vec_id").desc).limit(kBatch)
        .agg(min(col("vec_id"))).collect()(0).getLong(0))
    val batch = emb.filter(col("vec_id") >= thr)
    (1 to 3).foreach { i =>
      time(s"probeStored #$i") {
        // the cached-store path exactly as qEmbIncremental runs it
        val dir = VectorQueries.probeStoreDir(sfDir)
          .getOrElse(sys.error(s"no probe store yet for $sfDir — run qEmbIncremental first"))
        VectorQueries.probeStored(spark, batch, dir).orderBy(col("vec_id")).count()
      }
    }
    // decomposed: batch assignment alone, then the match join alone
    val seeds = spark.read.parquet(
      VectorQueries.probeStoreDir(sfDir)
        .getOrElse(sys.error(s"no probe store yet for $sfDir")) + "/_seeds")
    (1 to 2).foreach { i =>
      time(s"batch assign+ckpt #$i")(
        VectorQueries.assignToSeeds(batch, seeds, 16).localCheckpoint().count())
    }
    val assignedBatch = VectorQueries.assignToSeeds(batch, seeds, 16).localCheckpoint()
    val assignedCorpus = VectorQueries.assignToSeeds(
      emb.filter(col("vec_id") < thr), seeds, 16).localCheckpoint()
    (1 to 2).foreach { i =>
      time(s"matchReport #$i")(
        VectorQueries.matchReport(assignedBatch, assignedCorpus, 0.35).count())
    }
    // the r6 one-shot kernel for comparison (corpus re-assigned per call)
    (1 to 3).foreach { i =>
      time(s"oneShot probe #$i")(
        VectorQueries.probeNewAgainstCorpus(batch,
          emb.filter(col("vec_id") < thr), 16, 0.35)
          .orderBy(col("vec_id")).count())
    }
    spark.stop()
  }
}
