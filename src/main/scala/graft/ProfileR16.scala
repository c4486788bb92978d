package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 dev tool: phase breakdown of dd_ktruss — wall per peel
  * round (via the onRound observer, stamped with elapsed time) plus the
  * final-output action, warm (pair graph prebuilt and checkpointed).
  * Usage: runMain graft.ProfileR16 [sfDir] [reps]
  */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    val pairs = DedupQueries.qDedupSimhash(spark, sfDir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .localCheckpoint()
    println(s"[r16] edges: ${pairs.count()}")

    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      var last = t0
      val out = DedupQueries.ktrussEdges(pairs, 4, 10,
        onRound = (round, n, bcast) => {
          val now = System.nanoTime()
          println(f"[r16] rep=$rep round=$round edges=$n bcast=$bcast " +
            f"phase=${(now - last) / 1e9}%.2fs total=${(now - t0) / 1e9}%.2fs")
          last = now
        })
      val n = out.count()
      val now = System.nanoTime()
      println(f"[r16] rep=$rep FINAL rows=$n tail=${(now - last) / 1e9}%.2fs " +
        f"total=${(now - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
