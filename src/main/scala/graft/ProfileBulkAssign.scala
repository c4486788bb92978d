package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measures the expression-vs-bulk seeded-assignment constant
  * (VERDICT r5 "do this" #1) — the greatest-of-structs path re-decodes
  * the row vector once per centroid, the mapPartitions kernel once per
  * row. Prints wall seconds per path at several centroid counts. */
object ProfileBulkAssign {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // synthetic 384-dim corpus big enough that per-row decode cost, not
    // the scheduler floor, is what's measured (sf0.1's 2000 rows is all
    // constant: expr/bulk reads ~2× there, the r5 microbench read ~20×
    // per-cosine at c=142)
    val emb = spark.range(n).select(col("id").as("vec_id"),
        expr("transform(sequence(1, 384), i -> cast(sin(id * i) as float))")
          .as("embedding"))
      .repartition(8).localCheckpoint()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (c <- Seq(16, 64, 128, 256)) {
      val seeds = VectorQueries.seededCentroids(emb, c).localCheckpoint()
      // warm + measure min-of-2 per path
      val te = (1 to 2).map(_ => time {
        VectorQueries.assignSeedsExpr(emb, seeds).foreach(_ => ())
      }).min
      val tb = (1 to 2).map(_ => time {
        VectorQueries.assignSeedsBulk(emb, seeds).foreach(_ => ())
      }).min
      println(f"[bulk-assign] n=$n c=$c expr=$te%.2fs bulk=$tb%.2fs ratio=${te / tb}%.1f×")
    }
    spark.stop()
  }
}
