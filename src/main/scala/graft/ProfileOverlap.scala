package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the MinHash source-overlap estimator's error against the
  * exact matrix (headroom evidence for the dd_source_overlap_minhash_gate
  * ε floor — recorded in NOTES.md). */
object ProfileOverlap {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]").appName("profile-overlap")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = DedupQueries.qSourceOverlap(spark, dir)
      .select(col("src_a"), col("src_b"), col("jaccard"))
    val est = DedupQueries.qSourceOverlapMinhash(spark, dir)
    val err = exact.join(est, Seq("src_a", "src_b"), "left")
      .select(abs(coalesce(col("est_jaccard"), lit(0.0)) - col("jaccard")).as("err"))
      .agg(max(col("err")).as("max_err"), avg(col("err")).as("avg_err"),
        count(lit(1)).as("pairs"))
    err.show(false)
    spark.stop()
  }
}
