package graft

import org.apache.spark.sql.SparkSession

/** Round-8 plan inspection for the new operators (feeds PERF.md /
  * PlanQualitySpec assertions). */
object ProfilePlans8 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("== ev_interval_pairs ==")
    graft.queries.EventQueries.qIntervalPairs(spark, d).explain("formatted")
    println("== td_shard_rebalance ==")
    graft.queries.PipelineQueries.qShardRebalance(spark, d).explain("formatted")
    spark.stop()
  }
}
