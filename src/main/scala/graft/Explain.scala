package graft

import org.apache.spark.sql.SparkSession

/** Developer tool: run one named query from [[SparkEntry.queries]], print
  * wall time (cold + warm) and optionally the formatted physical plan.
  *
  * Usage: runMain graft.Explain <queryName> <sfDir> [plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val showPlan = args.contains("plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries.getOrElse(name, {
      System.err.println(s"unknown query '$name'. Available:\n  " +
        SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    })
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[explain] $name round=$round rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (showPlan) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
