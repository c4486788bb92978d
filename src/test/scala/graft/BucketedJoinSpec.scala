package graft

import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Bucketed-table co-location — the storage-layout tool for repeated
  * fact-to-fact joins at 100 TB: both sides written `bucketBy(N, key)`
  * hash-place rows so an equi-join on the bucket key plans with NO
  * exchange on either side. This is what "pre-partitioning" from the
  * builder brief means concretely; the spec pins both the plan shape and
  * value equality with the plain parquet join.
  */
class BucketedJoinSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("bucketBy co-locates an orders-lineitem join: zero exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffled-join path: broadcast would trivially avoid the
      // exchange and prove nothing about the bucket layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, sf)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderdate"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      val rows = joined.collect()
      assert(rows.nonEmpty)

      val plan = joined.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val joinExchanges =
        "Exchange hashpartitioning\\((l|o)_orderkey".r.findAllMatchIn(plan).length
      assert(joinExchanges == 0,
        s"bucketed join must not shuffle either side:\n$plan")

      // same values as the plain parquet-to-parquet join
      val baseline = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderdate"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .collect()
      def key(r: org.apache.spark.sql.Row) = String.valueOf(r.get(0))
      assert(rows.sortBy(key).toSeq == baseline.sortBy(key).toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
