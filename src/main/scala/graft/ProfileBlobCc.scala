package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for mm_blob_clusters at a given sf-dir — drives the
  * VERDICT r8 scale-guard work (contraction vs full-pair CC). */
object ProfileBlobCc {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[blobcc] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.queries.{DedupQueries, Tables}
    import graft.multimodal.Media
    val grams = expr(
      """array_distinct(transform(
        |  sequence(1, greatest(length(blob) - 3, 0)),
        |  i -> cast(substring(blob, i, 4) as string)))""".stripMargin)
    val sigs = Media.mediaTable(spark, d)
      .filter(length(col("blob")) >= 4)
      .select(col("media_id").as("doc_id"),
        graft.functions.TextFunctions.simhash(grams).as("sig"))
      .persist()
    timed("sigs materialize")(sigs.count())
    val grp = sigs.groupBy(col("sig"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("gn"))
      .persist()
    val nGrp = timed("grp materialize")(grp.count())
    println(s"[blobcc] distinct sigs = $nGrp")
    val repPairs = timed("rep banded pairs")(
      DedupQueries.bandedSimhashPairs(
        grp.select(col("rep").as("doc_id"), col("sig"))).localCheckpoint())
    println(s"[blobcc] rep pairs = ${repPairs.count()}")
    val labels = timed("componentLabels")(
      DedupQueries.componentLabels(spark, repPairs).localCheckpoint())
    println(s"[blobcc] labeled reps = ${labels.count()}")
    val out = timed("expand+rollup")(
      sigs.join(grp, "sig")
        .join(labels.withColumnRenamed("node", "rep"), Seq("rep"), "left")
        .filter(col("label").isNotNull || col("gn") >= 2)
        .select(col("doc_id"), coalesce(col("label"), col("rep")).as("label"))
        .groupBy(col("label").as("keep_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .count())
    println(s"[blobcc] clusters = $out")
    spark.stop()
  }
}
