package graft

import graft.retrieval.{IvfIndex, Retrieval}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: recall/balance comparison of IVF centroid builds. */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val all = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val truth = queries.map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map { case (id, v) => (id, Retrieval.cosineLocal(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
    }.toMap

    for (iters <- Seq(0, 2, 4, 8); nprobe <- Seq(2, 4)) {
      val cents = IvfIndex.buildCentroids(emb, "vec_id", "embedding", 16, iterations = iters)
      val index = IvfIndex.assign(emb, "vec_id", "embedding", cents)
      val ivf = IvfIndex.search(index, "vec_id", "embedding", queries, cents,
        nprobe = nprobe, k = 5).collect()
      val hits = ivf.groupBy(_.getLong(0)).map { case (qid, rows) =>
        rows.map(_.getLong(1)).count(truth(qid).contains)
      }.sum
      val sizes = index.groupBy("centroid_id").count().collect().map(_.getLong(1))
      println(f"[ivf] iters=$iters nprobe=$nprobe recall@5=${hits.toDouble / (queries.size * 5)}%.3f " +
        s"maxList=${sizes.max}/${sizes.sum} lists=${sizes.length}")
    }
    spark.stop()
  }
}
