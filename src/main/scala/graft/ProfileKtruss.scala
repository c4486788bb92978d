package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the dd_ktruss broadcast-adjacency plan against the
  * over-cap shuffled fallback at a given SF — walls plus an output
  * equality check (count + xor of row hashes, order-independent). */
object ProfileKtruss {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ktruss] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        // xor-fold is order-independent — safe under any partitioning
        expr("coalesce(bit_xor(xxhash64(doc_a, doc_b, support)), 0L)"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    val pairs = timed("pair graph build") {
      val p = DedupQueries.qDedupSimhash(spark, sfDir)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
        .localCheckpoint()
      println(s"[ktruss] edges: ${p.count()}")
      p
    }
    // optional 2nd arg restricts to one plan (broadcast | fallback);
    // default runs both and checks fingerprint equality. Validated:
    // a typo must not silently fall through to the both-plans path —
    // at sf10 the fallback leg alone writes >75 GB of sort spill
    val mode = if (args.length > 1) args(1) else "both"
    require(Set("broadcast", "fallback", "both")(mode),
      s"unknown plan mode '$mode' (broadcast | fallback | both)")
    val broadcastOut = if (mode == "fallback") None else Some(
      timed("broadcast plan (default cap)") {
        fingerprint(DedupQueries.ktrussEdges(pairs, 4, 8))
      })
    val fallbackOut = if (mode == "broadcast") None else Some(
      timed("shuffled fallback (cap=0)") {
        fingerprint(DedupQueries.ktrussEdges(pairs, 4, 8,
          maxBroadcastAdjacency = 0L))
      })
    (broadcastOut, fallbackOut) match {
      case (Some(b), Some(f)) =>
        println(s"[ktruss] broadcast=(${b._1}, ${b._2}) " +
          s"fallback=(${f._1}, ${f._2}) equal=${b == f}")
      case (b, f) =>
        println(s"[ktruss] single-plan run: ${b.orElse(f).get}")
    }
    spark.stop()
  }
}
