package graft

import org.apache.spark.sql.SparkSession

/** Developer tool: per-config candidate-pair volume of the LSH
  * band-tuning curve (dd_lsh_tuning_curve) across sf dirs — the
  * measurement split behind the curve's sf1 wall attribution (the same
  * output-volume-vs-super-linear-stage question ProfileDdSplit answers
  * for the simhash family).
  *
  * Usage: runMain graft.ProfileLshCurve <sfDir> [<sfDir2> ...]
  */
object ProfileLshCurve {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { d =>
      val nDocs = graft.queries.Tables.documents(spark, d).count()
      println(s"[lshcurve] === $d (docs=$nDocs) ===")
      val t0 = System.nanoTime()
      graft.queries.DedupQueries.lshCurveCandVolumes(spark, d)
        .foreach { case (bands, n) =>
          println(f"[lshcurve] bands=$bands%2d candidates=$n%10d")
        }
      println(f"[lshcurve] total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
