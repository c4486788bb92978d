package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Developer tool (VERDICT r6 item 7): stage-split measurement of the dd
  * family's sf1 scaling — separates PAIR-EMISSION cost (signature + band
  * join + hamming filter, proportional to candidate/output volume) from
  * the downstream GRAPH-JOIN cost (degree-oriented wedge join), and the
  * source-overlap family's posting-list vs pair-matrix stages, so the
  * family's >2x wall ratio at 10x data can be attributed to output
  * volume vs a super-linear stage.
  *
  * Usage: runMain graft.ProfileDdSplit <sfDir> [<sfDir2> ...]
  */
object ProfileDdSplit {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ddsplit] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    dirs.foreach { d =>
      println(s"[ddsplit] === $d ===")
      val docs = graft.queries.Tables.documents(spark, d)
      val nDocs = docs.count()
      println(s"[ddsplit] docs=$nDocs")
      // stage 1: signatures alone (one scan + tokenize + simhash)
      import graft.functions.TextFunctions.{shingles, simhash, tokens}
      val sigs = docs
        .select(col("doc_id"), simhash(tokens(col("text"))).as("sig"))
        .localCheckpoint()
      time("simhash signatures")(sigs.count())
      // stage 2: band join + hamming filter = pair emission
      val nBands = 4; val bandBits = 15
      val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(array((0 until nBands).map { bi =>
          shiftright(col("sig"), bi * bandBits).bitwiseAND((1L << bandBits) - 1)
        }: _*)).as(Seq("band_idx", "band_key"))).localCheckpoint()
      val pairs = time("band join + hamming (pair emission)") {
        val p = banded.as("a").join(banded.as("b"),
            col("a.band_idx") === col("b.band_idx") &&
              col("a.band_key") === col("b.band_key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
          .dropDuplicates("doc_a", "doc_b")
          .withColumn("dist",
            graft.functions.TextFunctions.hamming(col("sig_a"), col("sig_b"))
              .cast("int"))
          .filter(col("dist") <= 3)
          .select(col("doc_a"), col("doc_b")).localCheckpoint()
        p
      }
      val m = pairs.count()
      println(s"[ddsplit] pairs m=$m")
      // stage 3: the degree-oriented wedge join over the emitted graph
      time("wedge join (triangles)") {
        val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
          .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
        val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        val oriented = edges
          .join(deg.select(col("u"), col("deg").as("du")), "u")
          .join(deg.select(col("u").as("v"), col("deg").as("dv")), "v")
          .filter(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")))
          .select(col("u"), col("v")).localCheckpoint()
        val wedges = oriented.as("e1").join(oriented.as("e2"),
            col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
          .select(col("e1.v").as("a"), col("e2.v").as("b"))
        wedges.join(
          edges.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"),
          "left_semi").count()
      }
      // source overlap: posting stage vs pair-matrix stage
      val ss = docs.select(col("source"),
          explode(shingles(col("text"), 3)).as("shingle"))
        .distinct().localCheckpoint()
      time("overlap postings (distinct shingles)")(ss.count())
      time("overlap exact pair matrix") {
        val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
        ss.as("a").join(ss.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.source") < col("b.source"))
          .groupBy(col("a.source"), col("b.source"))
          .agg(count(lit(1)).as("inter")).count()
      }
    }
    spark.stop()
  }
}
