package graft

import graft.ingest.IngestPipeline
import graft.llm.{HashEmbedder, StubLlm}
import graft.model.RawDoc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-stage wall time of the ingest pipeline at a given SF. */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val p = new IngestPipeline(new StubLlm, new HashEmbedder(384))
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(lit("synth").as("namespace"), col("source").as("repo"),
        lit("main").as("branch"),
        concat(lit("doc_"), col("doc_id"), lit(".md")).as("filePath"),
        col("text")).as[RawDoc]

    timed("raw.count") { raw.count() }
    timed("kept.count") {
      raw.toDF().filter(graft.operators.FileFilters.keepFile(col("filePath"))).count()
    }
    val pre = timed("preprocess+cache") { val d = p.preprocess(raw).cache(); d.count(); d }
    val chunksOnly = timed("chunk") { p.chunk(pre, "r").count() }
    val chunks = timed("enrichAndEmbed+cache") {
      val d = p.enrichAndEmbed(p.chunk(pre, "r")).cache(); d.count(); d }
    val files = timed("fileRollup") { val d = p.fileRollup(chunks).cache(); d.count(); d }
    val modules = timed("moduleRollup") { val d = p.moduleRollup(files).cache(); d.count(); d }
    timed("repoRollup") { p.repoRollup(modules).count() }
    timed("catalog") { p.catalog(pre, chunks).count() }
    timed("union+repartition") {
      chunks.unionByName(files).toDF().repartition(32).count()
    }
    spark.stop()
  }
}
