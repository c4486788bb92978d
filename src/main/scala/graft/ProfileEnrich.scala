package graft

import graft.ingest.IngestPipeline
import graft.llm.{HashEmbedder, StubLlm}
import org.apache.spark.sql.SparkSession

/** Dev tool: driver-side microbench of the per-chunk enrich components. */
object ProfileEnrich {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    println(s"[enrich] n=${texts.length} avgLen=${texts.map(_.length).sum / texts.length}")
    val llm = new StubLlm
    val emb = new HashEmbedder(384)

    def timed(label: String)(f: String => Any): Unit = {
      // warmup
      texts.take(500).foreach(f)
      val t0 = System.nanoTime()
      texts.foreach(f)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"[enrich] $label: ${ms}%.0fms total, ${ms * 1000 / texts.length}%.0fus/doc")
    }

    timed("llm.summary")(t => llm.complete(s"Summarize this text code section:\n${t.take(2000)}"))
    timed("llm.title")(t => llm.complete(s"Give a title for:\n${t.take(500)}"))
    timed("llm.keywords")(t => llm.complete(s"Give 10 keywords for:\n${t.take(2000)}"))
    timed("extractImports")(t => IngestPipeline.extractImports(t, "python"))
    timed("extractSymbol")(t => IngestPipeline.extractSymbol(t, "python"))
    timed("extractTopics")(t => IngestPipeline.extractTopics(t))
    timed("embed")(t => emb.embed(t))
    timed("nodeId")(t => IngestPipeline.nodeId(
      graft.model.Node.empty.copy(text = t, filePath = "a/b.py")))

    // encoder round-trip cost for the wide Node row
    import spark.implicits._
    val nodes = texts.zipWithIndex.map { case (t, i) =>
      graft.model.Node.empty.copy(
        rowId = s"n$i", text = t, filePath = s"m/doc_$i.md",
        keywords = Seq("a", "b", "c"), topics = Seq("t1", "t2"),
        imports = Seq("x.y"), meta = Map("chunk_index" -> "0", "start_line" -> "1"),
        embedding = emb.embed(t))
    }.toSeq
    def timedN(label: String)(f: => Any): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      f
      println(f"[enrich] $label: ${(System.nanoTime() - t0) / 1e6}%.0fms")
    }
    val ds = spark.createDataset(nodes)
    timedN("ds.count (serialize)") { ds.count() }
    timedN("ds.map(identity).count (ser+deser+ser)") { ds.map(identity).count() }
    timedN("ds.toDF.count") { ds.toDF().count() }
    timedN("ds.cache+count") { val c = ds.map(identity).cache(); c.count(); c.unpersist() }
    spark.stop()
  }
}
