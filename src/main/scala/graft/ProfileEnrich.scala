package graft

import graft.ingest.IngestPipeline
import graft.llm.{HashEmbedder, StubLlm}
import org.apache.spark.sql.SparkSession

/** Dev tool: driver-side microbench of the per-chunk enrich components. */
object ProfileEnrich {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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

    // the real pipeline fragment, full vs half rows: per-task-fixed cost
    // shows as unchanged wall, per-row cost as halved wall
    import graft.ingest.IngestPipeline
    import graft.model.RawDoc
    import org.apache.spark.sql.functions._
    val p = new IngestPipeline(llm, emb)
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(lit("synth").as("namespace"), col("source").as("repo"),
        lit("main").as("branch"),
        concat(lit("doc_"), col("doc_id"), lit(".md")).as("filePath"),
        col("text")).as[RawDoc]
    val pre = p.preprocess(raw.repartition(32)).cache(); pre.count()
    val preHalf = p.preprocess(raw.filter(col("filePath").contains("doc_1"))
      .repartition(32)).cache(); preHalf.count()
    timedN("chunk.count full") { p.chunk(pre, "r").count() }
    timedN("enrich.count full") { p.enrichAndEmbed(p.chunk(pre, "r")).count() }
    timedN("enrich.count ~quarter") { p.enrichAndEmbed(p.chunk(preHalf, "r")).count() }
    timedN("enrich.toDF.count full") { p.enrichAndEmbed(p.chunk(pre, "r")).toDF().count() }

    // same per-doc logic, no Spark: 1 thread vs 32 threads
    def enrichLocal(ts: Seq[String]): Unit = ts.foreach { t =>
      llm.complete(s"Summarize this text code section:\n${t.take(2000)}")
      llm.complete(s"Give a title for:\n${t.take(500)}")
      llm.complete(s"Give 10 keywords for:\n${t.take(2000)}")
      IngestPipeline.extractImports(t, "python")
      IngestPipeline.extractSymbol(t, "python")
      IngestPipeline.extractTopics(t)
      emb.embed(t)
    }
    timedN("local enrich 1 thread") { enrichLocal(texts.toSeq) }
    timedN("local enrich 32 threads") {
      val groups = texts.grouped(math.max(1, texts.length / 32)).toSeq
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      try {
        import scala.jdk.CollectionConverters._
        pool.invokeAll(groups.map(g =>
          new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = enrichLocal(g.toSeq)
          }).asJava).asScala.foreach(_.get())
      } finally pool.shutdown()
    }
    spark.stop()
  }
}
