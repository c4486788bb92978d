package graft.ingest

import graft.llm.{Embedder, Llm}
import graft.model.{IngestRun, Node, RawDoc}
import graft.operators.{Chunker, FileFilters, LanguageMap, Notebook}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The ingest job (SURVEY §3.2), Spark-first: six declarative stages over
  * `Dataset[RawDoc]` → five-scope `Dataset[Node]` corpus.
  *
  *  1. preprocess — F1 filter, notebook transform (S4/F2-F4/P2/P3), P1
  *     language, A4 component-kind (one tiny per-repo agg, broadcast back)
  *  2. chunk — C1-C3 as a flatMap generator (no shuffle)
  *  3. enrich — L1-L3 summaries/titles/keywords + real topics/imports/
  *     symbol extraction (SURVEY §7.7: the reference declares these edge
  *     fields but never populates them) via mapPartitions over the Llm
  *  4. rollups — A1-A3/A7 (file/module/repo) each one hash-agg with
  *     ordered concat; L7-L9 summaries; catalog (L4-L6)
  *  5. embed — L10 via mapPartitions over the Embedder (batched)
  *  6. sink — S5 parquet partitioned by scope; S6 audit row
  *
  * Scale: the only shuffles are the three rollup aggregations, each keyed
  * by its natural group (filePath/module/repo) with everything else
  * map-side. LLM/embedding stages are partition-parallel with bounded
  * batch size, which is where the wall-clock goes in production — the
  * relational skeleton adds nothing to it.
  */
class IngestPipeline(
    llm: Llm,
    embedder: Embedder,
    collection: String = "default",
    batchSize: Int = 128,
    /** C2: declaration-boundary structural chunking
      * ([[graft.operators.StructuralChunker]]). Default TRUE — the
      * reference's default splitter IS its AST path
      * (`code_pipeline.py:14-54`); false selects the fixed line windows
      * (`langauge_detector.py:93-136` params), kept as the documented
      * fallback for corpora where the structural scan is untrustworthy. */
    structuralChunking: Boolean = true) extends Serializable {

  import IngestPipeline._

  // ---- stage 1: preprocess ----

  def preprocess(raw: Dataset[RawDoc]): DataFrame = {
    val spark = raw.sparkSession
    val kept = raw.toDF()
      .filter(FileFilters.keepFile(col("filePath")))
    // probe for notebooks first (filePath-only scan, limit 1): when a repo
    // set has none — the common case — the whole from_json/HOF notebook
    // expression tree stays out of the plan, which otherwise dominates the
    // preprocess stage's analysis+codegen cost
    val hasNotebooks = !kept
      .filter(FileFilters.ext(col("filePath")) === "ipynb")
      .select("filePath").limit(1).isEmpty
    val withNb =
      if (!hasNotebooks)
        kept
          .withColumn("language", FileFilters.language(col("filePath")))
      else kept
        .withColumn("isNotebook", FileFilters.ext(col("filePath")) === "ipynb")
        .withColumn("nb", when(col("isNotebook"), Notebook.transformNotebook(col("text"))))
        .withColumn("language",
          when(col("isNotebook"), col("nb.language"))
            .otherwise(FileFilters.language(col("filePath"))))
        .withColumn("text", when(col("isNotebook"), col("nb.text")).otherwise(col("text")))
        .drop("nb", "isNotebook")
    // A4: component kind per repo — tiny aggregate, broadcast back
    val kinds = withNb.groupBy(col("namespace"), col("repo"))
      .agg(
        (max(col("filePath").endsWith(".ipynb").cast("int")) === 1).as("hasNotebook"),
        (max((FileFilters.baseName(col("filePath"))
          .isin("pyproject.toml", "package.json", "pom.xml", "build.gradle",
            "go.mod", "cargo.toml", "build.sbt") ||
          col("filePath").rlike("(?i)openapi|swagger")).cast("int")) === 1).as("hasManifest"))
      .withColumn("componentKind",
        when(col("hasNotebook") && !col("hasManifest"), "standalone").otherwise("service"))
      .select(col("namespace").as("ns2"), col("repo").as("repo2"), col("componentKind"))
    withNb.join(broadcast(kinds),
      col("namespace") === col("ns2") && col("repo") === col("repo2"))
      .drop("ns2", "repo2")
      .withColumn("isStandalone", col("componentKind") === "standalone")
  }

  // ---- stage 2: chunk (C1 dispatch) ----

  def chunk(pre: DataFrame, runId: String): Dataset[Node] = {
    val spark = pre.sparkSession
    import spark.implicits._
    val coll = collection
    val structural = structuralChunking
    pre.select("namespace", "repo", "branch", "filePath", "language", "text",
      "componentKind", "isStandalone")
      .as[(String, String, String, String, String, String, String, Boolean)]
      .flatMap { case (ns, repo, branch, path, lang, text, kind, standalone) =>
        val cs =
          if (structural) graft.operators.StructuralChunker.chunk(text, lang)
          else Chunker.chunkByLanguage(text, lang)
        cs.zipWithIndex.map { case (c, i) =>
          val n = Node.empty.copy(
            scope = "chunk", docType = "code", text = c.text,
            namespace = ns, repo = repo, branch = branch,
            collection = coll, componentKind = kind, isStandalone = standalone,
            ingestRunId = runId,
            module = topDirectory(path), filePath = path, language = lang,
            meta = Map("chunk_index" -> i.toString,
              "start_line" -> c.startLine.toString))
          n.copy(rowId = nodeId(n)) // id assigned in the same narrow stage
        }
      }
  }

  // ---- stage 3: enrich (L1-L3 + topics/imports/symbol) ----

  def enrich(nodes: Dataset[Node]): Dataset[Node] = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val l = llm
    val bs = batchSize
    nodes.mapPartitions { it =>
      it.grouped(bs).flatMap(enrichBatch(l, _))
    }
  }

  private def enrichBatch(l: Llm, batch: Seq[Node]): Seq[Node] = {
    val summaries = l.completeBatch(batch.map(n =>
      s"Summarize this ${n.language} code section:\n${n.text.take(2000)}"))
    val titles = l.completeBatch(batch.map(n =>
      s"Give a title for:\n${n.text.take(500)}"))
    val keywords = l.completeBatch(batch.map(n =>
      s"Give 10 keywords for:\n${n.text.take(2000)}"))
    batch.lazyZip(summaries).lazyZip(titles).lazyZip(keywords).map {
      (n, s, t, k) =>
        n.copy(
          summary = s, title = t,
          keywords = k.split(",\\s*").toSeq.filter(_.nonEmpty).take(10),
          imports = extractImports(n.text, n.language),
          symbol = extractSymbol(n.text, n.language),
          topics = extractTopics(n.text))
    }.toSeq
  }

  /** Fused enrich+embed: one mapPartitions stage, one encoder round-trip.
    * The separate [[enrich]]/[[embed]] stages stay for composability, but
    * the full pipeline uses this — at any scale the per-stage
    * serialization of the wide Node row (embedding + maps) is pure
    * overhead when the stages are always adjacent. */
  def enrichAndEmbed(nodes: Dataset[Node]): Dataset[Node] = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val l = llm
    val e = embedder
    val bs = batchSize
    nodes.mapPartitions { it =>
      it.grouped(bs).flatMap { batch =>
        val enriched = enrichBatch(l, batch)
        val vecs = e.embedBatch(enriched.map(_.text))
        enriched.zip(vecs).map { case (n, v) => n.copy(embedding = v) }
      }
    }
  }

  // ---- stage 4: rollups (A1-A3 + A7, L7-L9) ----

  private def rollup(
      nodes: Dataset[Node],
      groupCols: Seq[String],
      scope: String,
      docType: String,
      maxChars: Int,
      summaryPrompt: String,
      maxItems: Int = Int.MaxValue): Dataset[Node] = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val l = llm
    val coll = collection
    val grouped = nodes.toDF()
      .withColumn("ord", element_at(col("meta"), "chunk_index").cast("int"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        // branch/kind/run-id are constant within any rollup group (same
        // repo); language varies across a module's files, so take min for
        // cross-partitioning determinism (first() depends on task order)
        first(col("branch")).as("branch"),
        first(col("componentKind")).as("componentKind"),
        first(col("isStandalone")).as("isStandalone"),
        first(col("ingestRunId")).as("ingestRunId"),
        min(col("language")).as("language"),
        substring(array_join(transform(
          slice(array_sort(collect_list(struct(col("ord"), col("filePath"), col("text")))),
            1, maxItems),
          x => x.getField("text")), "\n\n"), 1, maxChars).as("rollupText"),
        array_sort(collect_list(col("rowId"))).as("rollupOf"),
        count(lit(1)).cast("int").as("rollupCount"))
    // higher rollups don't group on module/filePath — fill for the encoder
    val withAll = Seq("module", "filePath").foldLeft(grouped) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast("string"))
    }
    val e = embedder
    withAll.as[RollupRow].mapPartitions { it =>
      it.grouped(bsize).flatMap { batch =>
        val sums = l.completeBatch(batch.map(r => s"$summaryPrompt\n${r.rollupText}"))
        val nodes = batch.zip(sums).map { case (r, s) =>
          val n = Node.empty.copy(
            scope = scope, docType = docType, text = s,
            namespace = r.namespace, repo = r.repo, branch = r.branch,
            collection = coll, componentKind = r.componentKind,
            isStandalone = r.isStandalone, ingestRunId = r.ingestRunId,
            module = r.module.getOrElse(""), filePath = r.filePath.getOrElse(""),
            language = r.language, summary = s,
            rollupOf = r.rollupOf, rollupCount = r.rollupCount,
            meta = Map("rollup_count" -> r.rollupCount.toString))
          n.copy(rowId = nodeId(n))
        }
        // L-summary + L10 embed in the same stage — no extra encoder pass
        val vecs = e.embedBatch(nodes.map(_.text))
        nodes.zip(vecs).map { case (n, v) => n.copy(embedding = v) }
      }
    }
  }

  private val bsize = batchSize

  /** A1+L7: file nodes from chunks (≤25k chars concat). */
  def fileRollup(chunks: Dataset[Node]): Dataset[Node] =
    rollup(chunks.filter(_.filePath.nonEmpty),
      Seq("namespace", "repo", "module", "filePath"),
      "file", "file_summary", 25000,
      "Summarize this file in 200-300 words:")

  /** A2+L8: module nodes from file nodes (module = top path segment,
    * ≤40 files per module — reference max_files_per_module,
    * scope_utils.py:22-27). */
  def moduleRollup(files: Dataset[Node]): Dataset[Node] =
    rollup(files, Seq("namespace", "repo", "module"),
      "module", "module_summary", 25000,
      "Summarize this module from its file summaries:", maxItems = 40)

  /** A3+L9: one repo-overview node per repo (≤10 module summaries —
    * reference hierarchy_summary_service.py:161-166). */
  def repoRollup(modules: Dataset[Node]): Dataset[Node] =
    rollup(modules, Seq("namespace", "repo"),
      "repo", "repo_summary", 25000,
      "Write a repository overview from these module summaries:", maxItems = 10)

  /** Catalog (L4-L6): README-driven if the README judges GOOD, else from
    * code summaries; one catalog node per repo with the zero run id
    * (reference ingest_controller.py:290). */
  def catalog(pre: DataFrame, chunks: Dataset[Node]): Dataset[Node] = {
    val spark = pre.sparkSession
    import spark.implicits._
    val l = llm
    val emb = embedder
    val coll = collection
    // collected lists are sorted before concat — collect_list order is
    // partition-order dependent, and catalog text must be reproducible.
    // README text (L4) and key-file samples (L5, reference
    // catalog_builder.py:34-80: entry points and manifests, ≤5 files ×
    // 500-char samples) both aggregate `pre` by (namespace, repo), so they
    // share ONE shuffle: collect_list skips the nulls `when` produces for
    // non-matching rows, which is the conditional-aggregation idiom that
    // replaces two filtered aggs + an extra join.
    val isReadme = FileFilters.baseName(col("filePath")).startsWith("readme")
    val keyPatterns = Seq("main.", "index.", "app.", "__init__.py", "server.",
      "api.", "package.json", "pyproject.toml", "pom.xml", "dockerfile",
      "requirements.txt", "cargo.toml")
    val isKeyFile = keyPatterns
      .map(p => lower(col("filePath")).contains(p)).reduce(_ || _)
    val preAggs = pre
      .groupBy(col("namespace"), col("repo"))
      .agg(
        substring(array_join(transform(
          array_sort(collect_list(when(isReadme, struct(col("filePath"), col("text"))))),
          x => x.getField("text")), "\n\n"), 1, 5000).as("readme"),
        array_join(slice(transform(
          array_sort(collect_list(when(isKeyFile, struct(col("filePath").as("p"),
            concat(lit("File: "), col("filePath"), lit("\n"),
              substring(col("text"), 1, 500)).as("s"))))),
          x => x.getField("s")), 1, 5), "\n\n---\n\n").as("keyFiles"))
    val techStack = chunks.toDF()
      .groupBy(col("namespace").as("ns2"), col("repo").as("repo2"))
      .agg(array_sort(collect_set(col("language"))).as("languages"),
        substring(array_join(slice(transform(
          array_sort(collect_list(struct(col("filePath"), col("rowId"), col("summary")))),
          x => x.getField("summary")), 1, 10), "\n"), 1, 5000)
          .as("codeSummaries"))

    preAggs.join(techStack,
      col("namespace") === col("ns2") && col("repo") === col("repo2"), "full_outer")
      .select(
        coalesce(col("namespace"), col("ns2")).as("namespace"),
        coalesce(col("repo"), col("repo2")).as("repo"),
        coalesce(col("readme"), lit("")).as("readme"),
        coalesce(col("languages"), array().cast("array<string>")).as("languages"),
        coalesce(col("codeSummaries"), lit("")).as("codeSummaries"),
        coalesce(col("keyFiles"), lit("")).as("keyFiles"))
      .as[(String, String, String, Seq[String], String, String)]
      .mapPartitions { it =>
        it.map { case (ns, repo, readme, langs, codeSums, keyF) =>
          val judged = l.complete(s"Is this a GOOD or BAD readme?\n${readme.take(1000)}")
          val text =
            if (judged.contains("GOOD"))
              l.complete(s"Write a catalog entry for repo $repo.\nTech: ${langs.mkString(",")}\n$readme")
            else if (keyF.nonEmpty)
              // L5: entry-point/manifest samples beat code summaries when
              // the readme is a stub (catalog_builder.py:38-52)
              l.complete(s"Write a catalog entry for repo $repo from key files.\nTech: ${langs.mkString(",")}\n$keyF")
            else
              l.complete(s"Write a catalog entry for repo $repo from code summaries.\nTech: ${langs.mkString(",")}\n$codeSums")
          val n = Node.empty.copy(
            scope = "catalog", docType = "catalog", text = text,
            namespace = ns, repo = repo, collection = coll,
            ingestRunId = ZeroRunId, summary = text.take(500),
            topics = langs,
            meta = Map("tech_stack" -> langs.mkString(",")))
          val withId = n.copy(rowId = nodeId(n))
          withId.copy(embedding = emb.embed(withId.text))
        }
      }
  }

  // ---- stage 5: embed (L10) ----

  def embed(nodes: Dataset[Node]): Dataset[Node] = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val e = embedder
    val bs = batchSize
    nodes.mapPartitions { it =>
      it.grouped(bs).flatMap { batch =>
        val vecs = e.embedBatch(batch.map(_.text))
        batch.zip(vecs).map { case (n, v) => n.copy(embedding = v) }
      }
    }
  }

  // ---- full run ----

  /** End-to-end: raw files → all five scopes, embedded. Each scope's
    * enrich/summarize/embed work is fused into one mapPartitions stage, so
    * the pipeline is: scan → chunk+enrich+embed (narrow) → one shuffle per
    * rollup level keyed by its group → catalog join. */
  /** Local inputs often arrive as a few unsplittable files (a single
    * row-group parquet, one giant repo checkout): left alone, the whole
    * narrow enrich chain — three LLM calls plus an embedding per chunk —
    * runs at the INPUT's parallelism, not the cluster's. The raw-text
    * shuffle is trivial next to that compute, so spread under-parallel
    * inputs before chunking; a no-op for real multi-file corpora. Applied
    * here (not at the generic table reader) on purpose: for plain
    * relational scans the map-side partial agg already reduces data before
    * any shuffle, and force-spreading those serializes whole tables
    * through an exchange for nothing — measured 2.5× WORSE at sf0.1. */
  private def spreadInput(raw: Dataset[RawDoc]): Dataset[RawDoc] = {
    val target = raw.sparkSession.sparkContext.defaultParallelism
    if (raw.rdd.getNumPartitions * 2 < target) raw.repartition(target) else raw
  }

  def buildCorpus(raw: Dataset[RawDoc], runId: String): Dataset[Node] = {
    // Each cached level is read by SEVERAL union branches (chunks by the
    // union, fileRollup and catalog; pre by chunk, readmes and key-files).
    // Caching alone does not serialize that: within the union's one action
    // the branches race, and concurrent tasks each compute the shared
    // partition before the first writes the cache block ("Block rdd_N
    // already exists" warnings) — the LLM enrich + embed work ran up to 3×.
    // Forcing each level in dependency order fills every cache exactly
    // once; the extra count() jobs are milliseconds next to the duplicated
    // enrichment they remove.
    val pre = preprocess(spreadInput(raw)).cache()
    pre.count()
    val chunks = enrichAndEmbed(chunk(pre, runId)).cache()
    chunks.count()
    // the rollup levels shrink drastically (files ≪ chunks, modules ≪
    // files), so caching them is a few rows per repo, not a memory risk
    val files = fileRollup(chunks).cache()
    files.count()
    val modules = moduleRollup(files).cache()
    modules.count()
    val repos = repoRollup(modules)
    val cats = catalog(pre, chunks)
    chunks.unionByName(files).unionByName(modules).unionByName(repos)
      .unionByName(cats)
  }

  /** [[buildCorpus]] + [[write]] with per-stage metrics (reference
    * stage_timer, ingest_controller.py:114-152): each stage runs under a
    * tagged job group and forces its (cached) output, so wall time and
    * executor task metrics attribute cleanly. Costs a few extra counts of
    * the small rollup levels versus the lazy build — the price of stage
    * boundaries, paid only on explicitly metered runs. Returns the audit
    * row and the per-stage metric rows for the caller's metrics sink. */
  def runWithMetrics(
      raw: Dataset[RawDoc],
      path: String,
      runId: String): (IngestRun, Seq[StageMetric]) = {
    val spark = raw.sparkSession
    val metrics = new IngestMetrics(spark, runId)
    try {
      val pre = metrics.stage("preprocess") {
        val d = preprocess(spreadInput(raw)).cache(); d.count(); d
      }
      val chunks = metrics.stage("chunk_enrich_embed") {
        val d = enrichAndEmbed(chunk(pre, runId)).cache(); d.count(); d
      }
      val files = metrics.stage("file_rollup") {
        val d = fileRollup(chunks).cache(); d.count(); d
      }
      val modules = metrics.stage("module_rollup") {
        val d = moduleRollup(files).cache(); d.count(); d
      }
      val repos = metrics.stage("repo_rollup") {
        val d = repoRollup(modules).cache(); d.count(); d
      }
      val cats = metrics.stage("catalog") {
        val d = catalog(pre, chunks).cache(); d.count(); d
      }
      val all = chunks.unionByName(files).unionByName(modules)
        .unionByName(repos).unionByName(cats)
      // store write and audit are separate metric stages, matching the
      // reference's vector_write / audit_and_clean levels
      val sink = new graft.sources.ParquetCorpusSink(path)
      val started = new java.sql.Timestamp(System.currentTimeMillis())
      metrics.stage("write") { sink.write(all, runId) }
      val run = metrics.stage("audit") { auditRun(all, sink, path, runId, started) }
      Seq(pre, chunks.toDF, files.toDF, modules.toDF, repos.toDF, cats.toDF)
        .foreach(_.unpersist(blocking = false))
      metrics.awaitDrain()
      (run, metrics.snapshot)
    } finally metrics.close()
  }

  /** S5 sink: one store partitioned by scope (the Spark twin of the five
    * Cassandra tables) + S6 audit row. Storage goes through the
    * [[graft.sources.CorpusSink]] trait — swap in a
    * [[graft.sources.ConnectorCorpusSink]] for a connector-backed store;
    * the pipeline code is identical either way. */
  def write(nodes: Dataset[Node], path: String, runId: String): IngestRun =
    write(nodes, new graft.sources.ParquetCorpusSink(path), path, runId)

  /** [[write]] with an explicit sink (the audit row still lands next to
    * `path` — audit is engine bookkeeping, not store payload). */
  def write(nodes: Dataset[Node], sink: graft.sources.CorpusSink,
      path: String, runId: String): IngestRun = {
    val started = new java.sql.Timestamp(System.currentTimeMillis())
    sink.write(nodes, runId)
    auditRun(nodes, sink, path, runId, started)
  }

  /** S6: the audit row, appended next to the store. Chunk count is a
    * read-back validation when the sink IS the parquet store at `path`;
    * connector sinks audit from the source node set instead. */
  def auditRun(nodes: Dataset[Node], sink: graft.sources.CorpusSink,
      path: String, runId: String, started: java.sql.Timestamp): IngestRun = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val chunkCount = sink match {
      case _: graft.sources.ParquetCorpusSink =>
        spark.read.parquet(path).filter(col("scope") === "chunk").count()
      case _ => nodes.filter(col("scope") === "chunk").count()
    }
    val finished = new java.sql.Timestamp(System.currentTimeMillis())
    val run = IngestRun(runId, "", "", "", collection, "", started, finished, chunkCount)
    Seq(run).toDS().write.mode(SaveMode.Append).parquet(s"$path-ingest_runs")
    run
  }
}

object IngestPipeline {
  val ZeroRunId = "00000000-0000-0000-0000-000000000000"

  /** P5: spillover-metadata sanitize to string→string (reference
    * vector_write_service.py:45-98). The ~20 known keys live as typed
    * columns, so this applies only to the dynamic `meta` tail: scalars
    * stringified, sequences comma-joined, maps JSON-encoded, nulls/None
    * dropped. */
  def sanitizeMeta(values: Map[String, Any]): Map[String, String] =
    values.collect {
      case (k, v) if v != null && v != None => k -> (v match {
        case s: String => s
        case seq: Seq[_] => seq.mkString(",")
        case arr: Array[_] => arr.mkString(",")
        case m: Map[_, _] =>
          m.map { case (mk, mv) => s""""$mk":"$mv"""" }.mkString("{", ",", "}")
        case Some(x) => x.toString
        case other => other.toString
      })
    }

  private val sha1Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-1")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  /** P7: stable row id — sha1 over the identity fields (reference
    * vector_write_service.py:186-194). Thread-local digest + direct hex:
    * this runs once per node on every executor thread, and
    * getInstance + per-byte format was measurable GC pressure. */
  def nodeId(n: Node): String = {
    val key = Seq(n.scope, n.namespace, n.repo, n.module, n.filePath,
      n.meta.getOrElse("chunk_index", ""), n.meta.getOrElse("start_line", ""))
      .mkString("|")
    val md = sha1Digest.get()
    md.reset()
    val bytes = md.digest(key.getBytes("UTF-8"))
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = hexChars((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** A2 key: module = first path segment (reference scope_utils.py:8-11). */
  def topDirectory(path: String): String = {
    val ix = path.indexOf('/')
    if (ix < 0) "" else path.substring(0, ix)
  }

  /** Import extraction per language (SURVEY §7.7 — populate the declared
    * graph-edge fields for real). */
  def extractImports(text: String, language: String): Seq[String] = {
    val lines = text.split("\n").iterator.map(_.trim)
    val pats: Seq[scala.util.matching.Regex] = language match {
      case "python" => Seq(
        "^import\\s+([\\w.]+)".r, "^from\\s+([\\w.]+)\\s+import".r)
      case "javascript" | "typescript" => Seq(
        "^import\\b.*?from\\s+['\"]([^'\"]+)['\"]".r,
        "require\\(['\"]([^'\"]+)['\"]\\)".r)
      case "java" | "scala" | "kotlin" => Seq("^import\\s+([\\w.{}, ]+)".r)
      case "go" => Seq("^import\\s+\"([^\"]+)\"".r, "^\\t\"([^\"]+)\"".r)
      case "rust" => Seq("^use\\s+([\\w:]+)".r)
      case _ => Seq.empty
    }
    if (pats.isEmpty) Seq.empty
    else lines.flatMap(l => pats.flatMap(_.findFirstMatchIn(l).map(_.group(1).trim)))
      .distinct.take(50).toSeq
  }

  /** First declared symbol in the chunk (def/class/function/object...). */
  def extractSymbol(text: String, language: String): String = {
    val pat = ("(?m)^\\s*(?:export\\s+)?(?:public\\s+|private\\s+)?" +
      "(?:def|class|function|object|trait|interface|struct|fn|func)\\s+" +
      "([A-Za-z_][A-Za-z0-9_]*)").r
    pat.findFirstMatchIn(text).map(_.group(1)).getOrElse("")
  }

  /** Topic extraction: frequent identifier-ish tokens (deterministic).
    * Single-pass counting loop — byte-identical to the groupBy form it
    * replaces, without the per-token garbage (this runs per chunk on
    * every executor thread). */
  def extractTopics(text: String): Seq[String] = {
    val counts = new java.util.HashMap[String, Int]()
    val n = text.length
    var i = 0
    val sb = new java.lang.StringBuilder(24)
    var hasNonDigit = false
    while (i <= n) {
      val c = if (i < n) Character.toLowerCase(text.charAt(i)) else ' '
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
      if (isTok) {
        sb.append(c)
        if (!(c >= '0' && c <= '9')) hasNonDigit = true
      } else {
        if (sb.length() > 4 && hasNonDigit)
          counts.put(sb.toString, counts.getOrDefault(sb.toString, 0) + 1)
        sb.setLength(0)
        hasNonDigit = false
      }
      i += 1
    }
    val arr = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > 1) arr += ((e.getKey, e.getValue))
    }
    arr.sortInPlaceBy { case (t, c) => (-c, t) }
    arr.iterator.take(8).map(_._1).toSeq
  }
}

/** Typed view of the rollup aggregation output. */
case class RollupRow(
    namespace: String,
    repo: String,
    module: Option[String],
    filePath: Option[String],
    branch: String,
    componentKind: String,
    isStandalone: Boolean,
    ingestRunId: String,
    language: String,
    rollupText: String,
    rollupOf: Seq[String],
    rollupCount: Int)
