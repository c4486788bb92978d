package graft.sources

import graft.model.Node
import org.apache.spark.sql.Dataset

/** S5 sink abstraction (VERDICT r3 item 6): the corpus write path behind a
  * trait, so a connector-backed store (Cassandra, a vector DB) and the
  * parquet layout are interchangeable implementations of the same
  * contract. The ingest pipeline writes through [[CorpusSink]]; which
  * store receives the nodes is deployment config, not pipeline code.
  */
trait CorpusSink extends Serializable {
  /** Write one ingest run's nodes (all scopes). Must be idempotent per
    * (scope, id): re-running a write upserts, never duplicates. */
  def write(nodes: Dataset[Node], runId: String): Unit
}

/** The parquet implementation: one scope-partitioned dataset
  * ([[CorpusStore.write]] — the engine's default store). */
class ParquetCorpusSink(path: String) extends CorpusSink {
  override def write(nodes: Dataset[Node], runId: String): Unit =
    CorpusStore.write(nodes, path)
}

/** One upsert batch delivered to a connector: stable id, content, vector,
  * string-only metadata (the MAP<TEXT,TEXT> shape). */
case class SinkDoc(
    id: String,
    text: String,
    embedding: Array[Float],
    meta: Map[String, String])

/** What a store driver implements: an idempotent upsert of ≤ batchSize
  * docs into one scope's table. Runs ON THE EXECUTORS (one call stream
  * per partition), so implementations hold their connections in
  * lazy/transient fields — the standard Spark connector shape. */
trait ScopeBatchWriter extends Serializable {
  def upsert(scope: String, table: String, batch: Seq[SinkDoc]): Unit
}

/** Retry decorator for a [[ScopeBatchWriter]]: bounded attempts with
  * capped exponential backoff around each batch upsert. Safe BECAUSE the
  * sink contract is idempotent per (scope, id) — a retried batch that
  * half-landed upserts the same rows again; nothing duplicates. This is
  * the transient-fault layer a real connector needs (coordinator
  * failover, timeouts); the terminal rethrow after `maxAttempts` lets
  * Spark's own task retry take over with a fresh partition iterator. */
class RetryingScopeBatchWriter(
    inner: ScopeBatchWriter,
    maxAttempts: Int = 3,
    baseBackoffMs: Long = 100,
    maxBackoffMs: Long = 2000) extends ScopeBatchWriter {
  require(maxAttempts >= 1)
  override def upsert(scope: String, table: String, batch: Seq[SinkDoc]): Unit = {
    var attempt = 1
    var done = false
    while (!done) {
      try { inner.upsert(scope, table, batch); done = true }
      catch {
        case scala.util.control.NonFatal(_) if attempt < maxAttempts =>
          val backoff = math.min(maxBackoffMs,
            baseBackoffMs * (1L << math.min(attempt - 1, 20)))
          Thread.sleep(backoff)
          attempt += 1
      }
    }
  }
}

/** Where applied batch tokens are durably recorded. A real connector
  * backs this with the store itself (a conditional insert / LWT into a
  * receipts table, so the receipt commits in the same consistency domain
  * as the data); [[InMemoryTokenLedger]] is the local-mode twin. */
trait TokenLedger extends Serializable {
  /** True iff `token`'s batch already landed durably. */
  def committed(token: String): Boolean
  /** Record `token` as applied — called only AFTER the write succeeded. */
  def commit(token: String): Unit
}

/** JVM-static ledger for local mode and tests (executors share the JVM;
  * the registry survives task re-serialization like a store would). */
class InMemoryTokenLedger(name: String) extends TokenLedger {
  override def committed(token: String): Boolean =
    InMemoryTokenLedger.registry(name).contains(token)
  override def commit(token: String): Unit =
    InMemoryTokenLedger.registry(name).put(token, true)
}

object InMemoryTokenLedger {
  private val reg = scala.collection.concurrent.TrieMap
    .empty[String, scala.collection.concurrent.TrieMap[String, Boolean]]
  private def registry(name: String) =
    reg.getOrElseUpdate(name, scala.collection.concurrent.TrieMap.empty)
  def reset(name: String): Unit = reg.remove(name)
}

/** Idempotency-token decorator (NOTES round-5 candidate 3): makes batch
  * delivery effectively-once for REPLAYS even when the underlying store
  * is not naturally idempotent (append-only stores, stores with write
  * side-effects). The token is content-derived — sha1 over (scope, table,
  * sorted doc ids + content fingerprints) — so any re-delivery of the
  * same logical batch (Spark task retry after a lost executor, a whole
  * job re-run, a speculative duplicate finishing late) maps to the same
  * token and is skipped once the ledger holds its receipt.
  *
  * Ordering contract: the receipt commits only AFTER the inner write
  * succeeded, so a batch that failed mid-write is NOT marked applied and
  * the retry writes it again (at-least-once under failure, exactly-once
  * under replay). Compose retries INSIDE the dedup layer —
  * `new DedupingScopeBatchWriter(new RetryingScopeBatchWriter(store), l)`
  * — so backoff attempts of a failed write are not mistaken for replays.
  * Two CONCURRENT duplicates of an uncommitted batch can both write
  * (check and commit are not one atomic step here); that is the same
  * at-least-once window every receipt pattern has, closed in production
  * by making [[TokenLedger.commit]] a conditional insert, and harmless
  * against an idempotent-upsert store. */
class DedupingScopeBatchWriter(
    inner: ScopeBatchWriter,
    ledger: TokenLedger) extends ScopeBatchWriter {
  override def upsert(scope: String, table: String, batch: Seq[SinkDoc]): Unit = {
    val token = DedupingScopeBatchWriter.token(scope, table, batch)
    if (!ledger.committed(token)) {
      inner.upsert(scope, table, batch)
      ledger.commit(token)
    }
  }
}

object DedupingScopeBatchWriter {
  /** Deterministic batch token: independent of in-batch order (ids sort
    * the digest input) and of JVM identity (content bytes only). */
  def token(scope: String, table: String, batch: Seq[SinkDoc]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(scope.getBytes("UTF-8")); md.update(0: Byte)
    md.update(table.getBytes("UTF-8")); md.update(0: Byte)
    batch.sortBy(_.id).foreach { d =>
      md.update(d.id.getBytes("UTF-8")); md.update(0: Byte)
      md.update(d.text.getBytes("UTF-8")); md.update(0: Byte)
      d.embedding.foreach(f =>
        md.update(java.nio.ByteBuffer.allocate(4).putFloat(f).array()))
      d.meta.toSeq.sorted.foreach { case (k, v) =>
        md.update(k.getBytes("UTF-8")); md.update(0: Byte)
        md.update(v.getBytes("UTF-8")); md.update(0: Byte)
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }
}

/** Connector-shaped sink implementing the reference write service's
  * batching semantics (vector_write_service.py:100-161):
  *
  *  - scopes write in the fixed catalog→repo→module→file→chunk order to
  *    per-scope tables (:120-133, `_TABLE_BY_SCOPE` :37-43);
  *  - metadata is ALLOW-LISTED per scope (`_ALLOW_FIELDS_BY_SCOPE`
  *    :28-35 — traversal fields only, "keeps SAI indexes tight") and
  *    string-valued (`_sanitize_doc_metadata` :45-98);
  *  - list fields (topics/imports/labels) are SHREDDED into per-value
  *    keys so edge traversal is an index lookup (:153, the
  *    ShreddingTransformer twin): `topics` → `topics:<v> = "1"` entries
  *    plus the comma-joined scalar;
  *  - ids are the stable content-derived node ids (:173-196 — the same
  *    sha1 recipe as [[graft.ingest.IngestPipeline.nodeId]]), so retried
  *    writes upsert idempotently;
  *  - docs flow in batches of ≤ `batchSize` (=128, :111 `_batched`).
  *
  * Scale shape: the per-scope projection is a column program; only
  * `foreachPartition` touches executor-side state, and each partition
  * streams its rows in bounded batches — no driver collect, no shuffle
  * beyond what the caller's partitioning already did.
  */
class ConnectorCorpusSink(
    writer: ScopeBatchWriter,
    batchSize: Int = 128,
    tableByScope: Map[String, String] = ConnectorCorpusSink.DefaultTables)
  extends CorpusSink {

  import ConnectorCorpusSink._

  override def write(nodes: Dataset[Node], runId: String): Unit = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val w = writer
    val bs = batchSize
    Node.Scopes.foreach { scope =>
      val table = tableByScope(scope)
      val docs = nodes.filter(_.scope == scope)
        .map(n => SinkDoc(n.rowId, n.text, n.embedding, metaFor(scope, n)))
      docs.foreachPartition { (it: Iterator[SinkDoc]) =>
        it.grouped(bs).foreach(b => w.upsert(scope, table, b))
      }
    }
  }
}

object ConnectorCorpusSink {

  /** Per-scope table names (vector_write_service.py:37-43; chunk keeps
    * the legacy unsuffixed name). */
  val DefaultTables: Map[String, String] = Map(
    "catalog" -> "embeddings_catalog",
    "repo" -> "embeddings_repo",
    "module" -> "embeddings_module",
    "file" -> "embeddings_file",
    "chunk" -> "embeddings")

  /** Traversal-focused metadata allow-list per scope
    * (vector_write_service.py:28-35). `labels` has no typed Node column —
    * it rides in the dynamic meta tail when present. */
  val AllowFields: Map[String, Seq[String]] = Map(
    "catalog" -> Seq("namespace", "repo", "owner", "language", "topics",
      "labels", "component_kind"),
    "repo" -> Seq("namespace", "repo", "owner", "language", "topics", "labels"),
    "module" -> Seq("namespace", "repo", "module", "language", "topics",
      "imports", "labels"),
    "file" -> Seq("namespace", "repo", "module", "file_path", "language",
      "topics", "imports", "labels"),
    "chunk" -> Seq("namespace", "repo", "module", "file_path", "symbol",
      "language", "topics", "imports"))

  private val ListFields = Set("topics", "imports", "labels")

  /** Allow-listed, string-only, shredded metadata for one node. */
  def metaFor(scope: String, n: Node): Map[String, String] = {
    val typed: Map[String, Option[String]] = Map(
      "namespace" -> someNonEmpty(n.namespace),
      "repo" -> someNonEmpty(n.repo),
      "module" -> someNonEmpty(n.module),
      "file_path" -> someNonEmpty(n.filePath),
      "language" -> someNonEmpty(n.language),
      "symbol" -> someNonEmpty(n.symbol),
      "component_kind" -> someNonEmpty(n.componentKind),
      "topics" -> seqField(n.topics),
      "imports" -> seqField(n.imports))
    val allowed = AllowFields(scope)
    val scalars = allowed.flatMap { k =>
      typed.get(k).map(k -> _)
        .orElse(n.meta.get(k).map(k -> someNonEmpty(_)))
        .collect { case (key, Some(v)) => key -> v }
    }.toMap
    // shred list values into per-value keys for index-served traversal
    val shredded = allowed.filter(ListFields).flatMap { k =>
      val vals = k match {
        case "topics" => n.topics
        case "imports" => n.imports
        case _ => n.meta.get(k).map(_.split(",").toSeq).getOrElse(Nil)
      }
      vals.filter(_.nonEmpty).map(v => s"$k:$v" -> "1")
    }.toMap
    scalars ++ shredded + ("scope" -> scope)
  }

  private def someNonEmpty(s: String): Option[String] =
    Option(s).filter(_.nonEmpty)
  private def seqField(vs: Seq[String]): Option[String] =
    if (vs.isEmpty) None else Some(vs.mkString(","))
}
