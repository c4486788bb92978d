package graft.model

import java.sql.Timestamp

/** Core records of the engine (SURVEY §1.4, FIXTURES §1-§5).
  *
  * The reference keeps five Cassandra tables with a fixed row layout plus a
  * string-string metadata map (`helm/templates/cassandra-initdb-configmap
  * .yaml:14-102`); here the ~20 known metadata keys are promoted to typed
  * columns (Catalyst prunes and pushes down on them) and only the tail
  * stays in a `meta` map.
  */

/** One repository as enumerated by the repo source (reference S1:
  * `ingest/src/app/services/github_service.py:28-79` — GitHub GraphQL,
  * paginated, fork/archive/private flags carried for filtering). */
case class RepoRef(
    namespace: String,
    name: String,
    defaultBranch: String,
    isFork: Boolean,
    isArchived: Boolean,
    isPrivate: Boolean)

/** One repository file as loaded by the repo reader (reference:
  * `ingest/src/app/services/github_service.py:16-25`). */
case class RawDoc(
    namespace: String,
    repo: String,
    branch: String,
    filePath: String,
    text: String)

/** The engine's node record — one row per catalog/repo/module/file/chunk
  * document (reference row layout: cassandra-initdb-configmap.yaml:14-20;
  * metadata contract: ingest_controller.py:164-189). */
case class Node(
    rowId: String,
    scope: String, // catalog | repo | module | file | chunk
    text: String,
    namespace: String,
    repo: String,
    branch: String,
    collection: String,
    componentKind: String, // service | standalone
    isStandalone: Boolean,
    ingestRunId: String,
    docType: String,
    module: String,
    filePath: String,
    language: String,
    summary: String,
    title: String,
    keywords: Seq[String],
    topics: Seq[String],
    imports: Seq[String],
    symbol: String,
    rollupOf: Seq[String],
    rollupCount: Int,
    meta: Map[String, String],
    embedding: Array[Float])

object Node {
  val EmbeddingDim = 384
  val Scopes: Seq[String] = Seq("catalog", "repo", "module", "file", "chunk")

  def empty: Node = Node(
    rowId = "", scope = "chunk", text = "", namespace = "", repo = "",
    branch = "", collection = "", componentKind = "service",
    isStandalone = false, ingestRunId = "", docType = "", module = "",
    filePath = "", language = "", summary = "", title = "",
    keywords = Nil, topics = Nil, imports = Nil, symbol = "",
    rollupOf = Nil, rollupCount = 0, meta = Map.empty,
    embedding = Array.empty)
}

/** Progress-bus event (reference: `rag_shared/bus.py:12-15`,
  * `worker.py:109-176`). */
case class JobEvent(
    jobId: String,
    event: String, // started | iteration | turn | retrieval | final | error
    ts: Timestamp,
    data: String) // json payload

/** RAG query request (reference: `rag_shared/models.py:6-9`). */
case class QueryRequest(
    query: String,
    topK: Int = 5,
    repoName: Option[String] = None,
    forceLevel: Option[String] = None, // project|package|file|code
    namespace: Option[String] = None)

/** Agent-loop state — the IR of the query pipeline (reference:
  * `agent_graph.py:20-29`). */
case class AgentState(
    query: String,
    scope: String,
    filters: Map[String, String],
    attempt: Int,
    docs: Seq[Retrieved],
    needsMore: Boolean,
    rewrite: Option[String],
    answer: Option[String],
    debug: Seq[String])

/** One retrieved node + its score (scores are first-class here; the
  * reference had to probe metadata for them, `agent_graph.py:44-61`). */
case class Retrieved(
    rowId: String,
    scope: String,
    namespace: String,
    repo: String,
    module: String,
    filePath: String,
    text: String,
    topics: Seq[String],
    score: Double)

/** Audit row (reference: `ingest_controller.py:419-435`). */
case class IngestRun(
    runId: String,
    namespace: String,
    repo: String,
    branch: String,
    collection: String,
    componentKind: String,
    startedAt: Timestamp,
    finishedAt: Timestamp,
    nodeCount: Long)
