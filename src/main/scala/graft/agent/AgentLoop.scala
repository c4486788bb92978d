package graft.agent

import graft.llm.{Embedder, Llm}
import graft.model.{AgentState, QueryRequest, Retrieved}
import graft.retrieval.Retrieval
import org.apache.spark.sql.DataFrame

/** The agentic RAG loop (SURVEY §3.1): plan scope → retrieve → judge →
  * rewrite-or-end (≤3 attempts, stage-down ladder) → synthesize with
  * citations. The loop is inherently sequential per query, so it's a
  * driver-side state machine over [[AgentState]]; each retrieval step is
  * the distributed DataFrame program in [[Retrieval]].
  *
  * Planning and judging are heuristics-first with the Llm trait layered in
  * (deterministic with the stub; reference semantics: agent_graph.py
  * plan_scope :198-239, judge :304-384, rewrite_or_end :386-446,
  * synthesize :448-516).
  */
class AgentLoop(
    llm: Llm,
    embedder: Embedder,
    maxAttempts: Int = 3,
    minSourceNodes: Int = 1) extends Serializable {

  import AgentLoop._

  /** Heuristic scope router: codey queries → chunk scope; overview →
    * catalog; default repo (reference looks_codey agent_graph.py:33-38 +
    * repo-hint regex :40-42). */
  def planScope(req: QueryRequest): (String, Map[String, String]) = {
    val forced = req.forceLevel.flatMap(levelToScope.get)
    val repoHint = RepoHintPattern.findFirstMatchIn(req.query).map(_.group(1))
    val scope = forced.getOrElse {
      if (looksCodey(req.query)) "chunk"
      else if (looksOverview(req.query)) "catalog"
      else "repo"
    }
    val filters = Seq(
      req.namespace.map("namespace" -> _),
      req.repoName.orElse(repoHint).map("repo" -> _)).flatten.toMap
    (scope, filters)
  }

  /** Judge (reference agent_graph.py:304-384): build a source inventory
    * with 200-char previews, ask the Llm for a JSON verdict, parse it
    * leniently; fall back to the heuristic coverage score (hit count ×
    * best score) when the response doesn't parse — the reference's
    * auto-stage-down path on parse failure. */
  def judge(state: AgentState): AgentState = {
    val heuristic =
      if (state.docs.isEmpty) 0.0
      else math.min(1.0, state.docs.length.toDouble / 5.0) *
        math.min(1.0, math.max(0.0, state.docs.map(_.score).max))
    val inventory = state.docs.take(10).zipWithIndex.map { case (d, i) =>
      s"[${i + 1}] ${d.scope} ${d.repo}/${d.filePath} preview: ${d.text.take(200)}"
    }.mkString("\n")
    val response = llm.complete(
      s"""Judge whether these sources cover the question. Respond JSON
         |{"coverage": 0.0-1.0, "needs_more": bool, "rewrite": "..."}.
         |Question: ${state.query}
         |Sources (${state.docs.length}):
         |$inventory""".stripMargin)
    val verdict = AgentLoop.parseJudge(response)
    val coverage = verdict.flatMap(_.coverage).getOrElse(heuristic)
    val needsMore = verdict.flatMap(_.needsMore)
      .getOrElse(coverage < 0.3) || state.docs.length < minSourceNodes
    state.copy(needsMore = needsMore,
      rewrite = verdict.flatMap(_.rewrite).orElse(state.rewrite),
      debug = state.debug :+
        f"judge: coverage=$coverage%.3f needsMore=$needsMore llm=${verdict.isDefined}")
  }

  def stageDown(scope: String): String = scope match {
    case "catalog" => "repo"
    case "repo" => "module"
    case "module" => "file"
    case _ => "chunk"
  }

  /** One full query. */
  def run(corpus: DataFrame, req: QueryRequest): AgentState = {
    val (scope0, filters) = planScope(req)
    var state = AgentState(req.query, scope0, filters, attempt = 1,
      docs = Nil, needsMore = true, rewrite = None, answer = None,
      debug = Seq(s"plan: scope=$scope0 filters=$filters"))
    var done = false
    while (!done) {
      val q = state.rewrite.getOrElse(state.query)
      val docs = Retrieval.retrieve(corpus, embedder, q, state.scope, state.filters)
      // under-retrieval → union an expanded query (T4/T5 semantics)
      val merged =
        if (docs.length < 3) {
          val expanded = Retrieval.retrieve(
            corpus, embedder, expandQuery(q), state.scope, state.filters)
          (docs ++ expanded).distinctBy(_.rowId)
            .sortBy(r => (-r.score, r.rowId)).take(req.topK)
        } else docs.sortBy(r => (-r.score, r.rowId)).take(req.topK)
      // stuck detection (reference agent_graph.py:395-401): identical doc
      // set on consecutive attempts → force file scope instead of the
      // regular ladder step
      val prevIds = state.docs.map(_.rowId).toSet
      state = judge(state.copy(docs = merged))
      val stuck = state.attempt > 1 && prevIds.nonEmpty &&
        state.docs.map(_.rowId).toSet == prevIds
      if (!state.needsMore || state.attempt >= maxAttempts) {
        state = state.copy(answer = Some(synthesize(state)))
        done = true
      } else {
        val nextScope = if (stuck && state.scope != "file") "file"
                        else stageDown(state.scope)
        val rewrite =
          if (state.attempt == 1)
            Some(llm.complete(s"Rewrite this search query to be more specific: ${state.query}"))
          else Some(expandQuery(q))
        state = state.copy(
          scope = nextScope, attempt = state.attempt + 1, rewrite = rewrite,
          debug = state.debug :+ s"retry: scope=$nextScope attempt=${state.attempt + 1}")
      }
    }
    state
  }

  /** Synthesis: ≤5 blocks × 800 chars, `[n]` citations, overview-vs-
    * specific prompt selection (agent_graph.py:448-516). */
  def synthesize(state: AgentState): String = {
    if (state.docs.isEmpty) return "No relevant sources found."
    val blocks = state.docs.take(5).zipWithIndex.map { case (d, i) =>
      s"[${i + 1}] (${d.scope} ${d.repo}/${d.filePath}) ${d.text.take(800)}"
    }
    val style = if (looksOverview(state.query)) "overview" else "specific"
    val prompt =
      s"Answer ($style) the question using ONLY these sources, cite as [n].\n" +
        s"Question: ${state.query}\n\n${blocks.mkString("\n\n")}"
    llm.complete(prompt) + "\n\nSources:\n" + state.docs.take(5).zipWithIndex
      .map { case (d, i) => s"[${i + 1}] ${d.repo}/${d.filePath} (${d.scope})" }
      .mkString("\n")
  }
}

object AgentLoop {
  val RepoHintPattern = "(?i)repo:\\s*([\\w.-]+)".r

  /** Parsed judge verdict. */
  case class Judgment(
      coverage: Option[Double],
      needsMore: Option[Boolean],
      rewrite: Option[String])

  private val CoveragePat = "\"coverage\"\\s*:\\s*([0-9.]+)".r
  private val NeedsMorePat = "\"needs_more\"\\s*:\\s*(true|false)".r
  private val RewritePat = "\"rewrite\"\\s*:\\s*\"([^\"]+)\"".r

  /** Lenient judge-JSON extraction (reference agent_graph.py:343-355
    * bracket-slicing): regex field pulls over the braces slice, None when
    * nothing parseable — callers fall back to the heuristic ladder. */
  def parseJudge(response: String): Option[Judgment] = {
    val start = response.indexOf('{')
    val end = response.lastIndexOf('}')
    if (start < 0 || end <= start) return None
    val body = response.substring(start, end + 1)
    val cov = CoveragePat.findFirstMatchIn(body)
      .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)
      .filter(c => c >= 0.0 && c <= 1.0)
    val more = NeedsMorePat.findFirstMatchIn(body).map(_.group(1) == "true")
    val rw = RewritePat.findFirstMatchIn(body).map(_.group(1)).filter(_.nonEmpty)
    if (cov.isEmpty && more.isEmpty && rw.isEmpty) None
    else Some(Judgment(cov, more, rw))
  }

  private val codeyTerms = Seq(
    "stacktrace", "exception", "error", "function", "class", "method",
    "bug", "null", "implement", "code", "compile", "import")

  def looksCodey(q: String): Boolean = {
    val lower = q.toLowerCase
    codeyTerms.exists(lower.contains)
  }

  def looksOverview(q: String): Boolean = {
    val lower = q.toLowerCase
    Seq("overview", "architecture", "what is", "describe", "high level",
      "how does the project").exists(lower.contains)
  }

  val levelToScope: Map[String, String] = Map(
    "project" -> "catalog", "package" -> "module",
    "file" -> "file", "code" -> "chunk")

  /** Semantic expansion: append synonym-ish tokens (deterministic twin of
    * the LLM query expansion, agent_graph.py:104-150). */
  def expandQuery(q: String): String = {
    val syn = Map(
      "error" -> "exception failure", "speed" -> "performance latency",
      "config" -> "configuration settings", "db" -> "database storage")
    val extra = q.toLowerCase.split("\\W+").flatMap(syn.get).mkString(" ")
    if (extra.isEmpty) q + " details implementation" else s"$q $extra"
  }
}
