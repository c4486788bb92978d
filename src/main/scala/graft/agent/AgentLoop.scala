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
  * All four of the reference's LLM decision points go through the Llm
  * trait with lenient JSON parsing and heuristic fallbacks (reference:
  * agent_graph.py plan_scope :198-239, judge :304-384, rewrite_or_end
  * :386-446, synthesize :448-516):
  *   - plan: LLM chooses `{scope, filters:{repo,module,topics}}`, falling
  *     back to looks-codey/overview routing when the JSON doesn't parse;
  *   - judge: LLM verdict carries `suggest_filters` (merged into the
  *     state's filters, so they tighten mid-loop), `stage_down` (the LLM
  *     picks the next ladder step), and `semantic_match`;
  *   - rewrite: first retry asks the LLM to sharpen the query with the
  *     filter context; later retries use deterministic expansion;
  *   - synthesize: an anti-conservatism retry re-prompts once when the
  *     LLM pleads "insufficient context" despite ≥3 source docs.
  */
class AgentLoop(
    llm: Llm,
    embedder: Embedder,
    maxAttempts: Int = 3,
    minSourceNodes: Int = 1,
    hybrid: Boolean = false) extends Serializable {

  import AgentLoop._

  /** Scope planner (reference plan_scope, agent_graph.py:198-239): ask the
    * LLM for `{scope, filters}` JSON; fall back to the heuristic router
    * (codey → chunk, overview → catalog, else repo) when it doesn't parse
    * or names no scope. Explicit request fields (forceLevel, namespace,
    * repoName / `repo:` hint) always win over LLM-suggested filters, and
    * tech-synonym matches inject a `topics` filter
    * (agent_graph.py:31,230-234). */
  def planScope(req: QueryRequest): (String, Map[String, String]) = {
    val forced = req.forceLevel.flatMap(levelToScope.get)
    val repoHint = RepoHintPattern.findFirstMatchIn(req.query).map(_.group(1))
    val plan =
      if (forced.isDefined) None // explicit level: skip the LLM round-trip
      else parsePlan(llm.complete(
        s"""Choose the best search scope for a codebase question.
           |Return JSON: {"scope": "project|package|file|code", "filters": {"repo": "...", "module": "...", "topics": "..."}}
           |Question: ${req.query}
           |JSON:""".stripMargin))
    val scope = forced
      .orElse(plan.flatMap(_.scope).flatMap(levelToScope.get))
      .getOrElse {
        if (looksCodey(req.query)) "chunk"
        else if (looksOverview(req.query)) "catalog"
        else "repo"
      }
    val filters = plan.map(_.filters).getOrElse(Map.empty) ++
      Seq(
        req.namespace.map("namespace" -> _),
        req.repoName.orElse(repoHint).map("repo" -> _)).flatten.toMap
    val withTopics =
      if (filters.contains("topics")) filters
      else TechSynonyms.collectFirst {
        case (tech, syns) if syns.exists(req.query.toLowerCase.contains) =>
          filters + ("topics" -> tech)
      }.getOrElse(filters)
    (scope, withTopics)
  }

  /** Judge (reference agent_graph.py:304-384): build a source inventory
    * with 200-char previews, ask the Llm for the full verdict JSON
    * (coverage / needs_more / suggest_filters / stage_down / rewrite /
    * semantic_match), parse it leniently, and apply it: suggested filters
    * merge into the state (tightening future retrievals), and the LLM's
    * stage_down — or the auto-progression when coverage < 0.3 with a
    * non-empty pool — moves the scope. Falls back to the heuristic
    * coverage score when nothing parses. */
  def judge(state: AgentState): AgentState = {
    val heuristic =
      if (state.docs.isEmpty) 0.0
      else math.min(1.0, state.docs.length.toDouble / 5.0) *
        math.min(1.0, math.max(0.0, state.docs.map(_.score).max))
    val inventory = state.docs.take(10).zipWithIndex.map { case (d, i) =>
      s"[${i + 1}] repo=${d.repo} module=${d.module} file=${d.filePath} " +
        s"topics=${d.topics.mkString(",")} score=${f"${d.score}%.4f"} " +
        s"preview: ${d.text.take(200)}"
    }.mkString("\n")
    val response = llm.complete(
      s"""Judge if the retrieved content is semantically relevant and
         |sufficient to answer the question. Respond JSON:
         |{"coverage": 0.0-1.0, "needs_more": bool,
         | "suggest_filters": {"repo": "...", "module": "...", "topics": "..."},
         | "stage_down": "package"|"file"|"code"|null,
         | "rewrite": "...", "semantic_match": bool}
         |Question: ${state.query}
         |Sources (${state.docs.length}):
         |$inventory""".stripMargin)
    val verdict = AgentLoop.parseJudge(response)
    val coverage = verdict.flatMap(_.coverage).getOrElse(heuristic)
    val needsMore = verdict.flatMap(_.needsMore)
      .getOrElse(coverage < 0.3) || state.docs.length < minSourceNodes
    // suggest_filters tighten the loop's filters (reference :358-366)
    val filters = state.filters ++
      verdict.map(_.suggestFilters).getOrElse(Map.empty)
    // the LLM may choose the ladder step; otherwise auto-progress on weak
    // coverage over a non-empty pool (reference :367-379)
    val nextScope = verdict.flatMap(_.stageDown).flatMap(levelToScope.get)
      .getOrElse {
        if (coverage < 0.3 && state.docs.nonEmpty) stageDown(state.scope)
        else state.scope
      }
    state.copy(needsMore = needsMore,
      rewrite = verdict.flatMap(_.rewrite).orElse(state.rewrite),
      filters = filters, scope = nextScope,
      debug = state.debug :+
        (f"judge: coverage=$coverage%.3f needsMore=$needsMore " +
          s"llm=${verdict.isDefined} scope=$nextScope filters=$filters"))
  }

  def stageDown(scope: String): String = scope match {
    case "catalog" => "repo"
    case "repo" => "module"
    case "module" => "file"
    case _ => "chunk"
  }

  /** First-retry LLM query sharpening with filter context (reference
    * rewrite_or_end, agent_graph.py:406-435); deterministic context-aware
    * fallback when the response is degenerate. */
  private def llmRewrite(base: String, filters: Map[String, String]): String = {
    val context = Seq("repo", "module").flatMap(filters.get).mkString(" ")
    val prompt =
      s"Rewrite this codebase question to be more specific and searchable: '$base'" +
        (if (context.nonEmpty) s" Context: $context" else "") +
        "\nReturn only the rewritten question, no explanation:"
    val sharpened = llm.complete(prompt).strip.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'").strip
    if (sharpened.length >= 10) sharpened
    else if (context.nonEmpty) s"$base in $context"
    else base
  }

  /** Initial state after scope planning. */
  private def planState(req: QueryRequest): AgentState = {
    val (scope0, filters) = planScope(req)
    AgentState(req.query, scope0, filters, attempt = 1,
      docs = Nil, needsMore = true, rewrite = None, answer = None,
      debug = Seq(s"plan: scope=$scope0 filters=$filters"))
  }

  /** Under-retrieval merge (T4/T5 semantics): union the expanded-query
    * docs when present, dedup by rowId, keep the best topK. */
  private def mergeDocs(
      docs: Seq[Retrieved],
      expanded: Option[Seq[Retrieved]],
      topK: Int): Seq[Retrieved] = expanded match {
    case Some(exp) => (docs ++ exp).distinctBy(_.rowId)
      .sortBy(r => (-r.score, r.rowId)).take(topK)
    case None => docs.sortBy(r => (-r.score, r.rowId)).take(topK)
  }

  /** The post-retrieval step of one attempt round — judge, then either
    * finish (synthesize) or set up the retry. Shared verbatim by the
    * sequential [[run]] and the batched [[runBatch]] so the two paths
    * cannot drift. Returns (next state, finished?). */
  private def judgeAndStep(
      state: AgentState, q: String, merged: Seq[Retrieved]): (AgentState, Boolean) = {
    // stuck detection (reference agent_graph.py:395-401): identical doc
    // set on consecutive attempts → force file scope instead of the
    // judge's chosen step
    val prevIds = state.docs.map(_.rowId).toSet
    val judged = judge(state.copy(docs = merged)) // may move scope + filters
    val stuck = judged.attempt > 1 && prevIds.nonEmpty &&
      judged.docs.map(_.rowId).toSet == prevIds
    if (!judged.needsMore || judged.attempt >= maxAttempts)
      (judged.copy(answer = Some(synthesize(judged))), true)
    else {
      val nextScope = if (stuck && judged.scope != "file") "file" else judged.scope
      val rewrite =
        if (judged.attempt == 1) Some(llmRewrite(q, judged.filters))
        else Some(expandQuery(q))
      (judged.copy(
        scope = nextScope, attempt = judged.attempt + 1, rewrite = rewrite,
        debug = judged.debug :+ (s"retry: scope=$nextScope " +
          s"attempt=${judged.attempt + 1} filters=${judged.filters}")), false)
    }
  }

  /** One full query. */
  def run(corpus: DataFrame, req: QueryRequest): AgentState = {
    var state = planState(req)
    var done = false
    while (!done) {
      val q = state.rewrite.getOrElse(state.query)
      // hybrid mode swaps the retrieval kernel for the dense+sparse RRF
      // fusion (Retrieval.retrieveHybridRrf) — loop semantics unchanged
      val res =
        if (hybrid) {
          val docs = Retrieval.retrieveHybridRrf(
            corpus, embedder, q, state.scope, state.filters,
            k = Retrieval.capsByScope.get(state.scope).map(_.k).getOrElse(10))
          Retrieval.Result(docs,
            exhausted = docs.length <
              Retrieval.capsByScope.get(state.scope).map(_.k).getOrElse(10))
        } else Retrieval.retrieveResult(corpus, embedder, q, state.scope, state.filters)
      // under-retrieval → union an expanded query (T4/T5 semantics) —
      // unless the slice was exhausted, in which case a re-query over the
      // same (scope, filters) returns the identical rows and is skipped
      val expanded =
        if (res.docs.length < 3 && !res.exhausted)
          Some(Retrieval.retrieve(
            corpus, embedder, expandQuery(q), state.scope, state.filters))
        else None
      val (next, fin) = judgeAndStep(state, q, mergeDocs(res.docs, expanded, req.topK))
      state = next
      done = fin
    }
    state
  }

  /** Multi-query fan-out: run Q independent queries with their per-round
    * retrievals BATCHED through [[BatchRetrieval]] — queries on the same
    * (scope, filters) share one corpus scan per stage, so the Spark job
    * count per round is O(distinct scope-groups × (1 + maxDepth)),
    * independent of Q (the reference worker drains up to max_jobs=10
    * concurrent jobs, worker.py:185 — at 100 TB the per-query scans are
    * the serving cost this amortizes). Loop semantics per query are
    * IDENTICAL to [[run]] (shared [[judgeAndStep]]; LLM/embedder calls
    * are per-query and deterministic given the same inputs), asserted by
    * parity in AgentBatchSpec. Results keep input order. */
  def runBatch(
      corpus: DataFrame,
      reqs: Seq[(String, QueryRequest)]): Seq[(String, AgentState)] = {
    import graft.retrieval.BatchRetrieval
    var pending = reqs.map { case (id, req) => (id, req, planState(req)) }
    val finished = scala.collection.mutable.Map.empty[String, AgentState]
    while (pending.nonEmpty) {
      val qOf = pending.map { case (id, _, st) =>
        id -> st.rewrite.getOrElse(st.query)
      }.toMap
      val results = BatchRetrieval.retrieveAll(corpus, embedder,
        pending.map { case (id, _, st) =>
          BatchRetrieval.Spec(id, qOf(id), st.scope, st.filters) })
      // under-retrieval expansion as a second batched sub-round over the
      // queries that need it (same skip-when-exhausted rule as run())
      val needExp = pending.filter { case (id, _, _) =>
        val r = results(id); r.docs.length < 3 && !r.exhausted
      }
      val expanded =
        if (needExp.isEmpty) Map.empty[String, Retrieval.Result]
        else BatchRetrieval.retrieveAll(corpus, embedder,
          needExp.map { case (id, _, st) =>
            BatchRetrieval.Spec(id, expandQuery(qOf(id)), st.scope, st.filters) })
      pending = pending.flatMap { case (id, req, st) =>
        val merged = mergeDocs(results(id).docs,
          expanded.get(id).map(_.docs), req.topK)
        val (next, fin) = judgeAndStep(st, qOf(id), merged)
        if (fin) { finished(id) = next; None } else Some((id, req, next))
      }
    }
    reqs.map { case (id, _) => id -> finished(id) }
  }

  /** Synthesis: ≤5 blocks × 800 chars, `[n]` citations, overview-vs-
    * specific prompt selection, and the anti-conservatism retry — when the
    * LLM pleads insufficient context despite ≥3 docs, re-prompt once with
    * an encouraging system message and keep the retry iff it commits
    * (agent_graph.py:448-516). */
  def synthesize(state: AgentState): String = {
    if (state.docs.isEmpty) return "No relevant sources found."
    val blocks = state.docs.take(5).zipWithIndex.map { case (d, i) =>
      s"[${i + 1}] (${d.scope} ${d.repo}/${d.filePath}) ${d.text.take(800)}"
    }
    val style = if (looksOverview(state.query)) "overview" else "specific"
    val prompt =
      s"Answer ($style) the question using ONLY these sources, cite as [n].\n" +
        s"Question: ${state.query}\n\n${blocks.mkString("\n\n")}"
    val first = llm.complete(prompt)
    val answer =
      if (state.docs.length >= 3 && soundsConservative(first)) {
        val retry = llm.complete(
          "You have relevant sources - don't be overly conservative. " +
            "Use the provided context to answer; cite as [n].\n" +
            s"Question: ${state.query}\n\n${blocks.mkString("\n\n")}")
        if (soundsConservative(retry)) first else retry
      } else first
    answer + "\n\nSources:\n" + state.docs.take(5).zipWithIndex
      .map { case (d, i) => s"[${i + 1}] ${d.repo}/${d.filePath} (${d.scope})" }
      .mkString("\n")
  }
}

object AgentLoop {
  val RepoHintPattern = "(?i)repo:\\s*([\\w.-]+)".r

  /** Tech-synonym topics injection (reference agent_graph.py:31): a query
    * term matching a synonym set adds `topics=<tech>` to the filters. */
  val TechSynonyms: Seq[(String, Seq[String])] = Seq(
    "activemq" -> Seq("activemq", "jms", "amq", "failovertransport",
      "redeliverypolicy", "broker", "stomp"),
    "kafka" -> Seq("kafka", "consumer group", "partition rebalance"),
    "spark" -> Seq("spark", "catalyst", "tungsten", "shuffle"))

  /** Conservative-answer phrases the synthesis retry triggers on
    * (agent_graph.py:481-484). */
  private val ConservativePhrases = Seq(
    "insufficient", "don't see enough", "can't answer", "not enough information")
  def soundsConservative(answer: String): Boolean = {
    val lower = answer.toLowerCase
    ConservativePhrases.exists(lower.contains)
  }

  /** Parsed scope plan. */
  case class Plan(scope: Option[String], filters: Map[String, String])

  /** Parsed judge verdict. */
  case class Judgment(
      coverage: Option[Double],
      needsMore: Option[Boolean],
      rewrite: Option[String],
      suggestFilters: Map[String, String] = Map.empty,
      stageDown: Option[String] = None,
      semanticMatch: Option[Boolean] = None)

  private val ScopePat = "\"scope\"\\s*:\\s*\"(project|package|file|code)\"".r
  private val CoveragePat = "\"coverage\"\\s*:\\s*([0-9.]+)".r
  private val NeedsMorePat = "\"needs_more\"\\s*:\\s*(true|false)".r
  private val RewritePat = "\"rewrite\"\\s*:\\s*\"([^\"]+)\"".r
  private val StageDownPat = "\"stage_down\"\\s*:\\s*\"(package|file|code)\"".r
  private val SemanticPat = "\"semantic_match\"\\s*:\\s*(true|false)".r
  private val SuggestPat = "\"suggest_filters\"\\s*:\\s*\\{([^}]*)\\}".r

  // accepts both `"repo": "x"` and the LLM's plural-array habit
  // `"repos": ["x", ...]` → first element (reference :217-226)
  private def filterValue(body: String, k: String): Option[(String, String)] =
    ("\"" + k + "s?\"\\s*:\\s*(?:\"([^\"]+)\"|\\[\\s*\"([^\"]+)\")").r
      .findFirstMatchIn(body)
      .map(m => k -> Option(m.group(1)).getOrElse(m.group(2)))
      .filter(_._2.nonEmpty)

  private def parseFilters(body: String): Map[String, String] =
    Seq("repo", "module", "topics").flatMap(filterValue(body, _)).toMap

  /** Lenient plan-JSON extraction (reference agent_graph.py:214-226
    * bracket-slicing). An empty-but-valid `{}` yields Plan(None, empty) —
    * the caller's heuristics take over; no braces at all yields None. */
  def parsePlan(response: String): Option[Plan] = {
    val start = response.indexOf('{')
    val end = response.lastIndexOf('}')
    if (start < 0 || end <= start) return None
    val body = response.substring(start, end + 1)
    Some(Plan(ScopePat.findFirstMatchIn(body).map(_.group(1)), parseFilters(body)))
  }

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
    val suggest = SuggestPat.findFirstMatchIn(body)
      .map(m => parseFilters(m.group(1))).getOrElse(Map.empty)
    val down = StageDownPat.findFirstMatchIn(body).map(_.group(1))
    val sem = SemanticPat.findFirstMatchIn(body).map(_.group(1) == "true")
    if (cov.isEmpty && more.isEmpty && rw.isEmpty && suggest.isEmpty &&
      down.isEmpty && sem.isEmpty) None
    else Some(Judgment(cov, more, rw, suggest, down, sem))
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
