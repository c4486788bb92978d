package graft.llm

import java.security.MessageDigest

/** LLM + embedder service traits (SURVEY §2.5). All enrichment operators
  * (summaries, titles, keywords, judgments, embeddings) go through these,
  * invoked from `mapPartitions` with bounded batches — NOT SQL UDFs,
  * because production impls need batching/retry/metering (reference:
  * `MeteredLLM`, worker.py:73-88; vLLM client, llm_init.py:99-143).
  *
  * The deterministic stubs make every pipeline output exactly reproducible
  * for tests and benchmarks (FIXTURES.md preamble): the hash embedder is a
  * seeded token-hash projection, the stub LLM a template responder. A
  * production deployment swaps in an HTTP impl with the same interface
  * (system "final only" message + response sanitize per llm_init.py:27-48).
  */
trait Llm extends Serializable {
  def complete(prompt: String): String

  /** Batched entry point — override where the backend supports it. */
  def completeBatch(prompts: Seq[String]): Seq[String] = prompts.map(complete)
}

trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
}

/** Deterministic template LLM: responses are pure functions of the prompt.
  * Summary-ish prompts get a truncated digest of their content; judge-ish
  * prompts get stable verdicts. */
class StubLlm extends Llm {
  override def complete(prompt: String): String = {
    val p = prompt.toLowerCase
    if (p.contains("good") && p.contains("readme")) {
      // README quality judge (reference catalog_builder.py:8-31)
      if (prompt.length > 200 && !p.contains("todo")) "GOOD" else "BAD"
    } else if (p.contains("choose the best search scope")) {
      // scope planner: deterministic routing from the question line only
      // (the prompt template itself contains codey-looking words)
      val q = "(?m)^question: (.*)$".r.findFirstMatchIn(p)
        .map(_.group(1)).getOrElse("")
      if (StubLlm.codeyish(q)) """{"scope": "code"}"""
      else if (StubLlm.overviewish(q)) """{"scope": "project"}"""
      else "{}" // no opinion: caller's heuristics take over
    } else if (p.contains("\"coverage\"")) {
      // retrieval judge: deterministic verdict from the inventory size; a
      // thin non-empty pool tightens filters to the best hit's repo and
      // stages down to file scope (exercises suggest_filters/stage_down)
      val n = "sources \\((\\d+)\\)".r.findFirstMatchIn(p)
        .map(_.group(1).toInt).getOrElse(0)
      val coverage = math.min(1.0, n / 5.0) * 0.9
      if (n >= 3) {
        s"""{"coverage": $coverage, "needs_more": false, "semantic_match": true}"""
      } else if (n > 0) {
        val repo = "repo=(\\S+)".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
        val suggest = if (repo.nonEmpty) s""", "suggest_filters": {"repo": "$repo"}""" else ""
        s"""{"coverage": $coverage, "needs_more": true$suggest, "stage_down": "file", "semantic_match": false}"""
      } else {
        s"""{"coverage": 0.0, "needs_more": true, "semantic_match": false}"""
      }
    } else if (p.contains("rewrite this codebase question")) {
      // query sharpener: echo the quoted question plus focusing tokens
      val base = "'([^']*)'".r.findFirstMatchIn(prompt).map(_.group(1))
        .getOrElse(prompt.takeRight(80))
      s"$base implementation details"
    } else if (p.contains("keywords")) {
      // 10 keywords: most frequent tokens, deterministic order
      StubLlm.topTokens(prompt, 10).mkString(", ")
    } else if (p.contains("title")) {
      "Title: " + StubLlm.topTokens(prompt, 3).mkString(" ")
    } else {
      // generic summary: first 200 chars of the content, cleaned
      val body = prompt.split("\n").filterNot(_.trim.isEmpty).takeRight(1)
        .mkString(" ")
      "Summary: " + body.take(200)
    }
  }
}

object StubLlm {
  // the stub's own routing vocabulary — kept independent of AgentLoop's
  // heuristics so the two layers stay separately testable
  private[llm] def codeyish(q: String): Boolean =
    Seq("stacktrace", "exception", "error", "function", "class", "method",
      "bug", "null", "implement", "compile", "import").exists(q.contains)
  private[llm] def overviewish(q: String): Boolean =
    Seq("overview", "architecture", "what is", "describe", "high level")
      .exists(q.contains)

  private[llm] def topTokens(text: String, k: Int): Seq[String] = {
    text.toLowerCase.split("[^a-z0-9_]+").filter(_.length > 3)
      .groupBy(identity).toSeq
      .map { case (t, g) => (t, g.length) }
      .sortBy { case (t, n) => (-n, t) }
      .take(k).map(_._1)
  }
}

/** Deterministic hash embedder: each token hashes to a handful of
  * dimensions with ±1 contributions; vectors are L2-normalized. Similar
  * token multisets → nearby vectors, so top-k ordering tests have exact
  * expected outcomes while behaving like a real bag-of-words embedding. */
class HashEmbedder(override val dim: Int = 384) extends Embedder {
  override def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    // split on non-alphanumerics so code identifiers decompose
    // (retry_with_backoff → retry, with, backoff)
    val tokens = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    tokens.foreach { t =>
      val h = HashEmbedder.sha1Long(t)
      var k = 0
      while (k < 4) { // 4 active dims per token
        val hk = HashEmbedder.mix(h, k)
        val idx = java.lang.Long.remainderUnsigned(hk, dim.toLong).toInt
        val sign = if (((hk >>> 17) & 1L) == 0L) 1.0f else -1.0f
        v(idx) += sign
        k += 1
      }
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm == 0.0) v else v.map(x => (x / norm).toFloat)
  }
}

object HashEmbedder {
  // MessageDigest.getInstance per token dominates embedding cost; reuse a
  // digest per thread and memoize token hashes (token sets repeat heavily
  // across chunks of the same corpus).
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-1")
  }
  private val tokenCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def sha1(s: String): Array[Byte] = {
    val md = digest.get()
    md.reset()
    md.digest(s.getBytes("UTF-8"))
  }

  private[llm] def sha1Long(s: String): Long = {
    val cached = tokenCache.get(s)
    if (cached != null) cached.longValue()
    else {
      val b = sha1(s)
      val v = (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (b(i) & 0xffL))
      if (tokenCache.size() < (1 << 17)) tokenCache.put(s, v)
      v
    }
  }

  private[llm] def mix(h: Long, k: Int): Long = {
    var x = h ^ (k.toLong * 0x9E3779B97F4A7C15L)
    x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL
    x ^= (x >>> 33); x *= 0xC4CEB9FE1A85EC53L
    x ^ (x >>> 33)
  }
}
