package graft.llm

/** LLM response post-processing (SURVEY §2.3 P8/P9, §2.8 T6).
  *
  * Reference semantics: `ingest/src/app/llm_init.py:36-48` strips
  * `<think>` blocks, role markers, chatty prefixes and "final answer:"
  * lead-ins; `rag_worker/.../qwen_llm.py:26-39` strips markdown fences;
  * `qwen_llm.py:41-102` extracts a router choice from `{"choice": N}` or a
  * bare 1-4 with repeated-line dedup (≤3 kept) and fallback "1".
  *
  * These run driver-side or inside the mapPartitions LLM stages — they are
  * plain string functions on a single response, so they need no Column
  * form; the enrichment operators apply them before results re-enter the
  * DataFrame.
  */
object LlmSanitize {

  private val ThinkBlock = "(?is)<think>.*?</think>".r
  private val RoleMarker = "(?im)^(assistant|system|user)\\s*:\\s*".r
  private val ChattyPrefix =
    "(?is)^\\s*(sure[,!. ]|certainly[,!. ]|of course[,!. ]|here(?:'s| is)\\b[^\\n]*?:\\s*)".r
  private val FinalAnswer = "(?im)^\\s*final answer\\s*:\\s*".r
  private val FenceOpen = "(?m)^```[a-zA-Z0-9_-]*\\s*$".r

  /** P8: response sanitize — think blocks, role markers, chatty prefixes,
    * "final answer:" markers, markdown fences. */
  def sanitizeResponse(raw: String): String = {
    var s = ThinkBlock.replaceAllIn(raw, "")
    s = RoleMarker.replaceAllIn(s, "")
    s = FinalAnswer.replaceAllIn(s, "")
    s = ChattyPrefix.replaceAllIn(s, "")
    s = FenceOpen.replaceAllIn(s, "")
    s.trim
  }

  /** T6: dedup of repeated response lines — unique non-blank lines in
    * first-occurrence order, at most `max` kept. */
  def dedupeLines(s: String, max: Int = 3): String = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    s.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { l =>
      if (seen.size < max && !seen.contains(l)) seen += l
    }
    seen.mkString("\n")
  }

  private val JsonChoice = "\"choice\"\\s*:\\s*([1-4])".r
  private val BareChoice = "(?m)^\\s*([1-4])\\s*\\.?\\s*$".r

  /** P9: selector-response cleanup — extract `{"choice": N}` or a bare
    * 1-4 from a (deduped) router response; fallback "1". */
  def selectorChoice(raw: String): String = {
    val cleaned = dedupeLines(sanitizeResponse(raw))
    JsonChoice.findFirstMatchIn(cleaned).map(_.group(1))
      .orElse(BareChoice.findFirstMatchIn(cleaned).map(_.group(1)))
      .getOrElse("1")
  }
}

/** Decorator applying P8 sanitize to every completion of an inner Llm —
  * the production HTTP impl wraps itself in this. */
class SanitizingLlm(inner: Llm) extends Llm {
  override def complete(prompt: String): String =
    LlmSanitize.sanitizeResponse(inner.complete(prompt))
  override def completeBatch(prompts: Seq[String]): Seq[String] =
    inner.completeBatch(prompts).map(LlmSanitize.sanitizeResponse)
}
