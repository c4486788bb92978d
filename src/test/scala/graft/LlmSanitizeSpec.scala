package graft

import graft.llm.{Llm, LlmSanitize, SanitizingLlm}
import org.scalatest.funsuite.AnyFunSuite

/** P8/P9/T6 string semantics (reference llm_init.py:36-48,
  * qwen_llm.py:26-102) — pure-function tests, no Spark needed. */
class LlmSanitizeSpec extends AnyFunSuite {

  test("P8: think blocks, role markers, fences, chatty prefixes stripped") {
    val raw =
      """<think>let me reason
        |about this</think>Assistant: Sure, here's the summary:
        |```python
        |def f(): pass
        |```
        |Final answer: the function does nothing""".stripMargin
    val out = LlmSanitize.sanitizeResponse(raw)
    assert(!out.contains("<think>"))
    assert(!out.toLowerCase.contains("assistant:"))
    assert(!out.contains("```"))
    assert(!out.toLowerCase.contains("final answer:"))
    assert(out.contains("def f(): pass"))
    assert(out.contains("the function does nothing"))
  }

  test("P8: clean responses pass through unchanged") {
    val s = "The ingest pipeline has six stages."
    assert(LlmSanitize.sanitizeResponse(s) == s)
  }

  test("T6: repeated lines deduped to 3 in first-occurrence order") {
    val s = "alpha\nalpha\nbeta\n\nalpha\ngamma\ndelta"
    assert(LlmSanitize.dedupeLines(s) == "alpha\nbeta\ngamma")
  }

  test("P9: json choice extracted") {
    assert(LlmSanitize.selectorChoice("""{"choice": 3}""") == "3")
    assert(LlmSanitize.selectorChoice("<think>hmm</think>{\"choice\":2}") == "2")
  }

  test("P9: bare digit accepted; garbage falls back to 1") {
    assert(LlmSanitize.selectorChoice("  4  ") == "4")
    assert(LlmSanitize.selectorChoice("4.") == "4")
    assert(LlmSanitize.selectorChoice("I cannot decide") == "1")
    assert(LlmSanitize.selectorChoice("7") == "1") // out of range
  }

  test("SanitizingLlm decorates complete and completeBatch") {
    val inner = new Llm {
      override def complete(p: String): String = s"<think>x</think>ok: $p"
    }
    val llm = new SanitizingLlm(inner)
    assert(llm.complete("a") == "ok: a")
    assert(llm.completeBatch(Seq("a", "b")) == Seq("ok: a", "ok: b"))
  }
}
