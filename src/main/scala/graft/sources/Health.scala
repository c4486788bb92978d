package graft.sources

import graft.llm.{Embedder, Llm}
import org.apache.spark.sql.SparkSession

/** S8 / SURVEY §3.3: engine health surface. The reference's probe is a
  * Cassandra COUNT(*), an LLM /health ping, and an optional test
  * retrieval (rest_api/src/app/health.py:32-142); the engine equivalent
  * is per-scope corpus counts, a trivial LLM round-trip, and an embed
  * round-trip with dimension check. Serving-layer HTTP is out of engine
  * scope — callers map this to their endpoint. */
object Health {

  case class Status(
      corpusUp: Boolean,
      scopeCounts: Map[String, Long],
      llmUp: Boolean,
      embedderUp: Boolean,
      detail: String)

  def check(
      spark: SparkSession,
      corpusPath: String,
      llm: Llm,
      embedder: Embedder): Status = {
    val (counts, corpusUp, corpusMsg) =
      try {
        val c = CorpusStore.counts(spark, corpusPath)
        (c, c.values.sum > 0, s"corpus: ${c.values.sum} nodes")
      } catch {
        case e: Exception => (Map.empty[String, Long], false, s"corpus DOWN: ${e.getMessage}")
      }
    val (llmUp, llmMsg) =
      try { (llm.complete("ping").nonEmpty, "llm: up") }
      catch { case e: Exception => (false, s"llm DOWN: ${e.getMessage}") }
    val (embUp, embMsg) =
      try {
        val v = embedder.embed("ping")
        (v.length == embedder.dim, s"embedder: dim ${v.length}")
      } catch { case e: Exception => (false, s"embedder DOWN: ${e.getMessage}") }
    Status(corpusUp, counts, llmUp, embUp,
      Seq(corpusMsg, llmMsg, embMsg).mkString("; "))
  }
}
