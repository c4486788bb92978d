package graft.operators

/** Deterministic splitters (SURVEY §2.4 C1-C4). The reference delegates to
  * tree-sitter / LlamaIndex splitters; the spec'd semantics preserved here
  * are the documented parameters (reference `langauge_detector.py:93-136`):
  *
  *  - code: 200-line windows, 10-line overlap, ≤4000 chars per chunk
  *  - fallback text: 4000-char windows, 200-char overlap, newline/sentence
  *    boundary snapping
  *  - catalog: 1500-char windows, 100-char overlap
  *
  * These run as `Dataset.flatMap` inside the ingest pipeline: one pass,
  * no shuffle, parallel by input partition — the Spark-native shape of a
  * generator/UDTF. All functions are pure for property testing
  * (ScalaCheck: coverage, overlap, max-chars invariants).
  */
object Chunker {

  case class Chunk(startLine: Int, endLine: Int, startChar: Int, text: String)

  val CodeChunkLines = 200
  val CodeChunkOverlap = 10
  val CodeMaxChars = 4000
  val TextChunkSize = 4000
  val TextChunkOverlap = 200
  val CatalogChunkSize = 1500
  val CatalogChunkOverlap = 100

  /** Declaration-boundary pattern for snap-to-boundary chunking: the
    * line starts a function/class/method in the mainstream languages.
    * This is the AST-less stand-in for tree-sitter's structural splits
    * (SURVEY §7.4 risk 1): windows still have the documented size and
    * overlap, but a window edge inside a declaration body slides back to
    * the declaration start so a symbol is not cut mid-definition. */
  val BoundaryPattern: scala.util.matching.Regex =
    ("^\\s*(?:export\\s+)?(?:public\\s+|private\\s+|protected\\s+|static\\s+|async\\s+)*" +
      "(?:def|class|function|object|trait|interface|struct|enum|impl|fn|func)\\b").r

  /** AST-less code splitter: line windows with overlap, hard char cap.
    * With `snapToBoundaries` a non-initial window start moves back up to
    * `overlap` lines to the nearest declaration start. */
  def chunkCode(text: String,
                chunkLines: Int = CodeChunkLines,
                overlap: Int = CodeChunkOverlap,
                maxChars: Int = CodeMaxChars,
                snapToBoundaries: Boolean = false): Seq[Chunk] = {
    if (text.isEmpty) return Seq.empty
    val lines = text.split("\n", -1)
    val step = math.max(1, chunkLines - overlap)
    def snap(start: Int): Int =
      if (!snapToBoundaries || start == 0) start
      else (math.max(0, start - overlap) to start).reverse
        .find(i => BoundaryPattern.findFirstIn(lines(i)).isDefined)
        .getOrElse(start)
    val windows = (0 until lines.length by step).iterator.map { start0 =>
      val start = snap(start0)
      val end = math.min(lines.length, start + chunkLines)
      (start, end, lines.slice(start, end).mkString("\n"))
    }.takeWhile { case (start, _, _) => start == 0 || start < lines.length }
      .toSeq
    // drop tail windows fully covered by the previous one
    val pruned = windows.zipWithIndex.filter { case ((start, end, _), i) =>
      i == 0 || end > windows(i - 1)._2
    }.map(_._1)
    pruned.flatMap { case (start, end, body) =>
      if (body.length <= maxChars) Seq(Chunk(start, end, 0, body))
      else splitByChars(body, maxChars, 0).map(c => Chunk(start, end, c.startChar, c.text))
    }
  }

  /** Char-window splitter with boundary snapping: prefers to end a window
    * at the last newline (then sentence stop, then space) inside it. */
  def chunkText(text: String,
                chunkSize: Int = TextChunkSize,
                overlap: Int = TextChunkOverlap): Seq[Chunk] = {
    if (text.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    var start = 0
    while (start < text.length) {
      val hardEnd = math.min(text.length, start + chunkSize)
      val end =
        if (hardEnd == text.length) hardEnd
        else {
          val window = text.substring(start, hardEnd)
          val snap = math.max(window.lastIndexOf('\n'),
            math.max(window.lastIndexOf(". "), window.lastIndexOf(' ')))
          if (snap > chunkSize / 2) start + snap + 1 else hardEnd
        }
      out += Chunk(0, 0, start, text.substring(start, end))
      if (end == text.length) start = text.length
      else start = math.max(start + 1, end - overlap)
    }
    out.toSeq
  }

  def chunkCatalog(text: String): Seq[Chunk] =
    chunkText(text, CatalogChunkSize, CatalogChunkOverlap)

  private def splitByChars(body: String, maxChars: Int, base: Int): Seq[Chunk] =
    chunkText(body, maxChars, 0).map(c => Chunk(0, 0, base + c.startChar, c.text))

  /** C1 dispatch: pick the splitter by language (reference
    * `code_pipeline.py:14-54`). Known languages → line splitter; unknown →
    * fallback char splitter. */
  def chunkByLanguage(text: String, language: String): Seq[Chunk] =
    if (LanguageMap.known(language)) chunkCode(text) else chunkText(text)
}
