package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Structure-aware code splitter — the engine-native replacement for the
  * tree-sitter chunking the reference delegates to (reference
  * `langauge_detector.py:106-113`), built from public split-then-merge
  * chunking semantics (LlamaIndex CodeSplitter / "cAST: chunking via
  * abstract syntax trees", 2024): split at declaration boundaries, recurse
  * into oversized declarations, greedily merge small siblings, window only
  * inside oversized leaf bodies.
  *
  * No parser dependency exists in this container, so the "AST" is a
  * declaration-span forest recovered by a comment/string-aware scanner:
  *
  *  - brace languages (Scala/Java/JS/TS/C/C++/C#/Go/Rust/Kotlin/Swift/PHP):
  *    a declaration's span runs from its header line to the line where the
  *    brace depth returns to the header's depth. Braces inside strings,
  *    chars and comments (line, block — nested for Scala) are not counted.
  *  - indent languages (Python): a declaration's span runs from its header
  *    (plus contiguous decorator lines) to the last following line whose
  *    indent is deeper than the header's; blanks and comments never close
  *    a span.
  *  - layout languages (Haskell/OCaml): top-level declarations begin at
  *    column 0 (the layout rule / conventional toplevel form) and span
  *    until the next column-0 code line; a column-0 line opening with a
  *    non-identifier (a closing bracket, an operator continuation) or
  *    re-binding the SAME name (type signature + equation pairs) extends
  *    the current span. Comments are `--` + nested `{- -}` (Haskell) and
  *    nested `(* *)` (OCaml).
  *
  * The scanner is deliberately conservative: if the file ends inside a
  * string/comment or with unbalanced braces (truncated or pathological
  * input), [[chunk]] falls back to [[Chunker.chunkCode]]'s windowed split
  * rather than trusting a broken span forest.
  *
  * Chunk algebra invariants (property-tested in StructuralChunkerSpec and
  * hash-gated end-to-end by `td_chunk_structural`):
  *  1. coverage — concatenating chunk texts reproduces the input exactly
  *     (zero overlap, zero loss);
  *  2. cap — every chunk is ≤ maxChars;
  *  3. merge tightness — no two adjacent chunks could be merged, so
  *     len(a)+len(b) > maxChars for every adjacent pair, which bounds
  *     n_chunks ≤ 2·ceil(len/maxChars)+1;
  *  4. structure — a declaration that fits in maxChars is never split
  *     across chunks.
  */
object StructuralChunker {

  /** One recovered declaration: `[startChar, endChar)` span, 0-based
    * `startLine`/`endLine` (inclusive), nesting `depth` (0 = top level),
    * `kind` = the introducing keyword ("class", "def", "fn", … or "block"
    * for keyword-less brace scopes like Java methods), `name` = the first
    * identifier after the keyword ("" if none found). */
  final case class Decl(startChar: Int, endChar: Int,
                        startLine: Int, endLine: Int,
                        depth: Int, kind: String, name: String)

  private val BraceLangs = Set(
    "scala", "java", "javascript", "typescript", "js", "ts", "c", "cpp",
    "c++", "csharp", "c#", "go", "rust", "kotlin", "swift", "php")
  private val IndentLangs = Set("python", "py")
  private val LayoutLangs = Set("haskell", "ocaml")

  def isStructural(language: String): Boolean = {
    val l = language.toLowerCase
    BraceLangs.contains(l) || IndentLangs.contains(l) || LayoutLangs.contains(l)
  }

  /** Keyword-led declaration headers (shared with [[Chunker.BoundaryPattern]]
    * but capturing kind + name). */
  private val KeywordDecl =
    ("""^\s*(?:@\w+\s+)?(?:export\s+)?(?:public\s+|private\s+|protected\s+|internal\s+|static\s+|final\s+|abstract\s+|sealed\s+|async\s+|override\s+|default\s+)*""" +
      """(def|class|function|object|trait|interface|struct|enum|impl|fn|func|fun|module|case\s+class|case\s+object)\b\s*([A-Za-z_$][\w$]*)?""").r

  /** Control-flow openers that must NOT count as keyword-less declarations
    * (Java methods, C functions open scopes without a keyword). */
  private val ControlFlow = Set(
    "if", "else", "for", "while", "switch", "match", "do", "try", "catch",
    "finally", "return", "case", "default", "new", "synchronized", "lock")

  // ---------------------------------------------------------------------
  // Scanner: per-line code view + brace deltas, comment/string aware.
  // ---------------------------------------------------------------------

  /** Per-line scan result: `code` = the line with comment/string interiors
    * blanked (structure intact), `open`/`close` = brace counts in code
    * context, `endState` = scanner state after the line. */
  private final case class LineScan(code: String, open: Int, close: Int)

  private final class Scanner(lang: String) {
    private val lineComment: Seq[String] = lang match {
      case "python" | "py"       => Seq("#")
      case "sql" | "lua"         => Seq("--")
      case "haskell"             => Seq("--")
      case "ocaml"               => Seq.empty // (* *) only
      case _                     => Seq("//")
    }
    private val (blockStart, blockEnd) = lang match {
      case "haskell" => ("{-", "-}")
      case "ocaml"   => ("(*", "*)")
      case _         => ("/*", "*/")
    }
    // scala nests /* */; both layout languages nest their block comments
    private val nestedBlocks =
      lang == "scala" || lang == "haskell" || lang == "ocaml"
    // state: 0 = code; 1 = block comment (depth in blockDepth);
    // 2 = "-string; 3 = '-string; 4 = `-string; 5 = """-string; 6 = '''-string
    var state: Int = 0
    var blockDepth: Int = 0

    def inCodeAtEof: Boolean = state == 0

    /** Scan one line (no trailing newline), returning the blanked code view. */
    def scan(line: String): LineScan = {
      val sb = new java.lang.StringBuilder(line.length)
      var open = 0; var close = 0
      var i = 0
      val n = line.length
      def startsWith(s: String): Boolean = line.regionMatches(i, s, 0, s.length)
      while (i < n) {
        val c = line.charAt(i)
        state match {
          case 0 =>
            if (lineComment.exists(startsWith)) { // rest of line is comment
              while (i < n) { sb.append(' '); i += 1 }
            } else if (!IndentLangs.contains(lang) && startsWith(blockStart)) {
              state = 1; blockDepth = 1; sb.append("  "); i += 2
            } else if (startsWith("\"\"\"")) {
              state = 5; sb.append("   "); i += 3
            } else if (IndentLangs.contains(lang) && startsWith("'''")) {
              state = 6; sb.append("   "); i += 3
            } else if (c == '"') { state = 2; sb.append(' '); i += 1 }
            else if (c == '\'' && IndentLangs.contains(lang)) {
              state = 3; sb.append(' '); i += 1
            } else if (c == '\'' &&
                (!LayoutLangs.contains(lang) || i == 0 || {
                  // LAYOUT LANGS ONLY: a quote glued to an identifier
                  // char is a primed identifier (Haskell `x'`,
                  // `f x' y' = …`), never a literal opener — without
                  // this guard the lookahead from x's apostrophe finds
                  // y's within 9 chars and blanks real code. Brace
                  // langs must NOT take this guard: their prefixed
                  // literals (Rust `b'{'`, C `L'x'`, `u8'x'`) put an
                  // identifier char directly before a REAL literal,
                  // and skipping the blank would count the quoted
                  // brace and mis-scan the closing quote.
                  val p = line.charAt(i - 1)
                  !Character.isLetterOrDigit(p) && p != '_' && p != '\''
                })) {
              // brace langs: blank a short 'x' / '\n' / 'A' char
              // literal; a lone quote (Rust lifetime 'a, Scala symbol) is
              // ordinary code and must NOT swallow the rest of the line
              var j = i + 1
              var found = -1
              while (j < n && j <= i + 9 && found < 0) {
                if (line.charAt(j) == '\\') j += 2
                else if (line.charAt(j) == '\'') found = j
                else j += 1
              }
              if (found > i + 1) { // non-empty literal: blank through it
                while (i <= found) { sb.append(' '); i += 1 }
              } else { sb.append(c); i += 1 }
            } else if (c == '`' && (lang == "javascript" || lang == "typescript" || lang == "js" || lang == "ts" || lang == "go")) {
              state = 4; sb.append(' '); i += 1
            } else {
              if (c == '{') open += 1
              if (c == '}') close += 1
              sb.append(c); i += 1
            }
          case 1 =>
            if (startsWith(blockEnd)) {
              blockDepth -= 1; if (blockDepth == 0) state = 0
              sb.append("  "); i += 2
            } else if (nestedBlocks && startsWith(blockStart)) {
              blockDepth += 1; sb.append("  "); i += 2
            } else { sb.append(' '); i += 1 }
          case 2 =>
            if (c == '\\' && i + 1 < n) { sb.append("  "); i += 2 }
            else { if (c == '"') state = 0; sb.append(' '); i += 1 }
          case 3 =>
            if (c == '\\' && i + 1 < n) { sb.append("  "); i += 2 }
            else { if (c == '\'') state = 0; sb.append(' '); i += 1 }
          case 4 =>
            if (c == '\\' && i + 1 < n) { sb.append("  "); i += 2 }
            else { if (c == '`') state = 0; sb.append(' '); i += 1 }
          case 5 =>
            if (startsWith("\"\"\"")) { state = 0; sb.append("   "); i += 3 }
            else { sb.append(' '); i += 1 }
          case 6 =>
            if (startsWith("'''")) { state = 0; sb.append("   "); i += 3 }
            else { sb.append(' '); i += 1 }
        }
      }
      // unterminated quote states do not survive the newline (an
      // apostrophe in a comment word must not swallow the file); block
      // strings/comments and multiline backtick templates do.
      if (state == 2 || state == 3) state = 0
      LineScan(sb.toString, open, close)
    }
  }

  // ---------------------------------------------------------------------
  // Declaration-span recovery
  // ---------------------------------------------------------------------

  /** Recover the declaration forest, or None when the scan says the input
    * is not trustworthy (unbalanced braces / EOF inside block state). */
  def parse(text: String, language: String): Option[Seq[Decl]] = {
    val lang = language.toLowerCase
    if (!isStructural(lang)) None
    else if (IndentLangs.contains(lang)) parseIndent(text)
    else if (LayoutLangs.contains(lang)) parseLayout(text, lang)
    else parseBraces(text, lang)
  }

  private def splitKeepOffsets(text: String): (Array[String], Array[Int]) = {
    val lines = text.split("\n", -1)
    val offs = new Array[Int](lines.length)
    var o = 0
    var i = 0
    while (i < lines.length) { offs(i) = o; o += lines(i).length + 1; i += 1 }
    (lines, offs)
  }

  private def parseBraces(text: String, lang: String): Option[Seq[Decl]] = {
    val (lines, offs) = splitKeepOffsets(text)
    val sc = new Scanner(lang)
    val scans = lines.map(sc.scan)
    if (!sc.inCodeAtEof) return None
    var depth = 0
    // open declarations: (headerLine, headerDepth, kind, name, sawBrace)
    final case class Open(header: Int, d: Int, kind: String, name: String, var entered: Boolean)
    val stack = ArrayBuffer.empty[Open]
    val out = ArrayBuffer.empty[Decl]
    var pendingHeader = -1; var pendingKind = ""; var pendingName = ""
    var i = 0
    while (i < lines.length) {
      val s = scans(i)
      val code = s.code
      val trimmed = code.trim
      if (pendingHeader < 0 && trimmed.nonEmpty) {
        KeywordDecl.findFirstMatchIn(code) match {
          case Some(m) =>
            pendingHeader = i
            pendingKind = m.group(1).replaceAll("\\s+", " ")
            pendingName = Option(m.group(2)).getOrElse("")
          case None =>
            // keyword-less scope opener (Java/C method): net-positive brace
            // on a line whose first word is not control flow
            val first = trimmed.takeWhile(ch => ch.isLetterOrDigit || ch == '_')
            if (s.open > s.close && first.nonEmpty && !ControlFlow.contains(first)) {
              pendingHeader = i; pendingKind = "block"
              pendingName = first
            }
        }
      }
      // apply brace deltas one by one so a one-line `def f() { ... }`
      // opens and closes correctly
      var k = 0
      while (k < code.length) {
        val ch = code.charAt(k)
        if (ch == '{') {
          if (pendingHeader >= 0) {
            stack += Open(pendingHeader, depth, pendingKind, pendingName, entered = true)
            pendingHeader = -1; pendingKind = ""; pendingName = ""
          }
          depth += 1
        } else if (ch == '}') {
          depth -= 1
          if (depth < 0) return None
          if (stack.nonEmpty && stack.last.d == depth) {
            val o = stack.remove(stack.length - 1)
            out += Decl(offs(o.header), math.min(text.length, offs(i) + lines(i).length + 1),
              o.header, i, 0, o.kind, o.name) // depth assigned in assignDepths
          }
        }
        k += 1
      }
      // a pending header with no `{` within 2 lines is abandoned (forward
      // declaration, expression-bodied member, interface signature)
      if (pendingHeader >= 0 && i - pendingHeader >= 2) { pendingHeader = -1 }
      i += 1
    }
    if (depth != 0) None
    else Some(assignDepths(out.sortBy(d => (d.startChar, -d.endChar)).toSeq))
  }

  private def assignDepths(sorted: Seq[Decl]): Seq[Decl] = {
    val stack = ArrayBuffer.empty[Decl]
    sorted.map { d =>
      while (stack.nonEmpty && stack.last.endChar <= d.startChar) stack.remove(stack.length - 1)
      val withDepth = d.copy(depth = stack.length)
      stack += withDepth
      withDepth
    }
  }

  private def parseIndent(text: String): Option[Seq[Decl]] = {
    val (lines, offs) = splitKeepOffsets(text)
    val sc = new Scanner("python")
    val scans = lines.map(sc.scan)
    if (!sc.inCodeAtEof) return None
    def indentOf(code: String): Int = {
      var k = 0
      while (k < code.length && code.charAt(k) == ' ') k += 1
      if (k < code.length && code.charAt(k) == '\t') -1 else k // tabs: bail per-line
    }
    val decls = ArrayBuffer.empty[Decl]
    var i = 0
    while (i < lines.length) {
      val code = scans(i).code
      val m = KeywordDecl.findFirstMatchIn(code)
      if (m.isDefined && code.trim.nonEmpty) {
        val ind = indentOf(code)
        if (ind >= 0) {
          // attach contiguous preceding decorator lines at the same indent
          var start = i
          while (start > 0 && {
            val p = scans(start - 1).code
            p.trim.startsWith("@") && indentOf(p) == ind
          }) start -= 1
          // span: last following line with indent > ind (blanks/comments skip)
          var end = i
          var j = i + 1
          var continue = true
          while (j < lines.length && continue) {
            val cj = scans(j).code
            if (cj.trim.isEmpty) { j += 1 } // blank: provisional
            else {
              val ij = indentOf(cj)
              if (ij < 0 || ij > ind) { end = j; j += 1 }
              else continue = false
            }
          }
          decls += Decl(offs(start), math.min(text.length, offs(end) + lines(end).length + 1),
            start, end, 0, m.get.group(1), Option(m.get.group(2)).getOrElse(""))
        }
      }
      i += 1
    }
    Some(assignDepths(decls.sortBy(d => (d.startChar, -d.endChar)).toSeq))
  }

  /** Declaration keywords that OPEN a layout-language toplevel item; any
    * other identifier-led column-0 line is a value binding ("bind"). */
  private val LayoutKeywords = Set(
    // Haskell
    "data", "newtype", "type", "class", "instance", "module", "import",
    "foreign", "infix", "infixl", "infixr",
    // OCaml
    "let", "and", "exception", "open", "external", "val", "method",
    "functor", "include")

  /** Layout-language span recovery (Haskell/OCaml): a toplevel
    * declaration starts at a column-0 code line led by an identifier or
    * keyword and runs until the next such line — indented continuations,
    * blanks and comments never close a span, and a column-0 line that
    * re-binds the SAME head name (Haskell signature + equation groups,
    * OCaml `and`-chains keep their own keyword) extends the span, so a
    * function's type signature, equations and guards stay one unit. A
    * column-0 line led by a non-identifier (closing bracket, operator
    * section continuation) also extends. The scan is comment/string
    * aware via [[Scanner]]; EOF inside a block comment or string means
    * the input is untrustworthy → None (windowed fallback). */
  private def parseLayout(text: String, lang: String): Option[Seq[Decl]] = {
    val (lines, offs) = splitKeepOffsets(text)
    val sc = new Scanner(lang)
    val scans = lines.map(sc.scan)
    if (!sc.inCodeAtEof) return None
    def headWord(code: String): String =
      code.takeWhile(ch => ch.isLetterOrDigit || ch == '_' || ch == '\'')
    // bound name: for keyword-led lines the identifier after the keyword
    // (skipping OCaml `rec`), else the head word itself (a Haskell
    // signature/equation head, e.g. `foo :: …` / `foo x = …`, binds foo)
    def boundName(code: String): String = {
      val w = headWord(code)
      if (LayoutKeywords.contains(w)) {
        val rest = code.drop(w.length).dropWhile(_ == ' ')
        val r2 = if (rest.startsWith("rec ")) rest.drop(4) else rest
        headWord(r2)
      } else w
    }
    final case class OpenDecl(start: Int, kind: String, name: String)
    val decls = ArrayBuffer.empty[Decl]
    var open: Option[OpenDecl] = None
    var lastCode = -1 // last non-blank code line seen (span end candidate)
    def close(endLine: Int): Unit = open.foreach { o =>
      decls += Decl(offs(o.start),
        math.min(text.length, offs(endLine) + lines(endLine).length + 1),
        o.start, endLine, 0, o.kind, o.name)
      open = None
    }
    var i = 0
    while (i < lines.length) {
      val code = scans(i).code
      if (code.trim.nonEmpty) {
        val startsAtZero = !code.charAt(0).isWhitespace
        val w = headWord(code)
        if (startsAtZero && w.nonEmpty && !w.charAt(0).isDigit) {
          val name = boundName(code)
          val sameGroup = open.exists(o =>
            o.name.nonEmpty && name == o.name && !LayoutKeywords.contains(w))
          if (!sameGroup) {
            if (open.isDefined) close(lastCode)
            val kind = if (LayoutKeywords.contains(w)) w else "bind"
            open = Some(OpenDecl(i, kind, name))
          }
        } else if (startsAtZero && open.isEmpty) {
          // column-0 non-identifier with nothing open: freestanding
          // toplevel expression — give it a span so coverage gaps stay
          // merge-sized
          open = Some(OpenDecl(i, "block", ""))
        }
        lastCode = i
      }
      i += 1
    }
    if (open.isDefined && lastCode >= 0) close(lastCode)
    Some(decls.sortBy(d => (d.startChar, -d.endChar)).toSeq)
  }

  // ---------------------------------------------------------------------
  // Split-then-merge chunk assembly
  // ---------------------------------------------------------------------

  /** Chunk `text` structurally: declaration forest for structural
    * languages, paragraph→sentence recursion ([[chunkProse]]) for
    * everything else. Falls back to [[Chunker.chunkCode]]'s windowed split
    * only when a structural-language scan is untrustworthy (truncated
    * file, unbalanced braces) — the one case where invariant 1 (exact
    * coverage) is traded for robustness. */
  def chunk(text: String, language: String,
            maxChars: Int = Chunker.CodeMaxChars): Seq[Chunker.Chunk] = {
    if (text.isEmpty) return Seq.empty
    if (!isStructural(language)) chunkProse(text, maxChars)
    else parse(text, language) match {
      case Some(decls) => assemble(text, decls, maxChars)
      case None => Chunker.chunkCode(text, maxChars = maxChars, snapToBoundaries = true)
    }
  }

  private def assemble(text: String, decls: Seq[Decl], maxChars: Int): Seq[Chunker.Chunk] = {
    val atoms = atomize(text, 0, text.length, decls.filter(_.depth == 0), maxChars, decls)
    toChunks(text, mergeAtoms(atoms, text, maxChars))
  }

  private def toChunks(text: String, spans: Seq[(Int, Int)]): Seq[Chunker.Chunk] = {
    val lineOf = lineIndex(text)
    spans.map { case (s, e) =>
      Chunker.Chunk(lineOf(s), lineOf(math.max(s, e - 1)), s, text.substring(s, e))
    }
  }

  /** Structural chunking for prose (public recursive-splitter semantics —
    * LangChain RecursiveCharacterTextSplitter): paragraph units first,
    * oversized paragraphs split at sentence stops, oversized sentences
    * window-cut; then the same greedy merge. Zero overlap, exact
    * coverage — the same invariants 1-3 as the code path. */
  def chunkProse(text: String, maxChars: Int = Chunker.TextChunkSize): Seq[Chunker.Chunk] = {
    if (text.isEmpty) return Seq.empty
    val paragraphs = boundarySpans(text, 0, text.length, ParagraphBoundary)
    val atoms = ArrayBuffer.empty[(Int, Int)]
    paragraphs.foreach { case (s, e) =>
      if (e - s <= maxChars) atoms += ((s, e))
      else boundarySpans(text, s, e, SentenceBoundary).foreach { case (ss, se) =>
        if (se - ss <= maxChars) atoms += ((ss, se))
        else Chunker.chunkText(text.substring(ss, se), maxChars, 0)
          .foreach(c => atoms += ((ss + c.startChar, ss + c.startChar + c.text.length)))
      }
    }
    toChunks(text, mergeAtoms(atoms.toSeq, text, maxChars))
  }

  private val ParagraphBoundary = "\n\n".r
  private val SentenceBoundary = "(?<=[.!?])\\s+|\n".r

  /** Contiguous spans of `[from, to)` cut AFTER each boundary match, so
    * separators stay attached to the preceding unit and coverage is
    * exact. */
  private def boundarySpans(text: String, from: Int, to: Int,
                            boundary: scala.util.matching.Regex): Seq[(Int, Int)] = {
    val out = ArrayBuffer.empty[(Int, Int)]
    var cursor = from
    boundary.findAllMatchIn(text.substring(from, to)).foreach { m =>
      val cut = from + m.end
      if (cut > cursor && cut < to) { out += ((cursor, cut)); cursor = cut }
    }
    if (cursor < to) out += ((cursor, to))
    out.toSeq
  }

  /** Recursive atomization: segments of `[from, to)` none larger than
    * maxChars unless indivisible — and indivisible segments are window-cut
    * so the cap holds unconditionally. */
  private def atomize(text: String, from: Int, to: Int, level: Seq[Decl],
                      maxChars: Int, all: Seq[Decl]): Seq[(Int, Int)] = {
    val out = ArrayBuffer.empty[(Int, Int)]
    var cursor = from
    def emitGapOrCut(s: Int, e: Int): Unit =
      if (e > s) {
        if (e - s <= maxChars) out += ((s, e))
        else Chunker.chunkText(text.substring(s, e), maxChars, 0)
          .foreach(c => out += ((s + c.startChar, s + c.startChar + c.text.length)))
      }
    val inRange = level.filter(d => d.startChar >= from && d.endChar <= to)
    inRange.foreach { d =>
      if (d.startChar >= cursor) {
        emitGapOrCut(cursor, d.startChar)
        if (d.endChar - d.startChar <= maxChars) out += ((d.startChar, d.endChar))
        else {
          val children = all.filter(c =>
            c.depth == d.depth + 1 && c.startChar >= d.startChar && c.endChar <= d.endChar)
          if (children.isEmpty) emitGapOrCut(d.startChar, d.endChar)
          else out ++= atomize(text, d.startChar, d.endChar, children, maxChars, all)
        }
        cursor = d.endChar
      }
    }
    emitGapOrCut(cursor, to)
    out.toSeq
  }

  /** Greedy left-to-right merge; adjacent output chunks always sum past
    * maxChars (tightness invariant 3). */
  private def mergeAtoms(atoms: Seq[(Int, Int)], text: String, maxChars: Int): Seq[(Int, Int)] = {
    val out = ArrayBuffer.empty[(Int, Int)]
    var curS = -1; var curE = -1
    atoms.foreach { case (s, e) =>
      if (curS < 0) { curS = s; curE = e }
      else if (e - curS <= maxChars) { curE = e }
      else { out += ((curS, curE)); curS = s; curE = e }
    }
    if (curS >= 0) out += ((curS, curE))
    out.toSeq
  }

  private def lineIndex(text: String): Int => Int = {
    val starts = ArrayBuffer(0)
    var i = 0
    while (i < text.length) { if (text.charAt(i) == '\n') starts += i + 1; i += 1 }
    val arr = starts.toArray
    (pos: Int) => {
      var lo = 0; var hi = arr.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (arr(mid) <= pos) lo = mid else hi = mid - 1
      }
      lo
    }
  }
}
