package graft

import graft.operators.{Chunker, StructuralChunker}
import org.scalatest.funsuite.AnyFunSuite

/** StructuralChunker: declaration-span recovery (brace + indent
  * languages), the four chunk-algebra invariants, and the prose
  * recursive splitter. Seeded randoms only (no Gen date/time). */
class StructuralChunkerSpec extends AnyFunSuite {

  private def invariants(text: String, chunks: Seq[Chunker.Chunk], maxChars: Int): Unit = {
    assert(chunks.map(_.text).mkString == text, "coverage: concat == input")
    assert(chunks.forall(_.text.length <= maxChars), "cap")
    chunks.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.text.length + b.text.length > maxChars,
          s"tightness: adjacent ${a.text.length}+${b.text.length} <= $maxChars")
      case _ =>
    }
    // startChar is the true offset
    chunks.foreach(c => assert(text.substring(c.startChar, c.startChar + c.text.length) == c.text))
  }

  // ---------------- brace languages ----------------

  private val scalaSrc =
    """package demo
      |
      |object Util {
      |  def hello(n: Int): String = {
      |    val brace = "ignore { this }"
      |    // a comment with } braces {
      |    s"hi $n"
      |  }
      |  /* block comment { */
      |  def world(): Unit = {
      |    println("}")
      |  }
      |}
      |
      |class Greeter {
      |  def greet(): String = { "yo" }
      |}
      |""".stripMargin

  test("scala: declaration forest recovered despite braces in strings/comments") {
    val decls = StructuralChunker.parse(scalaSrc, "scala").get
    val byName = decls.map(d => d.name -> d).toMap
    assert(byName.contains("Util") && byName.contains("Greeter"))
    assert(byName.contains("hello") && byName.contains("world") && byName.contains("greet"))
    assert(byName("Util").depth == 0 && byName("hello").depth == 1)
    assert(byName("hello").startLine == 3 && byName("hello").endLine == 7)
    // spans nest: hello inside Util
    assert(byName("hello").startChar >= byName("Util").startChar)
    assert(byName("hello").endChar <= byName("Util").endChar)
  }

  test("scala: a declaration that fits maxChars is never split") {
    val chunks = StructuralChunker.chunk(scalaSrc, "scala", maxChars = 200)
    invariants(scalaSrc, chunks, 200)
    val decls = StructuralChunker.parse(scalaSrc, "scala").get
    decls.filter(d => d.endChar - d.startChar <= 200 && d.depth == 0).foreach { d =>
      assert(chunks.exists(c =>
        c.startChar <= d.startChar && d.endChar <= c.startChar + c.text.length),
        s"decl ${d.name} split across chunks")
    }
  }

  test("java: keyword-less methods detected as block scopes") {
    val java =
      """public class Main {
        |    public static void main(String[] args) {
        |        System.out.println("{");
        |    }
        |    private int add(int a, int b) {
        |        return a + b;
        |    }
        |}
        |""".stripMargin
    val decls = StructuralChunker.parse(java, "java").get
    assert(decls.exists(d => d.kind == "class" && d.name == "Main"))
    // both methods appear as depth-1 scopes
    assert(decls.count(_.depth == 1) == 2)
  }

  test("brace scan: unbalanced input falls back to windowed chunking") {
    val broken = "object A {\n  def f() = {\n    g()\n" // never closed
    val structural = StructuralChunker.chunk(broken, "scala", maxChars = 100)
    val windowed = Chunker.chunkCode(broken, maxChars = 100, snapToBoundaries = true)
    assert(structural == windowed)
  }

  test("go: backtick raw strings hide braces") {
    val go =
      """func main() {
        |    s := `raw { brace`
        |    fmt.Println(s)
        |}
        |func helper() {
        |    return
        |}
        |""".stripMargin
    val decls = StructuralChunker.parse(go, "go").get
    assert(decls.count(_.depth == 0) == 2)
    assert(decls.map(_.name).toSet == Set("main", "helper"))
  }

  // ---------------- indent language ----------------

  private val pySrc =
    """import os
      |
      |@decorator
      |def top(x):
      |    s = '''fake
      |def not_a_decl():
      |'''
      |    return x + 1
      |
      |
      |class Thing:
      |    def method(self):
      |        # def commented_out():
      |        if True:
      |            pass
      |
      |    def other(self):
      |        return 2
      |
      |print(top(1))
      |""".stripMargin

  test("python: indent spans, decorators attached, strings/comments ignored") {
    val decls = StructuralChunker.parse(pySrc, "python").get
    val byName = decls.map(d => d.name -> d).toMap
    assert(byName.keySet == Set("top", "Thing", "method", "other"))
    assert(byName("top").startLine == 2, "decorator line attached")
    assert(byName("top").endLine == 7, "triple-quoted fake decl stays inside span")
    assert(byName("method").depth == 1 && byName("Thing").depth == 0)
    // blank line inside Thing does not close its span
    assert(byName("other").endChar <= byName("Thing").endChar)
    // trailing print is outside every span
    val printPos = pySrc.indexOf("print(top")
    assert(decls.forall(d => printPos >= d.endChar || printPos < d.startChar))
  }

  test("python: chunk invariants hold and small defs are atomic") {
    val chunks = StructuralChunker.chunk(pySrc, "python", maxChars = 150)
    invariants(pySrc, chunks, 150)
    val decls = StructuralChunker.parse(pySrc, "python").get
    decls.filter(d => d.depth == 0 && d.endChar - d.startChar <= 150).foreach { d =>
      assert(chunks.exists(c =>
        c.startChar <= d.startChar && d.endChar <= c.startChar + c.text.length))
    }
  }

  // ---------------- oversized declarations recurse ----------------

  test("oversized class recurses into methods instead of window cuts") {
    val methods = (1 to 8).map { i =>
      s"  def m$i(): Int = {\n" + (1 to 6).map(j => s"    val v$j$i = $j + $i").mkString("\n") + s"\n    $i\n  }"
    }.mkString("\n")
    val src = s"object Big {\n$methods\n}\n"
    val maxChars = 300
    assert(src.length > maxChars)
    val chunks = StructuralChunker.chunk(src, "scala", maxChars = maxChars)
    invariants(src, chunks, maxChars)
    // every method that fits lands whole in exactly one chunk
    val decls = StructuralChunker.parse(src, "scala").get.filter(_.kind == "def")
    assert(decls.nonEmpty)
    decls.filter(d => d.endChar - d.startChar <= maxChars).foreach { d =>
      assert(chunks.exists(c =>
        c.startChar <= d.startChar && d.endChar <= c.startChar + c.text.length),
        s"method ${d.name} window-cut")
    }
  }

  // ---------------- randomized invariants ----------------

  test("randomized synthetic code: invariants at several maxChars") {
    val rnd = new java.util.Random(4242)
    (1 to 25).foreach { _ =>
      val nTop = 1 + rnd.nextInt(5)
      val src = (1 to nTop).map { t =>
        val body = (1 to 1 + rnd.nextInt(12)).map { b =>
          s"  def f${t}_$b(): Int = {\n    val x = ${rnd.nextInt(100)} // c}{\n    x\n  }"
        }.mkString("\n")
        s"object O$t {\n$body\n}"
      }.mkString("\n\n") + "\n"
      Seq(120, 400, 2000).foreach { mc =>
        invariants(src, StructuralChunker.chunk(src, "scala", maxChars = mc), mc)
      }
    }
  }

  test("randomized prose: invariants and paragraph preference") {
    val rnd = new java.util.Random(99)
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    (1 to 25).foreach { _ =>
      val paras = (1 to 1 + rnd.nextInt(8)).map { _ =>
        (1 to 3 + rnd.nextInt(40)).map(_ => words(rnd.nextInt(words.length))).mkString(" ") + "."
      }
      val text = paras.mkString("\n\n")
      Seq(80, 300, 1500).foreach { mc =>
        invariants(text, StructuralChunker.chunkProse(text, mc), mc)
      }
    }
  }

  test("prose: paragraph boundaries preferred over mid-paragraph cuts") {
    val p1 = "aaa bbb ccc." ; val p2 = "ddd eee fff." ; val p3 = "ggg hhh iii."
    val text = s"$p1\n\n$p2\n\n$p3"
    val chunks = StructuralChunker.chunkProse(text, maxChars = 16)
    invariants(text, chunks, 16)
    // every cut lands exactly after a paragraph separator
    chunks.dropRight(1).foreach { c =>
      assert(c.text.endsWith("\n\n"), s"cut inside a paragraph: ${c.text}")
    }
  }

  test("empty and single-char inputs") {
    assert(StructuralChunker.chunk("", "scala").isEmpty)
    assert(StructuralChunker.chunkProse("", 100).isEmpty)
    assert(StructuralChunker.chunk("x", "scala", 10).map(_.text) == Seq("x"))
    assert(StructuralChunker.chunkProse("x", 10).map(_.text) == Seq("x"))
  }

  // ---------------- layout languages (VERDICT r7 item 6) ----------------

  private val haskellSrc =
    """module Demo (run) where
      |
      |import Data.List (sort)
      |
      |-- | double every element {- not a real comment open
      |double :: [Int] -> [Int]
      |double xs = map (*2) xs
      |  where go = "a string with = and module inside"
      |
      |{- block {- nested -} still a comment
      |   run :: looks like a signature but is not -}
      |data Shape
      |  = Circle Double
      |  | Square Double
      |
      |run :: IO ()
      |run = do
      |  let ys = double [1, 2, 3]
      |  print (sort ys)
      |""".stripMargin

  test("haskell: column-0 spans, signature+equation grouped, nested {- -} ignored") {
    val decls = StructuralChunker.parse(haskellSrc, "haskell").get
    val byName = decls.map(d => d.name -> d).toMap
    // signature + equations + indented where are ONE span named double
    assert(byName.contains("double"))
    assert(byName("double").kind == "bind")
    val dbl = haskellSrc.substring(byName("double").startChar, byName("double").endChar)
    assert(dbl.contains("double ::") && dbl.contains("where go"),
      s"signature and where-clause must share the span: $dbl")
    // the commented-out fake signature must not produce a decl
    assert(!decls.exists(d => d.kind == "bind" && d.name == "run" &&
      haskellSrc.substring(d.startChar, d.endChar).contains("looks like")))
    assert(byName.contains("Demo") && byName("Demo").kind == "module")
    assert(byName.contains("Shape") && byName("Shape").kind == "data")
    // the data constructors (indented | lines) stay inside Shape's span
    val shape = haskellSrc.substring(byName("Shape").startChar, byName("Shape").endChar)
    assert(shape.contains("| Square"))
    val chunks = StructuralChunker.chunk(haskellSrc, "haskell", maxChars = 120)
    invariants(haskellSrc, chunks, 120)
  }

  private val ocamlSrc =
    """(* module header (* nested *) comment *)
      |open Printf
      |
      |type shape =
      |  | Circle of float
      |  | Square of float
      |
      |let area s = match s with
      |  | Circle r -> 3.14159 *. r *. r
      |  | Square a -> a *. a
      |
      |let rec fact n =
      |  if n <= 1 then 1 else n * fact (n - 1)
      |
      |let () = printf "%f %d\n" (area (Circle 1.0)) (fact 5)
      |""".stripMargin

  test("ocaml: let/type spans with indented match arms, nested (* *) ignored") {
    val decls = StructuralChunker.parse(ocamlSrc, "ocaml").get
    val byName = decls.map(d => d.name -> d).toMap
    assert(byName.contains("shape") && byName("shape").kind == "type")
    assert(byName.contains("area") && byName("area").kind == "let")
    assert(byName.contains("fact") && byName("fact").kind == "let")
    val area = ocamlSrc.substring(byName("area").startChar, byName("area").endChar)
    assert(area.contains("| Square a"), s"match arms must stay in span: $area")
    val chunks = StructuralChunker.chunk(ocamlSrc, "ocaml", maxChars = 100)
    invariants(ocamlSrc, chunks, 100)
    // a small declaration is never split across chunks
    assert(chunks.exists(_.text.contains(area.trim.take(20))))
  }

  test("rust: prefixed byte literals (b'{') still blank as literals") {
    // the primed-identifier guard is LAYOUT-LANG scoped: in brace langs
    // an identifier char directly before a quote is a literal PREFIX
    // (b'{', L'x'), and skipping the blank would count the quoted brace
    // and mis-scan the closing quote
    val src = "fn f() -> u8 {\n    let c = b'{';\n    c\n}\n\nfn g() {}\n"
    val decls = StructuralChunker.parse(src, "rust").get
    val names = decls.map(_.name)
    assert(names.contains("f") && names.contains("g"),
      s"the quoted brace must not unbalance the scan: $decls")
    val fSpan = decls.find(_.name == "f").get
    assert(src.substring(fSpan.startChar, fSpan.endChar).trim.endsWith("}"),
      "f's span closes at its real brace")
  }

  test("haskell: primed identifiers are not char-literal openers") {
    // before the preceding-char guard, the char-literal lookahead from
    // v's apostrophe found w's within 9 chars and blanked "' = 1 + w'"
    // — deleting the equation's `=` and losing the bind entirely
    val src = "module P where\n\nv' :: Int\nv' = 1 + w'\n\nw' :: Int\nw' = 2\n"
    val decls = StructuralChunker.parse(src, "haskell").get
    val binds = decls.filter(_.kind == "bind")
    assert(binds.size == 2, s"both primed binds detected: $decls")
    val spans = binds.map(d => src.substring(d.startChar, d.endChar))
    assert(spans.exists(_.contains("v' = 1 + w'")),
      s"the equation survives the scan intact: $spans")
  }

  test("layout languages: truncated block comment falls back to windows") {
    val bad = "let f x = x\n(* never closed\nlet g y = y\n"
    assert(StructuralChunker.parse(bad, "ocaml").isEmpty)
    val chunks = StructuralChunker.chunk(bad, "ocaml", maxChars = 20)
    assert(chunks.nonEmpty && chunks.forall(_.text.length <= 20))
    val bad2 = "foo :: Int\n{- open {- forever\nbar = 1\n"
    assert(StructuralChunker.parse(bad2, "haskell").isEmpty)
  }
}
