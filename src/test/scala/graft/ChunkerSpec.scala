package graft

import graft.operators.Chunker
import org.scalatest.funsuite.AnyFunSuite

/** Chunker invariants (SURVEY §5: coverage, overlap, max_chars) —
  * property-style over seeded random inputs. */
class ChunkerSpec extends AnyFunSuite {

  test("code chunker: single small file → one chunk") {
    val chunks = Chunker.chunkCode("a\nb\nc")
    assert(chunks.length == 1)
    assert(chunks.head.text == "a\nb\nc")
  }

  test("code chunker: 450 lines → overlapping 200-line windows") {
    val text = (1 to 450).map(i => s"line$i").mkString("\n")
    val chunks = Chunker.chunkCode(text)
    assert(chunks.length == 3)
    assert(chunks(0).startLine == 0 && chunks(0).endLine == 200)
    assert(chunks(1).startLine == 190 && chunks(1).endLine == 390)
    assert(chunks(2).startLine == 380 && chunks(2).endLine == 450)
    // overlap: last 10 lines of window i == first 10 of window i+1
    val w0 = chunks(0).text.split("\n"); val w1 = chunks(1).text.split("\n")
    assert(w0.takeRight(10).toSeq == w1.take(10).toSeq)
  }

  test("code chunker: oversize window split at max chars") {
    val longLine = "x" * 300
    val text = (1 to 50).map(_ => longLine).mkString("\n") // 15k chars, 50 lines
    val chunks = Chunker.chunkCode(text)
    assert(chunks.forall(_.text.length <= Chunker.CodeMaxChars))
    assert(chunks.map(_.text.length).sum >= text.length) // full coverage
  }

  test("text chunker: coverage and window size") {
    val text = ("The quick brown fox. " * 500).trim // ~10k chars
    val chunks = Chunker.chunkText(text)
    assert(chunks.forall(_.text.length <= Chunker.TextChunkSize))
    assert(chunks.head.startChar == 0)
    // every char position covered by some chunk
    val covered = chunks.map(c => (c.startChar, c.startChar + c.text.length))
      .sortBy(_._1)
    covered.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) => assert(s2 <= e1, "gap between chunks")
      case _ =>
    }
    assert(covered.last._2 == text.length)
  }

  test("empty text → no chunks") {
    assert(Chunker.chunkCode("").isEmpty)
    assert(Chunker.chunkText("").isEmpty)
  }

  test("property: text chunker covers all content with bounded windows") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val n = rnd.nextInt(12000)
      val s = (1 to n).map(_ => (' ' + rnd.nextInt(90)).toChar).mkString
      val chunks = Chunker.chunkText(s, chunkSize = 1500, overlap = 100)
      assert(chunks.forall(_.text.length <= 1500))
      if (s.nonEmpty) {
        val maxEnd = chunks.map(c => c.startChar + c.text.length).max
        assert(maxEnd == s.length)
        assert(chunks.head.startChar == 0)
      } else assert(chunks.isEmpty)
    }
  }

  test("property: code chunker preserves every line when windows fit") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 30) {
      val nLines = 1 + rnd.nextInt(500)
      val s = (1 to nLines).map(_ => rnd.alphanumeric.take(rnd.nextInt(20)).mkString)
        .mkString("\n")
      val lines = s.split("\n", -1)
      val chunks = Chunker.chunkCode(s)
      if (chunks.forall(c => c.startChar == 0)) { // no char-cap splits
        val coveredLines = chunks.flatMap(c => c.startLine until c.endLine).toSet
        assert(coveredLines == lines.indices.toSet)
      }
    }
  }

  test("boundary snapping: window edge slides back to the declaration start") {
    // 250 lines; a def starts at line 195 (0-based) with its body crossing
    // the default window edge at 190
    val lines = (0 until 250).map {
      case 195 => "def boundary_fn():"
      case i => s"    line_$i = $i"
    }
    val text = lines.mkString("\n")
    val plain = Chunker.chunkCode(text)
    val snapped = Chunker.chunkCode(text, snapToBoundaries = true)
    // plain second window starts at the stride (190); snapped waits... no -
    // snapped looks back from 190 and finds no boundary in [180,190], so
    // equals plain there; craft the real case: boundary at 185
    val lines2 = (0 until 250).map {
      case 185 => "def boundary_fn():"
      case i => s"    line_$i = $i"
    }
    val snapped2 = Chunker.chunkCode(lines2.mkString("\n"), snapToBoundaries = true)
    assert(snapped2(1).startLine == 185, s"got ${snapped2(1).startLine}")
    assert(snapped2(1).text.startsWith("def boundary_fn():"))
    // coverage invariant holds either way: every line appears in some chunk
    val covered = snapped2.flatMap(c => (c.startLine until c.endLine)).toSet
    assert((0 until 250).forall(covered.contains))
    // default path unchanged
    assert(plain(1).startLine == 190)
  }
}
