package graft

import graft.functions.HashKernels
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded random inputs) for the native kernels
  * against slow reference implementations — the DuckDB oracle only
  * exercises them on the real test data; these cover arbitrary inputs. */
class HashKernelsSpec extends AnyFunSuite {

  val rnd = new scala.util.Random(42)

  def randWord(): String = {
    val alphabet = "abcxyz09_é"
    (0 until 1 + rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }
  def randWords(max: Int): List[String] =
    List.fill(rnd.nextInt(max))(randWord())

  def arr(strings: Seq[String]): GenericArrayData =
    new GenericArrayData(strings.map(UTF8String.fromString).toArray[Any])

  def longs(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[Long] =
    a.toLongArray().toSeq

  def utf8s(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  // slow reference n-gram implementation
  def refNGrams(text: String, n: Int): Seq[String] = {
    val toks = text.trim match {
      case "" => Array.empty[String]
      case t => t.split("\\s+")
    }
    if (toks.length < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  test("property: wordNGrams matches the sliding-window reference") {
    for (_ <- 1 to 300) {
      val sep = Seq(" ", "  ", "\t", "\n")(rnd.nextInt(4))
      val text = (if (rnd.nextBoolean()) " " else "") +
        randWords(12).mkString(sep) + (if (rnd.nextBoolean()) "\n" else "")
      val got = utf8s(HashKernels.wordNGrams(UTF8String.fromString(text), 3))
      assert(got == refNGrams(text, 3), s"text=${text.replace("\n", "\\n")}")
    }
  }

  test("wordNGrams edge cases: empty, short, heavy whitespace") {
    assert(utf8s(HashKernels.wordNGrams(UTF8String.fromString(""), 3)).isEmpty)
    assert(utf8s(HashKernels.wordNGrams(UTF8String.fromString("  \t \n"), 3)).isEmpty)
    assert(utf8s(HashKernels.wordNGrams(UTF8String.fromString("a b"), 3)).isEmpty)
    assert(utf8s(HashKernels.wordNGrams(UTF8String.fromString("a \t b\n c"), 3))
      == Seq("a b c"))
  }

  test("property: minhash deterministic, right width, monotone under union") {
    for (_ <- 1 to 200) {
      val xs = randWords(20)
      val ys = randWords(20)
      val a = HashKernels.minhash(arr(xs), 16)
      assert(longs(HashKernels.minhash(arr(xs), 16)) == longs(a), "deterministic")
      assert(a.numElements() == 16)
      // each slot of a superset signature is <= the subset's (min over more)
      val sup = HashKernels.minhash(arr(xs ++ ys), 16)
      longs(sup).zip(longs(a)).foreach { case (s, x) => assert(s <= x) }
      // order and duplication do not change the signature
      assert(longs(HashKernels.minhash(arr(xs.reverse ++ xs), 16)) == longs(a))
    }
  }

  test("property: streamed minhashInto fold == whole-array minhash signature") {
    // the MinhashMergeAgg contract: folding elements one at a time (in any
    // partition split) then merging element-wise mins is bit-identical to
    // the expression kernel over the full set
    for (_ <- 1 to 100) {
      val xs = randWords(30)
      val whole = longs(HashKernels.minhash(arr(xs), 32))
      val cut = xs.length / 3
      val b1 = Array.fill(32)(Long.MaxValue)
      val b2 = Array.fill(32)(Long.MaxValue)
      xs.take(cut).foreach(w => HashKernels.minhashInto(b1, UTF8String.fromString(w)))
      xs.drop(cut).foreach(w => HashKernels.minhashInto(b2, UTF8String.fromString(w)))
      val merged = b1.zip(b2).map { case (x, y) => math.min(x, y) }
      assert(merged.toSeq == whole, "streamed fold + merge must equal the array kernel")
    }
  }

  test("property: simhash60 matches md5-vote reference; set semantics") {
    def refSimhash(tokens: Seq[String]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](60)
      tokens.distinct.foreach { t =>
        md.reset()
        val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.take(15), 16)
        (0 until 60).foreach(b => if (((h >> b) & 1) == 1) votes(b) += 1 else votes(b) -= 1)
      }
      (0 until 60).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
    }
    for (_ <- 1 to 200) {
      val xs = randWords(25)
      val got = HashKernels.simhash60(arr(xs))
      assert(got == refSimhash(xs))
      assert(HashKernels.simhash60(arr(xs.reverse ++ xs)) == got, "set semantics")
      assert((got >>> 60) == 0, "fits in 60 bits")
    }
  }

  // per-bit reference: the retired HOF formulation — one sequential dot
  // product per bit over the same deterministic ±1 hyperplane family
  def refHyperplaneSig(vec: Array[Float], table: Int, bits: Int): Int =
    (0 until bits).map { bit =>
      var dot = 0.0
      for (i <- vec.indices) {
        val h = scala.util.hashing.MurmurHash3.productHash((table, bit, i))
        dot += vec(i).toDouble * (if (h % 2 == 0) 1.0f else -1.0f)
      }
      if (dot >= 0) 1 << bit else 0
    }.sum

  test("property: hyperplaneSig matches the per-bit HOF reference") {
    for (_ <- 1 to 200) {
      val dim = 1 + rnd.nextInt(96)
      val vec = Array.fill(dim)((rnd.nextFloat() - 0.5f) * 4f)
      val table = rnd.nextInt(4)
      val bits = 1 + rnd.nextInt(16)
      val got = HashKernels.hyperplaneSig(
        new GenericArrayData(vec.map(x => x: Any)), table, bits)
      assert(got == refHyperplaneSig(vec, table, bits),
        s"dim=$dim table=$table bits=$bits")
      assert((got >>> bits) == 0, "fits in `bits` bits")
    }
  }
}
