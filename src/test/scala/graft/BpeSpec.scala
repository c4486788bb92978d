package graft

import graft.operators.Bpe

import scala.collection.mutable
import scala.util.Random

/** BPE tokenizer ([[graft.operators.Bpe]]): merge learning on the classic
  * Sennrich dictionary, training≡inference segmentation, exact
  * round-trip on hostile inputs, compression on repetitive corpora, and
  * the corpus-trained query path end to end.
  */
class BpeSpec extends SparkSpec {

  // Sennrich et al. 2016 §3.2 worked example dictionary
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learns the classic merges on the Sennrich dictionary") {
    val merges = Bpe.trainOnDict(sennrich, numMerges = 10)
    // pair counts at step 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (l,o)=7,
    // (o,w)=7, ... — 9-way tie breaks lexicographically: ("e","s")
    assert(merges.head == ("e", "s"))
    // after (e,s): (es,t)=9 and (t,</w>)=9 tie → ("es","t")
    assert(merges(1) == ("es", "t"))
    // after (es,t): (est,</w>)=9 wins alone
    assert(merges(2) == ("est", "</w>"))
    // then the 7-count pairs: ("l","o") before ("o","w") lexicographically
    assert(merges(3) == ("l", "o"))
    assert(merges(4) == ("lo", "w"))
    // "newest" segments to n e w est</w>; "low" to low</w>
    assert(Bpe.tokenizeWord("newest", merges.take(5)).toSeq ==
      Seq("n", "e", "w", "est</w>"))
    assert(Bpe.tokenizeWord("widest", merges.take(5)).toSeq ==
      Seq("w", "i", "d", "est</w>"))
  }

  test("training is deterministic and stops when no pair repeats") {
    val a = Bpe.trainOnDict(sennrich, numMerges = 500)
    val b = Bpe.trainOnDict(sennrich, numMerges = 500)
    assert(a == b)
    assert(a.length < 500, "must stop early once every pair is unique-ish")
    // a dictionary of all-distinct single chars has no pair above
    // minPairCount → zero merges
    assert(Bpe.trainOnDict(Seq(("a", 1L), ("b", 1L)), 10).isEmpty)
  }

  test("tiebreak is UTF-8 byte order, matching the oracle's binary ORDER BY") {
    // U+E000 (UTF-8 EE 80 80) vs U+1F600 (UTF-8 F0 9F 98 80): UTF-16
    // code units order them the OTHER way (0xE000 > surrogate 0xD83D),
    // so a UTF-16 tiebreak would pick the emoji here and diverge from
    // DuckDB's binary ORDER BY l, r
    val emoji = new String(Character.toChars(0x1F600))
    val priv = "\uE000"
    // initial symbols are UTF-16 code units, so the emoji starts as its
    // two surrogate halves; round 1 reunites them (lone surrogates
    // UTF-8-encode as '?' = 0x3F, the smallest l in the opening tie),
    // rounds 2–3 fold the ascii tails, and round 4 is the
    // discriminating tie: (emoji, a</w>) vs (U+E000, b</w>) — UTF-8
    // says EE < F0, UTF-16 the opposite (0xE000 > 0xD83D)
    val merges = Bpe.trainOnDict(Seq((emoji + "a", 3L), (priv + "b", 3L)), 4)
    assert(merges.head == ("\uD83D", "\uDE00"), s"$merges")
    assert(merges(3) == (priv, "b</w>"),
      s"UTF-8 byte order must break the tie toward U+E000: $merges")
    assert(Bpe.utf8Compare(priv, emoji) < 0 && priv.compareTo(emoji) > 0,
      "the fixture genuinely separates the two orders")
  }

  test("inference segmentation equals training segmentation on random corpora") {
    val rnd = new Random(42)
    for (_ <- 0 until 20) {
      val alphabet = "abcd"
      val dict = (0 until 30).map { _ =>
        val w = (0 until (1 + rnd.nextInt(8)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        (w, (1 + rnd.nextInt(9)).toLong)
      }.distinct
      val merges = Bpe.trainOnDict(dict, numMerges = 40)
      // replicate training's own final state per word: apply merges
      // sequentially the way trainOnDict does
      dict.foreach { case (w, _) =>
        val viaInference = Bpe.tokenizeWord(w, merges).toSeq
        val seq = mutable.ArrayBuffer.empty[String]
        w.foreach(ch => seq += ch.toString)
        seq += Bpe.EndOfWord
        merges.foreach { case (l, r) =>
          var i = 0
          while (i < seq.length - 1) {
            if (seq(i) == l && seq(i + 1) == r) {
              seq(i) = seq(i) + seq(i + 1); seq.remove(i + 1)
            } else i += 1
          }
        }
        assert(viaInference == seq.toSeq, s"word $w")
      }
    }
  }

  test("round-trip is exact, including words containing the marker string") {
    val merges = Bpe.trainOnDict(
      Seq(("abab", 4L), ("ab</w>ab", 3L), ("</w>", 2L), ("<//ww>", 2L)), 20)
    val hostile = Seq("abab", "ab</w>ab", "</w>", "</w></w>", "x</w>", "a",
      "<", "w>", "plain")
    hostile.foreach { w =>
      val toks = Bpe.tokenizeWord(w, merges)
      assert(Bpe.detokenizeWord(toks) == w, s"round-trip of $w")
    }
    // random unicode-ish words round-trip too
    val rnd = new Random(7)
    for (_ <- 0 until 200) {
      val w = (0 until (1 + rnd.nextInt(12)))
        .map(_ => ("ab</>wé€" + "\u0001")(rnd.nextInt(9))).mkString
      val toks = Bpe.tokenizeWord(w, Bpe.trainOnDict(Seq((w, 5L)), 10))
      assert(Bpe.detokenizeWord(toks) == w, s"round-trip of ${w.toList}")
    }
  }

  test("merges compress a repetitive corpus below char count") {
    val dict = Seq(("tabletable", 50L), ("table", 80L), ("tablet", 20L))
    val merges = Bpe.trainOnDict(dict, numMerges = 50)
    val memo = mutable.HashMap.empty[String, Array[String]]
    val toks = Bpe.tokenizeText("table tablet tabletable table", merges, memo)
    val nTokens = toks.map(_.length).sum
    // 26 non-space chars; heavy repetition → each word collapses to ≤ 2 tokens
    assert(nTokens <= 8, s"got $nTokens tokens: ${toks.map(_.toSeq).toSeq}")
    // memo actually caches: "table" appears twice, one entry
    assert(memo.contains("table") && memo.size == 3)
  }

  test("merge artifact round-trips through parquet in rank order") {
    val merges = Bpe.trainOnDict(sennrich, numMerges = 10)
    assert(merges.nonEmpty)
    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/merges"
    Bpe.saveMerges(spark, merges, path)
    val loaded = Bpe.loadMerges(spark, path)
    assert(loaded == merges)
    assert(Bpe.tokenizeWord("newest", loaded).toSeq ==
      Bpe.tokenizeWord("newest", merges).toSeq)
  }

  test("corpus-trained query round-trips sf0.001 and bounds hold") {
    val df = graft.queries.TextQueries.qBpeRoundtrip(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length > 0)
    // every doc round-trips: detok_md5 equals md5 of the normalized original
    val expect = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        val id = r.getAs[Long]("doc_id")
        val norm = r.getAs[String]("text").split("\\s+")
          .filter(_.nonEmpty).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
        id -> md.digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }.toMap
    rows.foreach { r =>
      assert(r.getAs[String]("detok_md5") == expect(r.getAs[Long]("doc_id")))
      assert(r.getAs[Boolean]("bounds_ok"))
    }
    // and the tokenizer genuinely compresses this repetitive corpus:
    // bounds_ok only pins n_tokens ≤ chars+words; recompute the real
    // token count to show merges bite (≈1 token/word on sf0.001)
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "text")
    val merges = Bpe.train(docs)
    val memo = mutable.HashMap.empty[String, Array[String]]
    val (nTok, nWord) = docs.collect().foldLeft((0L, 0L)) { case ((t, w), r) =>
      val toks = Bpe.tokenizeText(r.getString(1), merges, memo)
      (t + toks.map(_.length).sum, w + toks.length)
    }
    assert(nTok < nWord * 2, s"merges failed to compress: $nTok tokens / $nWord words")
  }
}
