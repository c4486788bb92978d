package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * train-a-tokenizer step of a training-data pipeline, Spark-first.
  *
  * Scale shape (the part that matters at 100 TB): BPE training never
  * iterates over the corpus — it iterates over the WORD-FREQUENCY
  * DICTIONARY, which is what every production tokenizer trainer does.
  * The corpus contributes exactly one map-side-combinable word-count
  * aggregation (one shuffle whose key cardinality is the vocabulary,
  * not the token count); the dictionary is then capped to the top
  * `maxVocab` words by (count desc, word) — a bounded, deterministic
  * TakeOrdered — and the merge loop runs driver-side over that bounded
  * dict. Zipf guarantees the cap loses only the long tail of hapax
  * words, which contribute ~nothing to pair statistics. Applying the
  * tokenizer is embarrassingly parallel: the merge-rank table broadcasts
  * (≤ numMerges entries) and each partition tokenizes its rows with a
  * per-partition word→tokens memo (words repeat massively, so the memo
  * turns the per-word merge loop into a hash lookup for all but the
  * first occurrence per partition).
  *
  * Word granularity is load-bearing for exactness: merges never cross a
  * word boundary, every word's token list concatenates to
  * `word + EndOfWord`, and reconstruction strips exactly one EndOfWord
  * suffix per word — so round-tripping is exact even for hostile words
  * that themselves contain the marker string (the strip removes the one
  * appended copy; embedded copies survive untouched).
  */
object Bpe {

  /** End-of-word marker appended as its own symbol to every word (the
    * classic `</w>`). Tokens carrying it end a word; reconstruction is
    * `tokens.mkString.stripSuffix(EndOfWord)` per word. */
  val EndOfWord = "</w>"

  /** Unsigned UTF-8 byte comparison — the order DuckDB's binary
    * ORDER BY uses. Equals UTF-16 code-unit order on BMP-only strings;
    * diverges once supplementary characters (surrogate pairs) appear. */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** (l, r) pair order under [[utf8Compare]]. */
  private def utf8PairLt(a: (String, String), b: (String, String)): Boolean = {
    val c = utf8Compare(a._1, b._1)
    if (c != 0) c < 0 else utf8Compare(a._2, b._2) < 0
  }

  /** Learn `numMerges` merges from a (word, count) dictionary. Returns
    * the ordered merge list — index = rank, highest-priority first.
    *
    * Deterministic: ties on pair frequency break on the (left, right)
    * pair lexicographically, so the same dict always yields the same
    * merge list on any JVM/partitioning. Stops early when no adjacent
    * pair occurs at least `minPairCount` times (merging a unique pair
    * never helps compression).
    */
  def trainOnDict(
      dict: Seq[(String, Long)],
      numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] =
    trainOnDictCounted(dict, numMerges, minPairCount)
      .map { case (l, r, _) => (l, r) }

  /** [[trainOnDict]] returning each merge WITH its selection-time pair
    * count — the form the `td_bpe_merges` oracle gate hashes (the count
    * pins the pair statistics, not just the argmax sequence). */
  def trainOnDictCounted(
      dict: Seq[(String, Long)],
      numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String, Long)] = {
    // each word as its mutable symbol sequence, weighted by count
    val words: Array[(mutable.ArrayBuffer[String], Long)] = dict.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, c) =>
        val syms = mutable.ArrayBuffer.empty[String]
        w.foreach(ch => syms += ch.toString)
        syms += EndOfWord
        (syms, c)
      }
      .toArray
    val merges = mutable.ArrayBuffer.empty[(String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = pairCounts.iterator.filter(_._2 >= minPairCount)
        .reduceOption { (a, b) =>
          // max count, lexicographic pair tiebreak — fully deterministic.
          // Lexicographic = UTF-8 BYTE order, not Scala's UTF-16
          // code-unit order: the td_bpe_merges oracle is DuckDB's
          // binary ORDER BY l, r, and the two orders diverge for
          // symbols outside the BMP (surrogate pairs sort below
          // U+E000..U+FFFF in UTF-16 but above in UTF-8).
          if (a._2 > b._2) a
          else if (a._2 < b._2) b
          else if (utf8PairLt(a._1, b._1)) a
          else b
        }
      best match {
        case None => exhausted = true
        case Some(((l, r), cnt)) =>
          merges += ((l, r, cnt))
          val lr = l + r
          words.foreach { case (syms, _) =>
            var i = 0
            while (i < syms.length - 1) {
              if (syms(i) == l && syms(i + 1) == r) {
                syms(i) = lr
                syms.remove(i + 1)
                // the new symbol may immediately pair with its left
                // neighbor in a later merge, but within THIS merge we
                // keep scanning forward (standard left-to-right apply)
              } else i += 1
            }
          }
          step += 1
      }
    }
    merges.toSeq
  }

  /** The word-frequency dictionary query behind [[train]] — exposed so
    * the plan guardrail asserts on the SAME DataFrame production runs
    * (partial map-side aggregation + TakeOrdered cap), not a copy. */
  def dictQuery(docs: DataFrame, textCol: String = "text",
      maxVocab: Int = 65536): DataFrame = docs
    .select(explode(split(col(textCol), "\\s+")).as("w"))
    .filter(length(col("w")) > 0)
    .groupBy(col("w")).agg(count(lit(1)).as("c"))
    .orderBy(col("c").desc, col("w"))
    .limit(maxVocab)

  /** Corpus-side training: one word-count shuffle, top-`maxVocab` cap,
    * then [[trainOnDict]] on the bounded dictionary. The collect is
    * bounded by `maxVocab` rows by construction. */
  def train(
      docs: DataFrame,
      textCol: String = "text",
      numMerges: Int = 200,
      maxVocab: Int = 65536): Seq[(String, String)] = {
    val dict = dictQuery(docs, textCol, maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainOnDict(dict, numMerges)
  }

  /** Tokenize ONE word with the learned merges, applying them
    * SEQUENTIALLY IN RANK ORDER — exactly the update [[trainOnDict]]
    * performs, so inference segmentation is identical to training
    * segmentation by construction. (The common greedy
    * lowest-rank-present loop can rarely diverge: a later merge can
    * create an adjacency for an earlier-rank pair that training never
    * saw. Sequential application cannot.) Cost is O(merges · |word|)
    * per DISTINCT word; the per-partition memo in [[tokenizeText]] makes
    * repeats a hash lookup. */
  def tokenizeWord(word: String, merges: Seq[(String, String)]): Array[String] = {
    if (word.isEmpty) return Array.empty
    val syms = mutable.ArrayBuffer.empty[String]
    word.foreach(ch => syms += ch.toString)
    syms += EndOfWord
    merges.foreach { case (l, r) =>
      var i = 0
      while (i < syms.length - 1) {
        if (syms(i) == l && syms(i + 1) == r) {
          syms(i) = syms(i) + syms(i + 1)
          syms.remove(i + 1)
        } else i += 1
      }
    }
    syms.toArray
  }

  /** Tokenize whitespace-normalized text word by word; `memo` caches
    * per-word token arrays across calls (pass one per partition).
    * Deliberately NO `String.trim` here: JVM trim strips every char
    * ≤ U+0020 (so a word starting with a control char would lose it),
    * while `\s+`-split plus an empty filter removes exactly the
    * whitespace — the normalization the DuckDB oracle can mirror. */
  def tokenizeText(
      text: String,
      merges: Seq[(String, String)],
      memo: mutable.HashMap[String, Array[String]]): Array[Array[String]] =
    text.split("\\s+").filter(_.nonEmpty)
      .map(w => memo.getOrElseUpdate(w, tokenizeWord(w, merges)))

  /** Reconstruct the word from its token list — exact by the
    * one-appended-marker argument in the class doc. */
  def detokenizeWord(tokens: Array[String]): String =
    tokens.mkString.stripSuffix(EndOfWord)

  /** Persist the learned merge list as a parquet artifact — the
    * tokenizer's real lifecycle is train-once / apply-for-months, so the
    * merge table is a stored model, not a per-query recomputation. Rank
    * is explicit in the rows (never file order). */
  def saveMerges(s: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import s.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge list saved by [[saveMerges]], in rank order. */
  def loadMerges(s: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] =
    s.read.parquet(path).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
      .toSeq
}
