package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis for the training-data pipeline: tokenization,
  * shingling, stable cross-engine hashing, fingerprinting, language ID and
  * quality scoring. Everything here is pure `Column` composition (built-in
  * + higher-order functions), so it stays inside whole-stage codegen and
  * pushes down/prunes like any native expression — no UDFs.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text (empty text → empty array). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-style pre-tokenization: letter runs, single digits, punctuation
    * marks — the GPT-2-family pre-split shape, restricted to constructs
    * RE2 also supports (no lookahead) so a SQL oracle can recompute it.
    * Token count ≈ what a BPE vocabulary would see before merges. */
  val BpeTokenPattern: String = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Normalized form used for exact-dup fingerprints: lowercase, collapsed
    * whitespace. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact-duplicate fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Stable 60-bit hash from md5 — identical value is computable in any
    * engine with md5 + hex→int (DuckDB: `('0x'||substr(md5(s),1,15))::BIGINT`),
    * which keeps hash-dependent operators (minhash/simhash) oracle-checkable. */
  def stableHash64(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles (distinct, first-occurrence order), via the
    * native one-pass [[WordNGrams]] expression. */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      WordNGrams(org.apache.spark.sql.GraftBridge.expression(text), n))

  /** Jaccard similarity of the distinct word n-gram shingle sets. */
  def jaccardShingles(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** MinHash signature (native [[MinHashSignature]] expression): one pass
    * over the shingle array, k avalanche mixes per shingle. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinHashSignature(org.apache.spark.sql.GraftBridge.expression(shingleCol), numHashes))

  /** THE LSH band layout, defined once: explode a `sig` minhash-array
    * column into (…carry cols, band_idx, band_key) rows, where band_key
    * = xxhash64 of the band's contiguous `numHashes / bands` signature
    * slice. Every consumer — the batch LSH join, the tuning curve's
    * nested-band containment gate, the streaming index's postings and
    * the serving probe — shares this one definition, so they cannot
    * drift on slicing or hashing (the containment and stream ≡ batch
    * invariants all assume byte-identical banding). */
  def minhashBands(signed: org.apache.spark.sql.DataFrame,
      numHashes: Int, bands: Int): org.apache.spark.sql.DataFrame = {
    val rows = numHashes / bands
    val carry = signed.columns.filter(_ != "sig").map(col)
    signed.select((carry :+
      posexplode(array((0 until bands).map { bi =>
        xxhash64(slice(col("sig"), bi * rows + 1, rows))
      }: _*)).as(Seq("band_idx", "band_key"))).toIndexedSeq: _*)
  }

  /** SimHash over 60 bits (native [[SimHash60]] expression): md5-derived
    * per-distinct-token hashes voting per bit — value-identical to the SQL
    * form `('0x'||substr(md5(t),1,15))::BIGINT`, so oracle-reproducible. */
  def simhash(tokenCol: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHash60(org.apache.spark.sql.GraftBridge.expression(tokenCol)))

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** |a ∩ b| of two SORTED duplicate-free long arrays (native
    * [[SortedIntersectCount]] merge walk) — the common-neighbor count
    * the triangle/k-truss plans evaluate per edge; replaces
    * `size(array_intersect(a, b))`'s per-row hash set + discarded
    * intersection array. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SortedIntersectCount(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  // --- Language ID (marker-word heuristic; SURVEY §7.7 "beyond-reference") ---

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "las", "es", "de"))

  /** Count of tokens that are marker words for `lang`. */
  def markerScore(tokenCol: Column, lang: String): Column = {
    val set = markers.toMap.getOrElse(lang, Seq.empty)
    size(filter(tokenCol, t => t.isin(set.map(lit(_)): _*)))
  }

  /** Heuristic language ID: argmax marker count with deterministic
    * first-wins tie-break in marker order; "und" (undetermined) when no
    * marker hits. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = markers.map { case (lang, _) => (lang, markerScore(toks, lang)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und")) { case ((lang, score), els) =>
      when(score > 0 && score === best, lit(lang)).otherwise(els)
    }
  }

  // --- Quality scoring (length/punct/stopword ratios) ---

  /** Fraction of tokens that are ASCII-alphabetic words. */
  def alphaTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.rlike("^[A-Za-z]+$"))).cast("double") /
        size(toks).cast("double"))
  }

  /** Fraction of tokens that are English stopwords — crude fluency signal. */
  def stopwordRatio(text: Column): Column = {
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    val toks = tokens(lower(text))
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(stop.map(lit(_)): _*))).cast("double") /
        size(toks).cast("double"))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** PII/secret detection patterns (public-shape heuristics; RE2-safe —
    * no lookaround — so the same pattern runs in Java regex and the
    * DuckDB oracle). Training-data pipelines run these as a redaction
    * pass before anything else sees the text. */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val HexSecretPat = "\\b[0-9a-f]{32,}\\b"

  /** Redact PII in place: emails → [EMAIL], IPv4s → [IP], long hex
    * tokens → [SECRET]. Replacement order is fixed (email first, so an
    * address is never half-eaten by the hex rule) and must stay in sync
    * with the SQL oracle twin. Pure Column program — the redaction pass
    * is a zero-shuffle map at any corpus size. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPat, "[EMAIL]"),
        Ipv4Pat, "[IP]"),
      HexSecretPat, "[SECRET]")
}
