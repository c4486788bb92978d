package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: tokenization,
  * quality scoring, language ID, fingerprinting, chunking and rollup
  * (SURVEY §2.4 C2-C4 / §2.6 A1 re-expressed over the driver tables, plus
  * the beyond-reference text-pipeline ops).
  *
  * All pure Column programs — no UDFs — so they run inside whole-stage
  * codegen and scale linearly with input splits; nothing here shuffles
  * except the rollup (one hash-agg keyed by doc_id).
  */
object TextQueries {

  /** Per-document profile: token stats, quality ratios, language ID,
    * exact-dup fingerprint. */
  def qTextProfile(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      round(meanTokenLen(col("text")), 4).as("mean_tok_len"),
      round(alphaTokenRatio(col("text")), 4).as("alpha_ratio"),
      round(stopwordRatio(col("text")), 4).as("stopword_ratio"),
      langId(col("text")).as("lang_id"),
      fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  val qTextProfileSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(trim(text), '\s+') w,
      |    regexp_split_to_array(trim(lower(text)), '\s+') lw,
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') norm
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, w, lw, norm,
      |    len(list_filter(lw, x -> x IN ('the','and','of','to','is'))) s_en,
      |    len(list_filter(lw, x -> x IN ('der','und','die','das','ist'))) s_de,
      |    len(list_filter(lw, x -> x IN ('le','la','et','les','est'))) s_fr,
      |    len(list_filter(lw, x -> x IN ('el','los','las','es','de'))) s_es
      |  FROM t)
      |SELECT doc_id,
      |  len(w) AS n_tokens,
      |  round(list_aggregate(list_transform(w, x -> length(x)), 'sum') / len(w)::DOUBLE, 4) AS mean_tok_len,
      |  round(len(list_filter(w, x -> regexp_full_match(x, '[A-Za-z]+'))) / len(w)::DOUBLE, 4) AS alpha_ratio,
      |  round(len(list_filter(lw, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) / len(lw)::DOUBLE, 4) AS stopword_ratio,
      |  CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
      |       WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
      |       WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
      |       WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
      |       ELSE 'und' END AS lang_id,
      |  md5(norm) AS fp
      |FROM scored ORDER BY doc_id""".stripMargin

  /** Fixed char-window chunker (C2/C3 semantics: window 200 chars, stride
    * 150 → 50-char overlap), as a generator over sequence() — flatMap
    * expressed relationally so Catalyst can pipeline it. */
  def qChunkDocs(s: SparkSession, d: String): DataFrame = {
    val starts = sequence(lit(1), greatest(length(col("text")), lit(1)), lit(150))
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        explode(starts).as("chunk_start"))
      .select(col("doc_id"), col("chunk_start"),
        col("text").substr(col("chunk_start"), lit(200)).as("chunk"))
      .orderBy(col("doc_id"), col("chunk_start"))
  }

  val qChunkDocsSql: String =
    """SELECT doc_id, st AS chunk_start, substr(text, st, 200) AS chunk
      |FROM documents, LATERAL (
      |  SELECT unnest(generate_series(1, greatest(length(text), 1), 150)) st) starts
      |ORDER BY doc_id, chunk_start""".stripMargin

  /** Structural-chunker gate (C2 upgrade): runs the split-then-merge
    * structural chunker over every document and emits its algebra
    * invariants — exact coverage (concat == input), per-chunk char cap,
    * and the merge-tightness chunk-count bounds
    * ceil(len/cap) ≤ n ≤ 2·ceil(len/cap)+1 — as a relation the oracle
    * recomputes from the parquet alone (recall-gate pattern:
    * `VectorQueries` vs_knn_*_recall). A broken chunker flips a boolean
    * and fails the hash compare. maxChars=256 so sf-sized docs exercise
    * multi-chunk assembly, not the one-chunk trivial case.
    *
    * One narrow scan + one Dataset.map, no shuffle before the output
    * sort — the per-doc validator is embarrassingly parallel at any SF. */
  def qChunkStructural(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cap = 256
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .as[(Long, String, String, Long)]
      .map { case (id, text, lang, nChars) =>
        val chunks = graft.operators.StructuralChunker.chunk(text, lang, cap)
        val covered = chunks.iterator.map(_.text).mkString == text
        val capOk = chunks.forall(_.text.length <= cap)
        val lower = math.max(1L, ((text.length + cap - 1) / cap).toLong)
        val n = chunks.length.toLong
        val boundsOk =
          if (text.isEmpty) n == 0 else n >= lower && n <= 2 * lower + 1
        (id, nChars, covered, capOk, boundsOk)
      }
      .toDF("doc_id", "n_chars", "covered", "cap_ok", "bounds_ok")
      .orderBy(col("doc_id"))
  }

  val qChunkStructuralSql: String =
    """SELECT doc_id, n_chars,
      |  true AS covered, true AS cap_ok, true AS bounds_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Rollup (A1 semantics): reassemble chunks per doc in order, truncate —
    * ordered concat via array_sort(collect_list(struct)) so the agg stays a
    * single hash aggregation (no window + no second shuffle). */
  def qRollupChunks(s: SparkSession, d: String): DataFrame = {
    qChunkDocs(s, d)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_chunks"),
        substring(array_join(
          transform(array_sort(collect_list(struct(col("chunk_start"), col("chunk")))),
            x => x.getField("chunk")), " | "), 1, 300).as("preview"))
      .orderBy(col("doc_id"))
  }

  val qRollupChunksSql: String =
    """WITH chunks AS (
      |  SELECT doc_id, st, substr(text, st, 200) AS chunk
      |  FROM documents, LATERAL (
      |    SELECT unnest(generate_series(1, greatest(length(text), 1), 150)) st) starts)
      |SELECT doc_id, count(*) AS n_chunks,
      |  substr(string_agg(chunk, ' | ' ORDER BY st), 1, 300) AS preview
      |FROM chunks GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Skew-safe two-phase rollup: same output as qRollupChunks, computed
    * with a salt so one hot key cannot overload a single reducer. Phase 1
    * aggregates (doc, range-bucket) partials — a hot doc's chunks spread
    * over many buckets/tasks; phase 2 merges the few partials per doc in
    * bucket order, so the ordered-concat semantics survive exactly (the
    * oracle is the same SQL as the direct rollup). At 100 TB this is the
    * fallback when AQE skew handling isn't enough for an aggregation
    * (AQE splits skewed JOIN partitions, not agg groups). */
  def qRollupSalted(s: SparkSession, d: String): DataFrame = {
    val bucketSpan = 600 // chunks start every 150 chars → ≤4 chunks/bucket
    val phase1 = qChunkDocs(s, d)
      .withColumn("bucket", floor(col("chunk_start") / bucketSpan))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(
        count(lit(1)).as("n_part"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_start"), col("chunk")))),
          x => x.getField("chunk")), " | ").as("part"))
    phase1
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n_part")).as("n_chunks"),
        substring(array_join(transform(
          array_sort(collect_list(struct(col("bucket"), col("part")))),
          x => x.getField("part")), " | "), 1, 300).as("preview"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID distribution vs the labeled lang column (drift report).
    * lang_id is projected BEFORE the groupBy: as a grouping key the
    * when-chain's marker-filter subtrees are duplicated per branch with no
    * common-subexpression elimination, while a Project evaluates them once
    * per row inside codegen (round-1 "What's wrong" #5). */
  def qLangDistribution(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("lang"), col("n_chars"), langId(col("text")).as("lang_id"))
      .groupBy(col("lang"), col("lang_id"))
      .agg(count(lit(1)).as("n"), round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy(col("lang"), col("lang_id"))
  }

  val qLangDistributionSql: String =
    """WITH scored AS (
      |  SELECT lang, n_chars,
      |    len(list_filter(lw, x -> x IN ('the','and','of','to','is'))) s_en,
      |    len(list_filter(lw, x -> x IN ('der','und','die','das','ist'))) s_de,
      |    len(list_filter(lw, x -> x IN ('le','la','et','les','est'))) s_fr,
      |    len(list_filter(lw, x -> x IN ('el','los','las','es','de'))) s_es
      |  FROM (SELECT lang, n_chars, regexp_split_to_array(trim(lower(text)), '\s+') lw FROM documents))
      |SELECT lang,
      |  CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
      |       WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
      |       WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
      |       WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
      |       ELSE 'und' END AS lang_id,
      |  count(*) AS n, round(avg(n_chars), 2) AS avg_chars
      |FROM scored GROUP BY 1, 2 ORDER BY lang, lang_id""".stripMargin

  /** Token accounting per document: whitespace tokens vs BPE-ish subword
    * pre-tokens (the unit a tokenizer budget is written in), plus the
    * chars-per-token ratio used for context-window estimation. */
  def qTokenCounts(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_ws_tokens"),
      bpeTokenCount(col("text")).as("n_bpe_tokens"),
      when(bpeTokenCount(col("text")) === 0, 0.0)
        .otherwise(round(length(col("text")).cast("double") /
          bpeTokenCount(col("text")).cast("double"), 4)).as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  val qTokenCountsSql: String =
    """SELECT doc_id,
      |  len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
      |  CASE WHEN len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) = 0
      |    THEN 0.0 ELSE round(length(text)::DOUBLE /
      |      len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')), 4)
      |  END AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin

  /** CUBE grouping sets over (lang, source): all four grouping
    * combinations in one pass — the reporting shape SURVEY §2.6 notes the
    * Spark engine gets for free over the node tables. */
  def qCubeLangSource(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)
  }

  val qCubeLangSourceSql: String =
    """SELECT lang, source, count(*) AS n,
      |  round(avg(n_chars), 2) AS avg_chars,
      |  count(DISTINCT doc_id) AS n_docs
      |FROM documents GROUP BY CUBE(lang, source)
      |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin

  /** Gopher-style repetition/quality rules (Rae et al. 2021, "Scaling
    * Language Models", Appendix A1.1 — public paper; thresholds are ours):
    * per-document word stats, duplicate-word fraction, top-bigram
    * fraction, and a deterministic pass flag over the rounded signals.
    *
    * One scan, zero shuffles: the word array is projected once and every
    * signal — including the top-bigram count, computed as the longest
    * equal run over the SORTED bigram array — is a per-row Column
    * program, so the whole profile stays inside the document's partition.
    * At 100 TB this is the filter-pass shape a training-data pipeline
    * needs: embarrassingly parallel, no driver involvement, and the flag
    * column prunes the corpus before any expensive downstream stage. */
  def qQualityRules(s: SparkSession, d: String): DataFrame = {
    val withWords = Tables.documents(s, d).select(
      col("doc_id"),
      split(lower(trim(col("text"))), "\\s+").as("w"))
    // bigram array (empty below 2 words), sorted so the most frequent
    // bigram surfaces as the longest consecutive run — one aggregate()
    // pass instead of an explode+groupBy+window shuffle pair
    val withBigrams = withWords.select(
      col("doc_id"), col("w"),
      when(size(col("w")) >= 2,
        sort_array(transform(sequence(lit(1), size(col("w")) - 1),
          i => concat_ws(" ",
            element_at(col("w"), i), element_at(col("w"), i + 1)))))
        .otherwise(array().cast("array<string>")).as("bg"))
    val topRun = expr(
      """aggregate(bg,
        |  named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
        |  (acc, x) -> named_struct(
        |    'prev', x,
        |    'run', IF(acc.prev <=> x, acc.run + 1, 1),
        |    'best', greatest(acc.best, IF(acc.prev <=> x, acc.run + 1, 1))),
        |  acc -> acc.best)""".stripMargin)
    val signals = withBigrams.select(
      col("doc_id"),
      size(col("w")).as("n_words"),
      round(aggregate(col("w"), lit(0L), (acc, x) => acc + length(x))
        .cast("double") / size(col("w")), 4).as("mean_word_len"),
      round(size(filter(col("w"), x => x.rlike("[a-z]")))
        .cast("double") / size(col("w")), 4).as("alpha_word_frac"),
      round(lit(1.0) - size(array_distinct(col("w")))
        .cast("double") / size(col("w")), 4).as("dup_word_frac"),
      round(topRun.cast("double") / greatest(size(col("w")) - 1, lit(1)), 4)
        .as("top_bigram_frac"))
    // the pass flag derives from the ROUNDED signals so both engines
    // evaluate the thresholds on identical values
    signals.select(
      col("doc_id"), col("n_words"), col("mean_word_len"),
      col("alpha_word_frac"), col("dup_word_frac"), col("top_bigram_frac"),
      (col("n_words") >= 30 && col("n_words") <= 10000 &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("alpha_word_frac") >= 0.8 &&
        col("top_bigram_frac") <= 0.1).as("gopher_pass"))
      .orderBy(col("doc_id"))
  }

  val qQualityRulesSql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') w
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, b, count(*) c FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) b
      |    FROM t WHERE len(w) >= 2)
      |  GROUP BY 1, 2),
      |top AS (SELECT doc_id, max(c) topc FROM bg GROUP BY 1),
      |signals AS (
      |  SELECT t.doc_id,
      |    len(w) AS n_words,
      |    round(list_aggregate(list_transform(w, x -> length(x)), 'sum')
      |      / len(w)::DOUBLE, 4) AS mean_word_len,
      |    round(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
      |      / len(w)::DOUBLE, 4) AS alpha_word_frac,
      |    round(1.0 - len(list_distinct(w)) / len(w)::DOUBLE, 4) AS dup_word_frac,
      |    round(coalesce(topc, 0) / greatest(len(w) - 1, 1)::DOUBLE, 4) AS top_bigram_frac
      |  FROM t LEFT JOIN top ON t.doc_id = top.doc_id)
      |SELECT doc_id, n_words, mean_word_len, alpha_word_frac, dup_word_frac,
      |  top_bigram_frac,
      |  (n_words >= 30 AND n_words <= 10000
      |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
      |   AND alpha_word_frac >= 0.8
      |   AND top_bigram_frac <= 0.1) AS gopher_pass
      |FROM signals ORDER BY doc_id""".stripMargin

  /** Character-trigram LM typicality score — the CCNet-style quality
    * signal (Wenzek et al. 2020, "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data", LREC — which ranks docs
    * by LM perplexity; public paper). A full KenLM is out of scope, so
    * the model here is the corpus's own character-trigram distribution:
    * per doc, `bits = mean −log₂ p(tri)` over its trigram occurrences
    * with `p(tri) = count(tri)/total` — low bits ⇒ the doc looks like
    * the corpus, high bits ⇒ atypical character statistics (mojibake,
    * binary spill, wrong language). The train/score split a real
    * pipeline runs (score shard i under the model of all shards) is the
    * same plan with the counts table read from the previous snapshot.
    *
    * Scale shape: the model's cardinality is bounded by |charset|³, NOT
    * by the corpus — the count aggregate is map-side combinable and its
    * result is broadcast back, so the per-doc scoring pass never
    * shuffles document data; the only exchange is the tiny counts agg.
    * The corpus-total rides in via the same broadcast-totals cross join
    * as the mix queries (no empty-frame window). */
  private val charLmCache = Caches.register(
    scala.collection.concurrent.TrieMap.empty[String, DataFrame])

  def qCharLmBits(s: SparkSession, d: String): DataFrame =
    // ingest-once/query-many (Caches lifecycle): the score relation is one
    // row per doc and feeds three queries (bits report, CCNet terciles,
    // curation funnel) — persist(), not localCheckpoint(), so the plan
    // asserts still see the broadcast below the reuse point (NOTES r5)
    charLmCache.getOrElseUpdate(d, charLmBitsUncached(s, d).persist())

  private def charLmBitsUncached(s: SparkSession, d: String): DataFrame = {
    val norm = Tables.documents(s, d).select(
      col("doc_id"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("t"))
    val tris = norm.filter(length(col("t")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), length(col("t")) - 2),
          i => col("t").substr(i, lit(3)))).as("g"))
    val cnt = tris.groupBy(col("g")).agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum(col("c")).as("s"))
    val perdoc = tris.join(broadcast(cnt), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tris"), avg(log2(col("c"))).as("al"))
    norm.select(col("doc_id"))
      .join(perdoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        coalesce(col("n_tris"), lit(0L)).as("n_tris"),
        round(log2(col("s")) - col("al"), 4).as("bits"))
      .orderBy(col("doc_id"))
  }

  val qCharLmBitsSql: String =
    """WITH norm AS (
      |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') t
      |  FROM documents),
      |tri AS (
      |  SELECT doc_id, unnest([substr(t, i, 3) FOR i IN range(1, len(t)-1)]) g
      |  FROM norm WHERE len(t) >= 3),
      |cnt AS (SELECT g, count(*) c FROM tri GROUP BY 1),
      |tot AS (SELECT sum(c) s FROM cnt),
      |perdoc AS (
      |  SELECT tri.doc_id AS doc_id, count(*) n_tris, avg(log2(c)) al
      |  FROM tri JOIN cnt USING (g) GROUP BY 1)
      |SELECT n.doc_id AS doc_id,
      |  coalesce(p.n_tris, 0)::BIGINT AS n_tris,
      |  round(log2(s) - al, 4) AS bits
      |FROM norm n LEFT JOIN perdoc p ON n.doc_id = p.doc_id CROSS JOIN tot
      |ORDER BY doc_id""".stripMargin

  /** CCNet head/middle/tail bucketing (Wenzek et al. 2020 — the paper's
    * actual output artifact: each language's corpus split into perplexity
    * terciles, head = most-fluent third kept for LM training, tail
    * discarded or down-weighted). The LM score is [[qCharLmBits]]'s
    * char-trigram bits; the tercile is an `ntile(3)` per language,
    * total-ordered on (bits NULLS FIRST, doc_id) so assignment is
    * deterministic and engine-identical (sub-3-char docs carry null bits
    * and land in the head by that explicit rule — both engines must
    * spell NULLS FIRST, Spark and DuckDB default opposite ways).
    *
    * Scale shape: the scoring pass is [[qCharLmBits]]'s (broadcast model,
    * zero corpus shuffle); bucketing adds ONE window shuffle partitioned
    * by lang — the same per-language exchange any per-language curation
    * step pays, and skew across languages is bounded by the corpus's
    * language mix, not by any single key. */
  def qCcnetBuckets(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("bits").asc_nulls_first, col("doc_id"))
    qCharLmBits(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id")
      .withColumn("tier", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("bits"),
        col("tier"),
        when(col("tier") === 1, lit("head"))
          .when(col("tier") === 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy(col("doc_id"))
  }

  val qCcnetBucketsSql: String =
    """WITH norm AS (
      |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') t
      |  FROM documents),
      |tri AS (
      |  SELECT doc_id, unnest([substr(t, i, 3) FOR i IN range(1, len(t)-1)]) g
      |  FROM norm WHERE len(t) >= 3),
      |cnt AS (SELECT g, count(*) c FROM tri GROUP BY 1),
      |tot AS (SELECT sum(c) s FROM cnt),
      |perdoc AS (
      |  SELECT tri.doc_id AS doc_id, count(*) n_tris, avg(log2(c)) al
      |  FROM tri JOIN cnt USING (g) GROUP BY 1),
      |bits AS (
      |  SELECT n.doc_id AS doc_id, round(log2(s) - al, 4) AS bits
      |  FROM norm n LEFT JOIN perdoc p ON n.doc_id = p.doc_id CROSS JOIN tot),
      |tiers AS (
      |  SELECT b.doc_id, d.lang, b.bits,
      |    ntile(3) OVER (PARTITION BY d.lang
      |      ORDER BY b.bits ASC NULLS FIRST, b.doc_id) tier
      |  FROM bits b JOIN documents d ON b.doc_id = d.doc_id)
      |SELECT doc_id, lang, bits, tier::INTEGER AS tier,
      |  CASE tier WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
      |    ELSE 'tail' END AS bucket
      |FROM tiers ORDER BY doc_id""".stripMargin

  /** Stupid Backoff bigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation", EMNLP — public: the
    * web-scale estimator S(w₂|w₁) = c(w₁w₂)/c(w₁) when the bigram was
    * seen, else α·S(w₂) with α = 0.4; no discounting, no normalization,
    * chosen by that paper PRECISELY because it reduces to count lookups
    * and therefore distributes). [[qCharLmBits]] measures charset
    * typicality; this is the word-level fluency signal a CCNet-style
    * curation pass actually ranks by. The model trains on the
    * deterministic 90% md5 split ([[PipelineQueries.qSplitAssign]]'s
    * bucket arithmetic) and scores EVERY doc, so the held-out 10%
    * exercises the backoff and OOV paths — a self-scored corpus would
    * never back off (each train doc's bigrams are in its own model).
    * OOV words floor at count 1 (S = α/N), so log never sees zero.
    *
    * Output per doc: n_bigrams, lp = mean log₁₀ S (4 dp — the charlm
    * determinism rule: engine-order double-sum noise collapses),
    * backoff_frac = share of bigrams that backed off (the model-miss
    * rate — high on held-out docs that don't look like the corpus).
    *
    * Scale shape: the unigram model is vocab-bounded → broadcast both
    * lookups; the bigram-model join is the ONE corpus-sized exchange,
    * an equi-join keyed by (w₁,w₂) — the same key Brants' distributed
    * LM shards its servers by, so the plan transfers to a served model
    * verbatim. A doc row fans out only to its own bigram count; the
    * count/avg aggregates are all map-side combinable. */
  def qBackoffLm(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
    val isTrain = (conv(substring(md5(col("doc_id").cast("string")), 1, 4),
      16, 10).cast("int") % 100) < 90
    def bigrams(df: DataFrame): DataFrame = df
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(element_at(col("w"), i).as("w1"),
            element_at(col("w"), i + 1).as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    val train = docs.filter(isTrain)
    val uni = train.select(explode(col("w")).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("cu"))
    val nTot = uni.agg(sum(col("cu")).as("n_tot"))
    val big = bigrams(train).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val perdoc = bigrams(docs)
      .join(big, Seq("w1", "w2"), "left")
      .join(broadcast(uni.select(col("u").as("w1"), col("cu").as("c1"))),
        Seq("w1"), "left")
      .join(broadcast(uni.select(col("u").as("w2"), col("cu").as("c2"))),
        Seq("w2"), "left")
      .crossJoin(broadcast(nTot))
      .select(col("doc_id"),
        when(col("c12").isNotNull, col("c12") / col("c1"))
          .otherwise(lit(0.4) * coalesce(col("c2"), lit(1L)) / col("n_tot"))
          .as("sc"),
        col("c12").isNull.cast("int").as("backed"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log10(col("sc"))), 4).as("lp"),
        round(avg(col("backed")), 4).as("backoff_frac"))
    docs.select(col("doc_id"))
      .join(perdoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lp"), col("backoff_frac"))
      .orderBy(col("doc_id"))
  }

  val qBackoffLmSql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') w,
      |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INTEGER % 100 < 90 is_train
      |  FROM documents),
      |bgf AS (
      |  SELECT doc_id, is_train,
      |    unnest([w[i] FOR i IN range(1, len(w))]) w1,
      |    unnest([w[i+1] FOR i IN range(1, len(w))]) w2
      |  FROM t WHERE len(w) >= 2),
      |uni AS (
      |  SELECT u, count(*) cu
      |  FROM (SELECT unnest(w) u FROM t WHERE is_train) GROUP BY 1),
      |ntot AS (SELECT sum(cu) n_tot FROM uni),
      |big AS (SELECT w1, w2, count(*) c12 FROM bgf WHERE is_train GROUP BY 1, 2),
      |scored AS (
      |  SELECT doc_id,
      |    CASE WHEN c12 IS NOT NULL THEN c12 / c1::DOUBLE
      |         ELSE 0.4 * coalesce(c2, 1) / n_tot::DOUBLE END sc,
      |    CASE WHEN c12 IS NULL THEN 1 ELSE 0 END backed
      |  FROM bgf
      |  LEFT JOIN big USING (w1, w2)
      |  LEFT JOIN (SELECT u w1, cu c1 FROM uni) USING (w1)
      |  LEFT JOIN (SELECT u w2, cu c2 FROM uni) USING (w2)
      |  CROSS JOIN ntot),
      |perdoc AS (
      |  SELECT doc_id, count(*) n_bigrams, round(avg(log10(sc)), 4) lp,
      |    round(avg(backed), 4) backoff_frac
      |  FROM scored GROUP BY 1)
      |SELECT t.doc_id AS doc_id, coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
      |  lp, backoff_frac
      |FROM t LEFT JOIN perdoc ON t.doc_id = perdoc.doc_id
      |ORDER BY doc_id""".stripMargin

  /** PII redaction pass (the pre-filter every training-data pipeline
    * runs): per-source detection counts and the characters removed by
    * redaction. The synthetic corpus carries no PII, so the harness
    * INJECTS it deterministically from doc_id arithmetic — an email on
    * id%7, an IPv4 on id%11, a 32-hex token on id%13 — with the
    * identical construction in the oracle, so both the detectors and
    * the [[graft.functions.TextFunctions.redactPii]] rewrite are
    * value-checked, not just plumbing-checked. */
  def qPiiRedact(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.{redactPii, EmailPat, Ipv4Pat, HexSecretPat}
    val aug = Tables.documents(s, d).select(
      col("doc_id"), col("source"),
      concat(
        col("text"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@"),
            col("source"), lit(".example.com"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(11)) === 0,
          concat(lit(" host 10."), pmod(col("doc_id"), lit(256)),
            lit(".0."), pmod(col("doc_id"), lit(200)), lit(" up")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(lit(" token "), md5(col("doc_id").cast("string"))))
          .otherwise(lit(""))).as("text"))
    aug.select(
      col("source"),
      size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).as("e"),
      size(regexp_extract_all(col("text"), lit(Ipv4Pat), lit(0))).as("i"),
      size(regexp_extract_all(col("text"), lit(HexSecretPat), lit(0))).as("h"),
      (length(col("text")) - length(redactPii(col("text")))).as("delta"))
      .groupBy(col("source"))
      .agg(sum(col("e")).as("n_emails"), sum(col("i")).as("n_ips"),
        sum(col("h")).as("n_secrets"), sum(col("delta")).as("n_chars_redacted"))
      .orderBy(col("source"))
  }

  val qPiiRedactSql: String =
    """WITH aug AS (
      |  SELECT source,
      |    text ||
      |    CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@' ||
      |      source || '.example.com' ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0 THEN ' host 10.' || (doc_id % 256) ||
      |      '.0.' || (doc_id % 200) || ' up' ELSE '' END ||
      |    CASE WHEN doc_id % 13 = 0 THEN ' token ' || md5(doc_id::VARCHAR)
      |      ELSE '' END AS t
      |  FROM documents),
      |red AS (
      |  SELECT source,
      |    len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) e,
      |    len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) i,
      |    len(regexp_extract_all(t, '\b[0-9a-f]{32,}\b')) h,
      |    length(t) - length(
      |      regexp_replace(regexp_replace(regexp_replace(t,
      |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
      |        '\b[0-9a-f]{32,}\b', '[SECRET]', 'g')) AS delta
      |  FROM aug)
      |SELECT source, sum(e)::BIGINT AS n_emails, sum(i)::BIGINT AS n_ips,
      |  sum(h)::BIGINT AS n_secrets, sum(delta)::BIGINT AS n_chars_redacted
      |FROM red GROUP BY source ORDER BY source""".stripMargin

  /** C4-style line-level cleaning (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning with a Unified Text-to-Text
    * Transformer", JMLR — §2.2's public cleaning heuristics): keep only
    * lines that end in terminal punctuation, have ≥ 5 words, and contain
    * neither the "lorem ipsum" boilerplate marker nor a curly brace
    * (code), then keep only documents with ≥ 3 surviving lines. The
    * synthetic corpus has no line structure or punctuation, so — exactly
    * like [[qPiiRedact]]'s injected PII — the harness builds
    * deterministic pseudo-lines (8 words each) and injects terminators /
    * boilerplate / braces from md5(doc_id, line) arithmetic, with the
    * identical construction in the oracle: the md5 hash of the cleaned,
    * reassembled text is compared, so both the rule predicates and the
    * reassembly are value-checked per document.
    *
    * Scale shape: one scan, zero shuffles before the output sort — the
    * whole split→judge→filter→reassemble program is per-row Column
    * algebra (nested higher-order functions), so it runs inside
    * whole-stage codegen and prunes the corpus before any downstream
    * stage, which is precisely where a 100 TB curation run wants its
    * cheapest filter. */
  def qC4Clean(s: SparkSession, d: String): DataFrame = {
    val lineW = 8
    val lines = transform(
      sequence(lit(1), ceil(size(col("w")) / lit(lineW.toDouble)).cast("int")),
      j => {
        val sl = slice(col("w"), (j - lit(1)) * lineW + 1, lit(lineW))
        val h = conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("_"), j.cast("string"))), 1, 8), 16, 10).cast("long")
        concat(concat_ws(" ", sl),
          when(h % 17 === 0, lit(" lorem ipsum")).otherwise(lit("")),
          when(h % 13 === 0, lit(" {")).otherwise(lit("")),
          when(h % 4 =!= 0, lit(".")).otherwise(lit("")))
      })
    val keptLines = filter(col("lines"), t =>
      endswith(t, lit(".")) && !contains(t, lit("lorem ipsum")) &&
        !contains(t, lit("{")) && size(split(t, " ")) >= 5)
    Tables.documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"), lines.as("lines"))
      .select(col("doc_id"), size(col("lines")).as("n_lines"),
        keptLines.as("kept"))
      .select(col("doc_id"), col("n_lines"),
        size(col("kept")).as("n_kept_lines"),
        (size(col("kept")) >= 3).as("c4_keep"),
        md5(array_join(col("kept"), " ")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val qC4CleanSql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents),
      |l AS (
      |  SELECT doc_id, [
      |      array_to_string(w[(j-1)*8+1 : (j-1)*8+8], ' ')
      |      || CASE WHEN ('0x' || substr(md5(doc_id || '_' || j), 1, 8))::BIGINT
      |           % 17 = 0 THEN ' lorem ipsum' ELSE '' END
      |      || CASE WHEN ('0x' || substr(md5(doc_id || '_' || j), 1, 8))::BIGINT
      |           % 13 = 0 THEN ' {' ELSE '' END
      |      || CASE WHEN ('0x' || substr(md5(doc_id || '_' || j), 1, 8))::BIGINT
      |           % 4 <> 0 THEN '.' ELSE '' END
      |    FOR j IN range(1, ceil(len(w) / 8.0)::INT + 1)] lines
      |  FROM t),
      |k AS (
      |  SELECT doc_id, len(lines) n_lines,
      |    list_filter(lines, x ->
      |      ends_with(x, '.') AND NOT contains(x, 'lorem ipsum')
      |      AND NOT contains(x, '{')
      |      AND len(string_split(x, ' ')) >= 5) kept
      |  FROM l)
      |SELECT doc_id, n_lines::INTEGER AS n_lines,
      |  len(kept)::INTEGER AS n_kept_lines,
      |  (len(kept) >= 3) AS c4_keep,
      |  md5(coalesce(array_to_string(kept, ' '), '')) AS clean_md5
      |FROM k ORDER BY doc_id""".stripMargin

  /** Quartile tiers of document length per source (`ntile`) — the
    * "bucket the corpus by a quality signal, then treat tiers
    * differently" pass (e.g. keep tier 4, re-filter tier 1). The window
    * total-orders on (n_chars, doc_id) so tier assignment is
    * deterministic and engine-identical; per-source windows partition
    * the shuffle by source, and the downstream agg reuses that
    * partitioning (no second exchange on source). */
  def qQualityTiers(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("tier", ntile(4).over(w))
      .groupBy(col("source"), col("tier"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("source"), col("tier"))
  }

  val qQualityTiersSql: String =
    """WITH tiers AS (
      |  SELECT source, n_chars,
      |    ntile(4) OVER (PARTITION BY source ORDER BY n_chars, doc_id) tier
      |  FROM documents)
      |SELECT source, tier::INTEGER AS tier, count(*) AS n,
      |  round(avg(n_chars), 4) AS avg_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM tiers GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** BPE tokenizer round-trip gate ([[graft.operators.Bpe]]): train a
    * byte-pair tokenizer on the corpus's word-frequency dictionary (one
    * map-side-combinable shuffle + bounded driver merge loop — the shape
    * every production tokenizer trainer uses), tokenize every document
    * with the broadcast merge table, reconstruct the text from the
    * tokens, and emit per doc:
    *
    *   - `n_words`   — recomputable by the oracle from the parquet;
    *   - `detok_md5` — md5 of the token-reconstructed, whitespace-
    *     normalized text. The oracle computes md5 of the normalized
    *     ORIGINAL, so a hash match proves tokenize→detokenize is exact
    *     on every document — a hash-checked gate for an operator whose
    *     merge loop no SQL engine can express;
    *   - `bounds_ok` — n_words ≤ n_tokens ≤ n_non-space-chars + n_words
    *     (every word ≥ 1 token, every token ≥ 1 char + the word
    *     markers), all-true in the oracle.
    *
    * Tokenization runs in one mapPartitions pass (per-row merge loops
    * are genuinely imperative — the justified non-codegen boundary, same
    * as the multimodal probes) with a per-partition word→tokens memo, so
    * repeated words cost a hash lookup. */
  def qBpeRoundtrip(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Bpe
    import s.implicits._
    // "has at least one non-whitespace char" — rlike('\S') rather than a
    // trim() emptiness test (SQL trim() strips only spaces, JVM
    // String.trim strips all of ≤U+0020). NOT perfectly cross-engine:
    // Java \s is [ \t\n\x0B\f\r] but DuckDB/RE2 \s is [\t\n\f\r ] — the
    // engines disagree exactly on U+000B (vertical tab), in this filter
    // AND in every '\s+' word split the oracle suite uses. The corpus
    // generator never emits U+000B (verified across all SFs), which is
    // what keeps every text gate deterministic; a corpus that may
    // contain it needs the explicit class [ \t\n\x0B\f\r] spelled out on
    // both sides.
    val docs = Tables.documents(s, d)
      .filter(col("text").rlike("\\S"))
      .select(col("doc_id"), col("text"))
    val merges = Bpe.train(docs, numMerges = 200, maxVocab = 65536)
    val bc = s.sparkContext.broadcast(merges)
    docs.as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val wordToks = Bpe.tokenizeText(text, ms, memo)
          val words = wordToks.map(Bpe.detokenizeWord)
          val detok = words.mkString(" ")
          val nTokens = wordToks.iterator.map(_.length).sum
          val nChars = words.iterator.map(_.length).sum
          md.reset()
          val hex = md.digest(detok.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (id, words.length.toLong, hex,
            words.length <= nTokens && nTokens <= nChars + words.length)
        }
      }
      .toDF("doc_id", "n_words", "detok_md5", "bounds_ok")
      .orderBy(col("doc_id"))
  }

  val qBpeRoundtripSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') words
      |  FROM documents WHERE regexp_matches(text, '\S'))
      |SELECT doc_id, len(words)::BIGINT AS n_words,
      |  md5(array_to_string(words, ' ')) AS detok_md5,
      |  TRUE AS bounds_ok
      |FROM w ORDER BY doc_id""".stripMargin

  /** Gopher repetition filters (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * arXiv:2112.11446 — Appendix A's public quality heuristics): reject
    * documents whose content is dominated by internal repetition —
    * duplicate lines, a single over-represented word 2-gram, or
    * duplicated word 5-grams. The synthetic corpus has neither line
    * structure nor natural repetition, so — exactly like [[qPiiRedact]]
    * and [[qC4Clean]] — the harness injects both deterministically, with
    * the identical construction in the oracle:
    *   - repetition: docs with md5(doc_id)%3 = 0 get their first 8 words
    *     re-appended (duplicated 5-grams + a boosted 2-gram);
    *   - lines: the [[qC4Clean]] 8-word pseudo-lines, where line j > 1
    *     is replaced by line 1 when md5(doc_id,j)%5 = 0 (duplicate
    *     lines).
    * Per doc: duplicate-line fraction, duplicate-line character
    * fraction, most-common-2-gram character fraction, and the character
    * fraction covered by duplicated 5-grams (coverage union via the
    * [[DedupQueries.qDedupSubstring]] running-max window — no 5×
    * position explode), plus the paper's keep decision (thresholds 0.30
    * / 0.20 / 0.20 / 0.15, compared on the 6dp-ROUNDED values so both
    * engines take identical branches at boundaries).
    *
    * Scale shape: three passes over the projected word arrays, each
    * shuffling only doc-keyed derived rows (lines, grams, positions —
    * never raw text); the window and every aggregation share the doc_id
    * key. At 100 TB each metric is a map-side-combinable count plus one
    * per-doc window — the same per-document-bounded work as
    * [[qQualityRules]], just over derived units. */
  def qGopherRep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lineW = 8
    val base = Tables.documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w0"))
      .select(col("doc_id"),
        when(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 3 === 0,
          concat(col("w0"), slice(col("w0"), 1, lineW)))
          .otherwise(col("w0")).as("w"))
      .select(col("doc_id"), col("w"),
        length(array_join(col("w"), "")).as("total_chars"))

    // pseudo-lines: 8-word windows; line j>1 duplicates line 1 when
    // md5(doc_id, j) % 5 = 0
    val first8 = concat_ws(" ", slice(col("w"), 1, lineW))
    val lines = transform(
      sequence(lit(1), ceil(size(col("w")) / lit(lineW.toDouble)).cast("int")),
      j => {
        val own = concat_ws(" ", slice(col("w"), (j - lit(1)) * lineW + 1, lit(lineW)))
        val h = conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("_"), j.cast("string"))), 1, 8), 16, 10).cast("long")
        when(j > 1 && h % 5 === 0, first8).otherwise(own)
      })
    val lineAgg = base
      .select(col("doc_id"), explode(lines).as("line"))
      .groupBy(col("doc_id"), col("line"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("ll", length(col("line")))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_lines"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("cnt") >= 2, (col("cnt") - 1) * col("ll")).otherwise(0L)).as("dup_chars"),
        sum(col("cnt") * col("ll")).as("line_chars"))

    // most common word 2-gram, chars = word chars (no separator); ties
    // broken on the smaller gram string so both engines pick one winner
    val top2 = base.filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("total_chars"),
        explode(transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(
            concat(element_at(col("w"), i), lit(" "),
              element_at(col("w"), i + 1)).as("g"),
            (length(element_at(col("w"), i)) +
              length(element_at(col("w"), i + 1))).as("glen")))).as("b"))
      .select(col("doc_id"), col("total_chars"), col("b.g"), col("b.glen"))
      .groupBy(col("doc_id"), col("total_chars"), col("g"), col("glen"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("cnt").desc, col("g").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), (col("cnt") * col("glen")).as("top_chars"))

    // duplicated-5-gram coverage: dup starts cover [pos, pos+4]; a token
    // is covered iff the nearest dup start at-or-before is < 5 back
    val g5 = base.filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("w")) - 4),
          i => struct(i.as("pos"),
            array_join(slice(col("w"), i, lit(5)), " ").as("g")))).as("b"))
      .select(col("doc_id"), col("b.pos"), col("b.g"))
    val dupStarts = g5.join(
      g5.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select(col("doc_id"), col("g")),
      Seq("doc_id", "g"), "left_semi")
      .select(col("doc_id"), col("pos"), lit(0).as("wlen"), lit(0).as("tag"))
    val toks = base
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("w"))),
          p => struct(p.as("pos"),
            length(element_at(col("w"), p)).as("wlen")))).as("t"))
      .select(col("doc_id"), col("t.pos"), col("t.wlen"), lit(1).as("tag"))
    val wCov = Window.partitionBy(col("doc_id"))
      .orderBy(col("pos").asc, col("tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cov5 = toks.unionAll(dupStarts)
      .withColumn("last0", max(when(col("tag") === 0, col("pos"))).over(wCov))
      .filter(col("tag") === 1)
      .groupBy(col("doc_id"))
      .agg(sum(when(col("last0").isNotNull && col("pos") - col("last0") <= 4,
        col("wlen")).otherwise(0L)).as("dup5_chars"))

    val f = base.select(col("doc_id"), col("total_chars"))
      .join(lineAgg, Seq("doc_id"))
      .join(top2, Seq("doc_id"), "left")
      .join(cov5, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        round((col("n_lines") - col("n_distinct")) /
          col("n_lines").cast("double"), 6).as("dup_line_frac"),
        round(coalesce(col("dup_chars") /
          nullif(col("line_chars"), lit(0)).cast("double"), lit(0.0)), 6)
          .as("dup_line_char_frac"),
        round(coalesce(col("top_chars") /
          nullif(col("total_chars"), lit(0)).cast("double"), lit(0.0)), 6)
          .as("top_2gram_frac"),
        round(coalesce(col("dup5_chars") /
          nullif(col("total_chars"), lit(0)).cast("double"), lit(0.0)), 6)
          .as("dup_5gram_frac"))
    f.select(col("doc_id"), col("n_lines"), col("dup_line_frac"),
      col("dup_line_char_frac"), col("top_2gram_frac"), col("dup_5gram_frac"),
      (col("dup_line_frac") <= 0.30 && col("dup_line_char_frac") <= 0.20 &&
        col("top_2gram_frac") <= 0.20 && col("dup_5gram_frac") <= 0.15)
        .as("gopher_keep"))
      .orderBy(col("doc_id"))
  }

  val qGopherRepSql: String =
    """WITH t0 AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w0 FROM documents),
      |tc AS (
      |  SELECT doc_id,
      |    CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 3 = 0
      |      THEN list_concat(w0, w0[1:8]) ELSE w0 END w
      |  FROM t0),
      |tw AS (SELECT doc_id, w, length(array_to_string(w, '')) total_chars FROM tc),
      |l AS (
      |  SELECT doc_id, [
      |      CASE WHEN j > 1 AND ('0x' || substr(md5(doc_id || '_' || j), 1, 8))::BIGINT
      |          % 5 = 0
      |        THEN array_to_string(w[1:8], ' ')
      |        ELSE array_to_string(w[(j-1)*8+1 : (j-1)*8+8], ' ') END
      |    FOR j IN range(1, ceil(len(w) / 8.0)::INT + 1)] lines
      |  FROM tw),
      |pl AS (
      |  SELECT doc_id, line, count(*) cnt, length(line) ll
      |  FROM (SELECT doc_id, unnest(lines) line FROM l) GROUP BY 1, 2, 4),
      |la AS (
      |  SELECT doc_id, sum(cnt)::BIGINT n_lines, count(*) n_distinct,
      |    sum(CASE WHEN cnt >= 2 THEN (cnt - 1) * ll ELSE 0 END) dup_chars,
      |    sum(cnt * ll) line_chars
      |  FROM pl GROUP BY 1),
      |b2 AS (
      |  SELECT doc_id, unnest([{'g': w[i] || ' ' || w[i+1],
      |      'glen': length(w[i]) + length(w[i+1])}
      |    FOR i IN range(1, len(w))], recursive := true)
      |  FROM tw WHERE len(w) >= 2),
      |c2 AS (SELECT doc_id, g, glen, count(*) cnt FROM b2 GROUP BY 1, 2, 3),
      |t2 AS (
      |  SELECT doc_id, cnt * glen top_chars FROM (
      |    SELECT doc_id, glen, cnt, g,
      |      row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g) rn
      |    FROM c2) WHERE rn = 1),
      |g5 AS (
      |  SELECT doc_id, unnest([{'pos': i, 'g': array_to_string(w[i:i+4], ' ')}
      |    FOR i IN range(1, len(w) - 3)], recursive := true)
      |  FROM tw WHERE len(w) >= 5),
      |d5 AS (SELECT doc_id, g FROM g5 GROUP BY 1, 2 HAVING count(*) >= 2),
      |st AS (SELECT g5.doc_id doc_id, g5.pos pos FROM g5 JOIN d5 USING (doc_id, g)),
      |tk AS (
      |  SELECT doc_id, unnest([{'pos': p, 'wlen': length(w[p])}
      |    FOR p IN range(1, len(w) + 1)], recursive := true)
      |  FROM tw),
      |u AS (
      |  SELECT doc_id, pos, wlen, 1 tag FROM tk
      |  UNION ALL SELECT doc_id, pos, 0, 0 FROM st),
      |cv AS (
      |  SELECT doc_id, pos, wlen, tag,
      |    max(CASE WHEN tag = 0 THEN pos END) OVER (
      |      PARTITION BY doc_id ORDER BY pos, tag ROWS UNBOUNDED PRECEDING) last0
      |  FROM u),
      |c5 AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN tag = 1 AND last0 IS NOT NULL AND pos - last0 <= 4
      |      THEN wlen ELSE 0 END) dup5_chars
      |  FROM cv GROUP BY 1),
      |f AS (
      |  SELECT tw.doc_id doc_id, la.n_lines n_lines,
      |    round((la.n_lines - la.n_distinct) / la.n_lines::DOUBLE, 6) dup_line_frac,
      |    round(coalesce(la.dup_chars / nullif(la.line_chars, 0)::DOUBLE,
      |      0.0::DOUBLE), 6) dup_line_char_frac,
      |    round(coalesce(t2.top_chars / nullif(tw.total_chars, 0)::DOUBLE,
      |      0.0::DOUBLE), 6) top_2gram_frac,
      |    round(coalesce(c5.dup5_chars / nullif(tw.total_chars, 0)::DOUBLE,
      |      0.0::DOUBLE), 6) dup_5gram_frac
      |  FROM tw JOIN la USING (doc_id)
      |    LEFT JOIN t2 ON t2.doc_id = tw.doc_id
      |    LEFT JOIN c5 ON c5.doc_id = tw.doc_id)
      |SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac,
      |  top_2gram_frac, dup_5gram_frac,
      |  (dup_line_frac <= 0.30::DOUBLE AND dup_line_char_frac <= 0.20::DOUBLE
      |    AND top_2gram_frac <= 0.20::DOUBLE
      |    AND dup_5gram_frac <= 0.15::DOUBLE) AS gopher_keep
      |FROM f ORDER BY doc_id""".stripMargin

  /** Corpus-level top word 3-grams (the WIMBD corpus-analysis pattern —
    * Elazar et al. 2023, "What's In My Big Data?", arXiv:2310.20707 —
    * public paper; its most-common-n-grams report): the top-20 3-grams
    * by total occurrence count with the containing-doc count alongside,
    * tie-broken on the gram string. The what's-in-my-corpus diagnostic
    * that surfaces boilerplate, templates and contamination candidates
    * before any filter is written.
    *
    * Scale shape: one token-stream pass; the (gram) count is map-side
    * combinable and the distinct-doc count shuffles (gram, doc) pairs
    * once; the top-20 is TakeOrderedAndProject (no global sort, no
    * single-partition window — the [[EventQueries]] assoc-rules
    * lesson). At 100 TB the heavy-hitter report rides a CMS sketch
    * instead ([[graft.functions.SketchAggregates]]); this is the exact
    * form. */
  def qTopNgrams(s: SparkSession, d: String): DataFrame = {
    val grams = Tables.documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("w")) - 2),
          i => array_join(slice(col("w"), i, lit(3)), " "))).as("g"))
    val top = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("n_occ"), count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("g").asc)
      .limit(20)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_occ").desc, col("g").asc)))
      .select(col("rank"), col("g").as("gram"), col("n_occ"), col("n_docs"))
      .orderBy(col("rank"))
  }

  val qTopNgramsSql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents),
      |ng AS (
      |  SELECT doc_id, unnest([array_to_string(w[i:i+2], ' ')
      |    FOR i IN range(1, len(w) - 1)]) g
      |  FROM t WHERE len(w) >= 3),
      |agg AS (
      |  SELECT g, count(*) n_occ, count(DISTINCT doc_id) n_docs
      |  FROM ng GROUP BY 1),
      |top AS (
      |  SELECT g, n_occ, n_docs,
      |    row_number() OVER (ORDER BY n_occ DESC, g) rnk
      |  FROM agg)
      |SELECT rnk::INTEGER AS rank, g AS gram, n_occ::BIGINT AS n_occ,
      |  n_docs::BIGINT AS n_docs
      |FROM top WHERE rnk <= 20 ORDER BY rank""".stripMargin

  /** Windowed co-occurrence PMI (Church & Hanks 1990, "Word association
    * norms, mutual information, and lexicography" — public paper; the
    * word2vec/GloVe co-occurrence statistic): for every unordered word
    * pair within a ±[[PmiWindow]] token window, the pointwise mutual
    * information ln(p(a,b) / (p(a)·p(b))) with pair probability over the
    * emitted-pair space and marginals over the token stream. The
    * collocation report that surfaces multi-word expressions, templated
    * boilerplate and planted test strings in a training corpus — the
    * association-mining sibling of [[qTopNgrams]]'s raw-frequency view
    * (high-PMI pairs are strong associations even at low frequency,
    * which a count-ranked report never shows).
    *
    * Scale shape: pair emission is a per-token constant fan-out
    * (≤ [[PmiWindow]] partners each) built INSIDE one projection
    * (transform/flatten/explode — no self-join, no window function), so
    * the only corpus-sized shuffle is the map-side-combinable pair
    * count; unigram counts ride a second combinable agg over the same
    * scan. Totals come off the AGGREGATED (vocab-bounded) tables, not
    * extra corpus passes, and the final scoring joins two vocab-sized
    * sides (broadcast) before a TakeOrderedAndProject top-30. At 100 TB
    * nothing here is quadratic: pairs are corpus×window, counts are
    * vocab², the report is constant. */
  private val pmiUniCache = Caches.register(
    scala.collection.concurrent.TrieMap.empty[String, DataFrame])
  private val pmiPairCache = Caches.register(
    scala.collection.concurrent.TrieMap.empty[String, DataFrame])

  def qPmi(s: SparkSession, d: String): DataFrame = {
    def toks = Tables.documents(s, d)
      .select(split(trim(col("text")), "\\s+").as("w"))
    // vocab-bounded aggregates, persisted once per sf-dir (the registry
    // lifecycle every compute-once relation here uses) — the corpus is
    // scanned twice total, every rerun reads the cached counts
    val uni = pmiUniCache.getOrElseUpdate(d,
      toks.select(explode(col("w")).as("x"))
        .groupBy(col("x")).agg(count(lit(1)).as("c")).persist())
    // pair list per doc, built in one codegen'd projection: for 1-based
    // position i in [1, n-1], partner offsets 1..min(W, n-i) — the inner
    // sequence() stop is always >= its start, so no descending surprises
    val pc = pmiPairCache.getOrElseUpdate(d,
      toks.filter(size(col("w")) >= 2)
        .select(explode(flatten(transform(
          sequence(lit(1), size(col("w")) - 1), i =>
            transform(sequence(lit(1), least(lit(PmiWindow), size(col("w")) - i)),
              dd => struct(
                least(element_at(col("w"), i.cast("int")),
                  element_at(col("w"), (i + dd).cast("int"))).as("a"),
                greatest(element_at(col("w"), i.cast("int")),
                  element_at(col("w"), (i + dd).cast("int"))).as("b")))))).as("p"))
        .filter(col("p.a") =!= col("p.b"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n_pair")).persist())
    // scalar totals from the vocab-bounded cached aggregates — no extra scan
    val tTot = uni.agg(sum(col("c"))).first().getLong(0).toDouble
    val pTot = pc.agg(sum(col("n_pair"))).first().getLong(0).toDouble
    pc.filter(col("n_pair") >= PmiMinCount)
      .join(broadcast(uni.withColumnRenamed("x", "a")
        .withColumnRenamed("c", "ca")), "a")
      .join(broadcast(uni.withColumnRenamed("x", "b")
        .withColumnRenamed("c", "cb")), "b")
      .select(col("a"), col("b"), col("n_pair"),
        round(log((col("n_pair") / lit(pTot)) /
          ((col("ca") / lit(tTot)) * (col("cb") / lit(tTot)))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(30)
  }

  private val PmiWindow = 3
  private val PmiMinCount = 5

  /** The oracle mirrors the pair construction with a single-variable
    * list comprehension (k encodes (position, offset) as k = 3·(i−1) +
    * (d−1)), the same least/greatest canonical pair, the same a≠b
    * exclusion BEFORE totals, and the identical division order inside
    * ln() so the rounded 4dp values hash-match. */
  val qPmiSql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents),
      |tok AS (SELECT unnest(w) x FROM t),
      |uni AS (SELECT x, count(*) c FROM tok GROUP BY 1),
      |tot AS (SELECT count(*)::DOUBLE T FROM tok),
      |pr AS (
      |  SELECT unnest([
      |    struct_pack(a := least(w[(k//3)+1], w[(k//3)+1 + (k%3)+1]),
      |                b := greatest(w[(k//3)+1], w[(k//3)+1 + (k%3)+1]))
      |    FOR k IN range(3 * (len(w) - 1))
      |    IF (k//3)+1 + (k%3)+1 <= len(w)
      |       AND w[(k//3)+1] <> w[(k//3)+1 + (k%3)+1]]) p
      |  FROM t WHERE len(w) >= 2),
      |pc AS (SELECT p.a a, p.b b, count(*) n_pair FROM pr GROUP BY 1, 2),
      |ptot AS (SELECT count(*)::DOUBLE P FROM pr),
      |scored AS (
      |  SELECT pc.a, pc.b, pc.n_pair,
      |    round(ln((pc.n_pair / ptot.P) /
      |      ((ua.c / tot.T) * (ub.c / tot.T))), 4) pmi
      |  FROM pc, ptot, tot
      |  JOIN uni ua ON ua.x = pc.a JOIN uni ub ON ub.x = pc.b
      |  WHERE pc.n_pair >= 5)
      |SELECT a, b, n_pair::BIGINT AS n_pair, pmi
      |FROM scored ORDER BY pmi DESC, a, b LIMIT 30""".stripMargin

  /** The learned BPE merge table itself, hash-gated (the roundtrip gate
    * above proves tokenize∘detokenize is exact, but ANY merge table
    * round-trips — this gate pins the TRAINER: which pair wins each
    * round, with what corpus-weighted count). First 8 merges of
    * [[graft.operators.Bpe.trainOnDictCounted]] over the standard
    * word-frequency dictionary ([[graft.operators.Bpe.dictQuery]]:
    * one map-side-combinable shuffle, vocabulary-keyed, top-65536 cap —
    * the collect is cap-bounded by construction). The oracle re-derives
    * all 8 rounds in DuckDB with one recursive CTE per round (greedy
    * left-to-right merge = repeated first-occurrence replacement, which
    * cannot create an earlier match because the merged symbol differs
    * from both halves), so argmax, tie-break (count desc, pair lex) and
    * the merge-application semantics are all cross-checked. 8 rounds is
    * the unrolled-oracle budget (the k-means gate's pattern), not an
    * engine limit — the engine trains 200 for the roundtrip gate. */
  def qBpeMerges(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Bpe
    import s.implicits._
    val docs = Tables.documents(s, d)
      .filter(col("text").rlike("\\S")).select(col("text"))
    val dict = Bpe.dictQuery(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    Bpe.trainOnDictCounted(dict, numMerges = 8).zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, c) }
      .toDF("merge_rank", "lhs", "rhs", "n_pair")
      .orderBy(col("merge_rank"))
  }

  val qBpeMergesSql: String = {
    // one (best-pair, recursive-apply, new-words) block per round —
    // programmatically unrolled so all 8 share one body
    def round(i: Int): String = {
      val prev = if (i == 1) "s0" else s"s${i - 1}"
      s"""p$i AS MATERIALIZED (
         |  SELECT pr.l l, pr.r r, sum(c)::BIGINT cnt FROM (
         |    SELECT unnest([{'l': sy[j+1], 'r': sy[j+2]}
         |                   FOR j IN range(len(sy) - 1)]) pr, c
         |    FROM (SELECT string_split(syms, ' ') sy, c FROM $prev))
         |  GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i WHERE cnt >= 2
         |        ORDER BY cnt DESC, l, r LIMIT 1),
         |r$i AS (
         |  SELECT syms, c FROM $prev
         |  UNION ALL
         |  SELECT trim(substr(ps, 1, pos - 1) || ' ' || l || r ||
         |              substr(ps, pos + len(l) + len(r) + 2)), c
         |  FROM (SELECT syms, c, l, r,
         |          ' ' || syms || ' ' ps,
         |          position((' ' || l || ' ' || r || ' ')
         |                   IN (' ' || syms || ' ')) pos
         |        FROM r$i, b$i)
         |  WHERE pos > 0),
         |s$i AS MATERIALIZED (
         |  SELECT syms, c FROM r$i, b$i
         |  WHERE position((' ' || l || ' ' || r || ' ')
         |                 IN (' ' || syms || ' ')) = 0)""".stripMargin
    }
    val rounds = (1 to 8).map(round).mkString(",\n")
    val sel = (1 to 8).map(i =>
      s"SELECT $i::BIGINT merge_rank, l lhs, r rhs, cnt n_pair FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE w0 AS (
       |  SELECT word, count(*)::BIGINT c FROM (
       |    SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
       |                              x -> x <> '')) word
       |    FROM documents WHERE regexp_matches(text, '\\S'))
       |  GROUP BY word),
       |wd AS (SELECT word, c FROM w0 ORDER BY c DESC, word LIMIT 65536),
       |s0 AS MATERIALIZED (
       |  SELECT array_to_string(
       |    [substr(word, j + 1, 1) FOR j IN range(length(word))] || ['</w>'],
       |    ' ') syms, c
       |  FROM wd),
       |$rounds
       |$sel
       |ORDER BY merge_rank""".stripMargin
  }

  /** Vocabulary-growth curve + Heaps-law fit (Heaps 1978, "Information
    * Retrieval: Computational and Theoretical Aspects"; Herdan 1960 —
    * the public V(N) ≈ k·N^β law): walk the corpus in doc_id order,
    * record cumulative (tokens seen, distinct vocabulary) at each
    * corpus decile, and fit β/k by least squares over the log-log
    * points. The tokenizer/vocab-budget planning readout a pipeline
    * consults before committing a vocabulary size — β says how fast
    * new text keeps minting new types at 100 TB.
    *
    * Scale shape: the corpus order is the two-level bucket rank
    * ([[PipelineQueries.qEpochShuffle]]'s idiom — doc_id-range buckets
    * are order-preserving, offsets broadcast; no single-partition
    * window). A token's first appearance is one map-side-combinable
    * `min(rank)` agg over the exploded token stream, so the heavy
    * relation shuffles (token, rank) pairs exactly once; everything
    * after runs on ≤10-row frames. The regression is closed-form
    * covar/var over those 10 points. */
  def qHeapsLaw(s: SparkSession, d: String): DataFrame = {
    val curve = heapsCurve(s, d)
    // Determinism pin (r15 gate failure): covar_pop/var_pop accumulate
    // doubles in whatever order partials arrive, and round(beta, 6)
    // flipped a last digit run-to-run when the value sat on a rounding
    // boundary. The curve is ≤10 rows, so materialize it once in decile
    // order and re-run the SAME aggregate expressions over a pinned
    // single-partition LocalRelation — one fixed accumulation order
    // every run (and the heavy DAG now runs once, not twice).
    val curveRows = curve.orderBy(col("decile")).collect()
    val pinned = s.createDataFrame(
      java.util.Arrays.asList(curveRows: _*), curve.schema).coalesce(1)
    val fit = pinned
      .select(log(col("n_tokens_cum").cast("double")).as("x"),
        log(col("vocab_cum").cast("double")).as("y"))
      .agg((covar_pop(col("x"), col("y")) / var_pop(col("x"))).as("beta"),
        avg(col("x")).as("ax"), avg(col("y")).as("ay"))
      .select(round(col("beta"), 6).as("beta"),
        round(exp(col("ay") - col("beta") * col("ax")), 4).as("k_coef"))
    pinned.crossJoin(broadcast(fit)).orderBy(col("decile"))
  }

  /** [[qHeapsLaw]]'s heavy half — the (decile, n_tokens_cum, vocab_cum)
    * growth curve, exposed so PlanQualitySpec keeps pinning the
    * corpus-sized plan (map-side min(rank) partials, bounded
    * single-partition stages) now that the fit runs over the pinned
    * collected rows. */
  private[graft] def heapsCurve(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val n = docs.count().toDouble // one bounded scalar, like qTCloseness
    val bucketed = docs.select(col("doc_id"), col("text"))
      .withColumn("bucket", floor(col("doc_id") / 65536).cast("long"))
    val wB = w.partitionBy(col("bucket")).orderBy(col("doc_id"))
    val local = bucketed.withColumn("lrank", row_number().over(wB))
    val wOff = w.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("bn"))
      .withColumn("boff", coalesce(sum(col("bn")).over(wOff), lit(0L)))
      .select(col("bucket"), col("boff"))
    // checkpoint: the tokens-per-decile and type-first-appearance
    // branches BOTH read the ranked relation — truncation evaluates the
    // rank (and its corpus scan) once (plan-pinned in PlanQualitySpec)
    val ranked = local.join(broadcast(offsets), "bucket")
      .withColumn("rk", col("boff") + col("lrank"))
      .withColumn("dec",
        least(lit(10L), ceil(lit(10.0) * col("rk").cast("double") / lit(n)))
          .cast("int"))
      .select(col("doc_id"), col("text"), col("rk"), col("dec"))
      .localCheckpoint()
    // tokens seen per decile (whitespace tokens; empty docs count 0)
    val wCum = w.orderBy(col("dec"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val nCum = ranked
      .groupBy(col("dec")).agg(sum(tokenCount(col("text"))).as("ntok"))
      .withColumn("n_tokens_cum", sum(col("ntok")).over(wCum))
    // each TYPE (lowercased token) enters the vocabulary at its first
    // rank — one min-agg over the exploded stream
    val firstDec = ranked
      .select(col("rk"), explode(tokens(lower(col("text")))).as("tok"))
      .groupBy(col("tok")).agg(min(col("rk")).as("frk"))
      .withColumn("fdec",
        least(lit(10L), ceil(lit(10.0) * col("frk").cast("double") / lit(n)))
          .cast("int"))
      .groupBy(col("fdec").as("dec")).agg(count(lit(1)).as("vnew"))
    val curve = nCum
      .join(firstDec, Seq("dec"), "left")
      .withColumn("vocab_cum",
        sum(coalesce(col("vnew"), lit(0L))).over(wCum))
      .filter(col("n_tokens_cum") > 0 && col("vocab_cum") > 0)
      .select(col("dec").as("decile"), col("n_tokens_cum"), col("vocab_cum"))
    curve
  }

  val qHeapsLawSql: String =
    """WITH ranked AS (
      |  SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) rk,
      |    count(*) OVER () nd
      |  FROM documents),
      |dd AS (
      |  SELECT doc_id, text, rk,
      |    least(10, ceil(10.0 * rk / nd))::INT dcl
      |  FROM ranked),
      |ncum AS (
      |  SELECT dcl, sum(sum(CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END))
      |    OVER (ORDER BY dcl) n_tokens_cum
      |  FROM dd GROUP BY dcl),
      |firstrk AS (
      |  SELECT tok, min(rk) frk FROM (
      |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) tok, rk
      |    FROM dd WHERE length(trim(text)) > 0)
      |  GROUP BY tok),
      |vrows AS (
      |  SELECT least(10, ceil(10.0 * frk
      |      / (SELECT count(*) FROM documents)))::INT dcl, count(*) vn
      |  FROM firstrk GROUP BY 1),
      |curve AS (
      |  SELECT n.dcl AS decile, n.n_tokens_cum::BIGINT n_tokens_cum,
      |    sum(coalesce(v.vn, 0)) OVER (ORDER BY n.dcl)::BIGINT vocab_cum
      |  FROM ncum n LEFT JOIN vrows v ON v.dcl = n.dcl),
      |pts AS (
      |  SELECT decile, n_tokens_cum, vocab_cum,
      |    ln(n_tokens_cum::DOUBLE) x, ln(vocab_cum::DOUBLE) y
      |  FROM curve WHERE n_tokens_cum > 0 AND vocab_cum > 0),
      |fit AS (
      |  SELECT round(covar_pop(x, y) / var_pop(x), 6) beta,
      |    round(exp(avg(y) - covar_pop(x, y) / var_pop(x) * avg(x)), 4) k_coef
      |  FROM pts)
      |SELECT decile, n_tokens_cum, vocab_cum, beta, k_coef
      |FROM pts, fit ORDER BY decile""".stripMargin

  /** Zipf rank-frequency fit (Zipf 1949; the standard log-log OLS over
    * the head of the frequency table — public methodology, the
    * companion diagnostic to [[qHeapsLaw]]'s vocabulary-growth fit):
    * ln f = intercept + slope·ln r over the top-1000 terms; a healthy
    * natural-language corpus fits slope ≈ −1, and a corpus whose head
    * is template/boilerplate-dominated bends away — the quick
    * distribution-shape check a curation report includes.
    *
    * Scale shape: one map-side-combinable term count; the rank window
    * runs over the LIMITED top-1000 relation only (TakeOrdered cap
    * first — never a global window over the vocabulary); the OLS
    * moments collapse 1000 rows to one. */
  def qZipfFit(s: SparkSession, d: String): DataFrame = {
    val top = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy(col("t")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("t").asc)
      .limit(1000)
    val ranked = top.withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("f").desc, col("t").asc)))
      .orderBy(col("r"))
      .select(log(col("r").cast("double")).as("lnr"),
        log(col("f").cast("double")).as("lnf"))
    // same determinism pin as qHeapsLaw: the OLS moments must accumulate
    // in one fixed order (rank-ascending, ≤1000 rows) so round(…, 6)
    // can't flip at a boundary run-to-run
    val rankedRows = ranked.collect()
    val pinned = s.createDataFrame(
      java.util.Arrays.asList(rankedRows: _*), ranked.schema).coalesce(1)
    pinned.agg(
      count(lit(1)).as("n_terms"),
      round(covar_pop(col("lnr"), col("lnf")) /
        nullif(var_pop(col("lnr")), lit(0.0)), 6).as("slope"),
      round(avg(col("lnf")) - covar_pop(col("lnr"), col("lnf")) /
        nullif(var_pop(col("lnr")), lit(0.0)) * avg(col("lnr")), 6)
        .as("intercept"),
      // zero-variance head (all head terms at one frequency): Spark
      // corr yields NaN where DuckDB yields NULL — pin NULL on both
      when(var_pop(col("lnf")) === 0.0 || var_pop(col("lnr")) === 0.0,
        lit(null).cast("double"))
        .otherwise(round(pow(corr(col("lnr"), col("lnf")), 2), 6))
        .as("r2"))
  }

  val qZipfFitSql: String =
    """WITH tok AS (
      |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) t
      |  FROM documents),
      |f AS (
      |  SELECT t, count(*) f FROM tok WHERE len(t) > 0
      |  GROUP BY t ORDER BY f DESC, t LIMIT 1000),
      |rk AS (
      |  SELECT ln(row_number() OVER (ORDER BY f DESC, t)::DOUBLE) lnr,
      |    ln(f::DOUBLE) lnf
      |  FROM f)
      |SELECT count(*)::BIGINT n_terms,
      |  round(covar_pop(lnr, lnf) / nullif(var_pop(lnr), 0.0), 6) AS slope,
      |  round(avg(lnf) - covar_pop(lnr, lnf) / nullif(var_pop(lnr), 0.0)
      |    * avg(lnr), 6) AS intercept,
      |  CASE WHEN var_pop(lnf) = 0 OR var_pop(lnr) = 0 THEN NULL
      |       ELSE round(pow(corr(lnr, lnf), 2), 6) END AS r2
      |FROM rk""".stripMargin

  /** Per-document TF-IDF keyword extraction (Spärck Jones 1972 idf —
    * public): the top-3 highest tf·idf terms per document, the cheap
    * keyword tagger a corpus catalog or retrieval-filter layer runs
    * over every document (the statistical twin of the ingest path's
    * heuristic L3 extractor). Ranking is on the 6dp-ROUNDED score with
    * a term tiebreak — the cross-engine float-ranking discipline.
    *
    * Scale shape: (doc, term) tf is one map-side-combinable count; df
    * joins back by term (shuffle keyed by term, never doc×doc); the
    * per-doc top-3 is a doc-keyed rank window eligible for pre-shuffle
    * WindowGroupLimit; N is one bounded scalar. */
  def qTfidfKeywords(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val n = docs.count().toDouble // one bounded scalar, like qHeapsLaw
    val tf = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("t").asc)
    tf.join(df, "t")
      .withColumn("score",
        round(col("tf") * log(lit(n) / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("t").as("term"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  val qTfidfKeywordsSql: String =
    """WITH tf AS (
      |  SELECT doc_id, t, count(*) tf FROM (
      |    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) t
      |    FROM documents)
      |  WHERE len(t) > 0 GROUP BY doc_id, t),
      |df AS (SELECT t, count(*) df FROM tf GROUP BY t),
      |n AS (SELECT count(*)::DOUBLE n FROM documents),
      |sc AS (
      |  SELECT doc_id, t, round(tf * ln(n / df), 6) score
      |  FROM tf JOIN df USING (t), n),
      |rk AS (
      |  SELECT doc_id, t, score, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY score DESC, t) rk
      |  FROM sc)
      |SELECT doc_id, rk, t AS term, score
      |FROM rk WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "td_zipf" -> (qZipfFit _),
    "td_tfidf_keywords" -> (qTfidfKeywords _),
    "td_heaps" -> (qHeapsLaw _),
    "td_pmi" -> (qPmi _),
    "td_bpe_roundtrip" -> (qBpeRoundtrip _),
    "td_bpe_merges" -> (qBpeMerges _),
    "td_gopher_rep" -> (qGopherRep _),
    "td_top_ngrams" -> (qTopNgrams _),
    "td_pii_redact" -> (qPiiRedact _),
    "td_text_profile" -> (qTextProfile _),
    "td_chunk_docs" -> (qChunkDocs _),
    "td_chunk_structural" -> (qChunkStructural _),
    "td_rollup_chunks" -> (qRollupChunks _),
    "td_lang_distribution" -> (qLangDistribution _),
    "td_cube_lang_source" -> (qCubeLangSource _),
    "td_token_counts" -> (qTokenCounts _),
    "td_rollup_salted" -> (qRollupSalted _),
    "td_quality_rules" -> (qQualityRules _),
    "td_c4_clean" -> (qC4Clean _),
    "td_charlm_bits" -> (qCharLmBits _),
    "td_backoff_lm" -> (qBackoffLm _),
    "td_ccnet_buckets" -> (qCcnetBuckets _),
    "td_quality_tiers" -> (qQualityTiers _),
    "td_drift" -> (qDrift _),
    "td_curriculum" -> (qCurriculum _),
    "td_dataset_card" -> (qDatasetCard _),
  )

  def oracles: Map[String, String] = Map(
    "td_zipf" -> qZipfFitSql,
    "td_tfidf_keywords" -> qTfidfKeywordsSql,
    "td_heaps" -> qHeapsLawSql,
    "td_pmi" -> qPmiSql,
    "td_bpe_roundtrip" -> qBpeRoundtripSql,
    "td_bpe_merges" -> qBpeMergesSql,
    "td_gopher_rep" -> qGopherRepSql,
    "td_top_ngrams" -> qTopNgramsSql,
    "td_pii_redact" -> qPiiRedactSql,
    "td_text_profile" -> qTextProfileSql,
    "td_chunk_docs" -> qChunkDocsSql,
    "td_chunk_structural" -> qChunkStructuralSql,
    "td_rollup_chunks" -> qRollupChunksSql,
    "td_lang_distribution" -> qLangDistributionSql,
    "td_cube_lang_source" -> qCubeLangSourceSql,
    "td_token_counts" -> qTokenCountsSql,
    "td_rollup_salted" -> qRollupChunksSql, // provably identical output
    "td_quality_rules" -> qQualityRulesSql,
    "td_c4_clean" -> qC4CleanSql,
    "td_charlm_bits" -> qCharLmBitsSql,
    "td_backoff_lm" -> qBackoffLmSql,
    "td_ccnet_buckets" -> qCcnetBucketsSql,
    "td_quality_tiers" -> qQualityTiersSql,
    "td_drift" -> qDriftSql,
    "td_curriculum" -> qCurriculumSql,
    "td_dataset_card" -> qDatasetCardSql,
  )

  /** Dataset card (Gebru et al. 2021, "Datasheets for Datasets", CACM —
    * public practice): the one-row headline summary a corpus release
    * ships — volume (docs/tokens/chars), composition (languages,
    * sources, the dominant language and its share), and integrity
    * (distinct normalized texts → exact-dup rate) — composed from the
    * SAME kernels the detailed reports use (tokenCount, fingerprint),
    * so the card can never disagree with the reports it summarizes.
    * One corpus scan + a one-row broadcast for the top-language join;
    * every aggregate is map-side combinable. */
  def qDatasetCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val totals = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount(col("text"))).as("n_tokens"),
      sum(length(col("text"))).cast("long").as("n_chars"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(fingerprint(col("text"))).as("n_unique_texts"))
    val topLang = docs.groupBy(col("lang")).count()
      .orderBy(col("count").desc, col("lang"))
      .limit(1)
      .select(col("lang").as("top_lang"), col("count").as("top_lang_docs"))
    totals.crossJoin(broadcast(topLang))
      .select(col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_langs"), col("n_sources"), col("n_unique_texts"),
        round(lit(1.0) - col("n_unique_texts") / col("n_docs").cast("double"), 6)
          .as("dup_rate"),
        col("top_lang"),
        round(col("top_lang_docs") / col("n_docs").cast("double"), 6)
          .as("top_lang_share"))
  }

  val qDatasetCardSql: String =
    """WITH t AS (SELECT
      |    count(*) AS n_docs,
      |    sum(len(regexp_split_to_array(trim(text), '\s+')))::BIGINT AS n_tokens,
      |    sum(length(text))::BIGINT AS n_chars,
      |    count(DISTINCT lang) AS n_langs,
      |    count(DISTINCT source) AS n_sources,
      |    count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
      |      AS n_unique_texts
      |  FROM documents),
      |tl AS (SELECT lang AS top_lang, count(*) AS top_lang_docs
      |  FROM documents GROUP BY 1 ORDER BY count(*) DESC, lang LIMIT 1)
      |SELECT n_docs, n_tokens, n_chars, n_langs, n_sources, n_unique_texts,
      |  round(1.0::DOUBLE - n_unique_texts / n_docs::DOUBLE, 6) AS dup_rate,
      |  top_lang, round(top_lang_docs / n_docs::DOUBLE, 6) AS top_lang_share
      |FROM t, tl""".stripMargin

  /** Curriculum phase assembly (Bengio et al. 2009, "Curriculum
    * Learning", ICML — public paper): order the corpus easy→hard by a
    * deterministic difficulty score (0.7·ln(1+tokens) + 0.3·mean word
    * length — longer documents with longer words are harder; the score
    * is a seam where a model-based difficulty like td_charlm_bits drops
    * in) and cut it into four phases at the exact score quartiles. The
    * per-(phase, lang) report is what a staged-training pipeline checks
    * before emitting phase manifests: does each phase carry enough
    * mass, and does the easy phase concentrate one language?
    *
    * Scale shape: NO global sort — phases come from comparing each
    * score to the three quartile boundaries (one exact-percentile agg →
    * three broadcast doubles), the distributed alternative to a
    * single-partition ntile window (the td_pack_sequences trap). Scores
    * sit on a 6dp grid and boundaries are either grid points or strict
    * interpolations between them, so the boundary comparisons are
    * engine-stable. */
  def qCurriculum(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      expr("size(split(trim(text), '\\\\s+'))").cast("double").as("ntok"),
      length(regexp_replace(col("text"), "\\s", "")).cast("double").as("nchr"))
      .withColumn("score", round(
        lit(0.7) * log(lit(1.0) + col("ntok")) +
          lit(0.3) * (col("nchr") / greatest(col("ntok"), lit(1.0))), 6))
    val qs = scored.agg(
      expr("percentile(score, 0.25)"), expr("percentile(score, 0.5)"),
      expr("percentile(score, 0.75)")).head()
    val (q1, q2, q3) = (qs.getDouble(0), qs.getDouble(1), qs.getDouble(2))
    scored
      .withColumn("phase", lit(1)
        + when(col("score") > q1, 1).otherwise(0)
        + when(col("score") > q2, 1).otherwise(0)
        + when(col("score") > q3, 1).otherwise(0))
      .groupBy(col("phase"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("score")), 4).as("mean_score"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .orderBy(col("phase"), col("lang"))
  }

  val qCurriculumSql: String =
    """WITH sc AS (
      |  SELECT doc_id, lang,
      |    len(regexp_split_to_array(trim(text), '\s+'))::DOUBLE AS ntok,
      |    length(regexp_replace(text, '\s', '', 'g'))::DOUBLE AS nchr
      |  FROM documents),
      |s2 AS (
      |  SELECT doc_id, lang,
      |    round(0.7::DOUBLE * ln(1.0::DOUBLE + ntok)
      |      + 0.3::DOUBLE * (nchr / greatest(ntok, 1.0::DOUBLE)), 6) AS score
      |  FROM sc),
      |qs AS (SELECT quantile_cont(score, 0.25) q1,
      |  quantile_cont(score, 0.5) q2, quantile_cont(score, 0.75) q3 FROM s2)
      |SELECT 1 + (score > q1)::INT + (score > q2)::INT + (score > q3)::INT
      |    AS phase,
      |  lang, count(*)::BIGINT AS n_docs, round(avg(score), 4) AS mean_score,
      |  min(score) AS min_score, max(score) AS max_score
      |FROM s2, qs
      |GROUP BY 1, 2 ORDER BY phase, lang""".stripMargin

  /** Per-source distribution drift — the corpus-monitoring report a
    * training-data pipeline runs between snapshots: split each source's
    * documents into two deterministic halves (doc_id parity — in
    * production, yesterday's snapshot vs today's), build the add-one-
    * smoothed unigram distribution of each half over their UNION
    * vocabulary, and report the KL divergence both ways. A drifting
    * source (vocabulary churn, topic shift, spam injection) shows a
    * rising KL long before downstream evals move.
    *
    * Scale shape: one token explode into a (source, half, term) count —
    * map-side combinable, the only corpus-sized shuffle; the half totals
    * and vocabulary sizes are |sources|-row broadcasts; the KL sum
    * shuffles one row per (source, term) — vocabulary-sized, not
    * corpus-sized. Both KL sums are rounded 4dp (sum-order ulp noise,
    * the established cross-engine float contract). */
  def qDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val cnt = driftCounts(docs.filter(col("doc_id") % 2 === 0))
    val cntB = driftCounts(docs.filter(col("doc_id") % 2 === 1))
    val nd = docs.groupBy(col("source")).agg(
      sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_docs_a"),
      sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("n_docs_b"))
    smoothedKl(cnt, cntB)
      .join(broadcast(nd), "source")
      .select(col("source"), col("n_docs_a"), col("n_docs_b"),
        col("n_tokens_a"), col("n_tokens_b"),
        col("vocab"), col("kl_ab"), col("kl_ba"))
      .orderBy(col("source"))
  }

  /** One side's unigram counts — (source, term, c): the relation the
    * drift kernel consumes and [[graft.streaming.DriftStream]] persists
    * as its reference. */
  private[graft] def driftCounts(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))

  /** THE drift kernel, shared by the batch report and the streaming
    * monitor: add-one-smoothed unigram distributions of two count
    * relations over their per-source UNION vocabulary → per-source
    * two-way KL (4dp), plus the token totals and vocabulary size. Work
    * after the inputs is vocabulary-sized, never corpus-sized. */
  private[graft] def smoothedKl(cntA: DataFrame, cntB: DataFrame): DataFrame = {
    val a = cntA.select(col("source"), col("term"), col("c").as("ca"))
    val b = cntB.select(col("source"), col("term"), col("c").as("cb"))
    val pair = a.join(b, Seq("source", "term"), "full_outer")
      .select(col("source"), col("term"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val vsz = pair.groupBy(col("source")).agg(count(lit(1)).as("v"),
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    pair
      .join(broadcast(vsz), "source")
      .withColumn("pa", (col("ca") + 1).cast("double") / (col("na") + col("v")))
      .withColumn("pb", (col("cb") + 1).cast("double") / (col("nb") + col("v")))
      .groupBy(col("source"))
      .agg(round(sum(col("pa") * log(col("pa") / col("pb"))), 4).as("kl_ab"),
        round(sum(col("pb") * log(col("pb") / col("pa"))), 4).as("kl_ba"))
      .join(broadcast(vsz), "source")
      .select(col("source"), col("na").as("n_tokens_a"),
        col("nb").as("n_tokens_b"), col("v").as("vocab"),
        col("kl_ab"), col("kl_ba"))
  }

  val qDriftSql: String =
    """WITH tok AS (
      |  SELECT source, doc_id % 2 AS h,
      |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) term
      |  FROM documents),
      |cnt AS (SELECT source, h, term, count(*)::BIGINT c FROM tok GROUP BY 1, 2, 3),
      |tot AS (SELECT source, h, count(*)::BIGINT n FROM tok GROUP BY 1, 2),
      |pair AS (
      |  SELECT coalesce(a.source, b.source) source,
      |    coalesce(a.term, b.term) term,
      |    coalesce(a.c, 0) ca, coalesce(b.c, 0) cb
      |  FROM (SELECT source, term, c FROM cnt WHERE h = 0) a
      |  FULL OUTER JOIN (SELECT source, term, c FROM cnt WHERE h = 1) b
      |    ON a.source = b.source AND a.term = b.term),
      |vsz AS (SELECT source, count(*)::BIGINT v FROM pair GROUP BY 1),
      |na AS (SELECT source, n FROM tot WHERE h = 0),
      |nb AS (SELECT source, n FROM tot WHERE h = 1),
      |sm AS (
      |  SELECT p.source,
      |    (ca + 1)::DOUBLE / (coalesce(na.n, 0) + v) pa,
      |    (cb + 1)::DOUBLE / (coalesce(nb.n, 0) + v) pb
      |  FROM pair p JOIN vsz USING (source)
      |  LEFT JOIN na USING (source) LEFT JOIN nb USING (source)),
      |kl AS (
      |  SELECT source, round(sum(pa * ln(pa / pb)), 4) kl_ab,
      |    round(sum(pb * ln(pb / pa)), 4) kl_ba
      |  FROM sm GROUP BY 1),
      |nd AS (
      |  SELECT source,
      |    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT n_docs_a,
      |    sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT n_docs_b
      |  FROM documents GROUP BY 1)
      |SELECT source, n_docs_a, n_docs_b,
      |  coalesce(na.n, 0)::BIGINT AS n_tokens_a,
      |  coalesce(nb.n, 0)::BIGINT AS n_tokens_b,
      |  v AS vocab, kl_ab, kl_ba
      |FROM kl JOIN vsz USING (source)
      |LEFT JOIN na USING (source) LEFT JOIN nb USING (source)
      |JOIN nd USING (source)
      |ORDER BY source""".stripMargin
}
