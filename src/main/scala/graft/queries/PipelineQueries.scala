package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators a training-data pipeline runs after
  * filtering/dedup: deterministic split assignment, domain-mixing rates,
  * and benchmark-contamination checks. All pure Column programs — one
  * hash-agg each, no UDFs — so they hold their shape at any input size.
  */
object PipelineQueries {

  /** Deterministic train/val/test assignment: bucket = first 16 bits of
    * md5(doc_id) mod 100 → 90/5/5. Hash-based (not random) so the split
    * is reproducible across runs, stable under input reordering, and
    * consistent for late-arriving rows of the same id — the property a
    * 100 TB pipeline needs when splits are recomputed incrementally.
    * Output: per (split, lang) counts. */
  def qSplitAssign(s: SparkSession, d: String): DataFrame = {
    val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("int") % 100)
    Tables.documents(s, d)
      .withColumn("split",
        when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("split"), col("lang"))
  }

  val qSplitAssignSql: String =
    """SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
      |  lang, count(*)::BIGINT AS n
      |FROM (SELECT lang,
      |        ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INTEGER % 100 AS b
      |      FROM documents)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** GROUP-leakage-safe splitting — the eval-hygiene fix for
    * [[qSplitAssign]]: keying the train/val/test bucket on the
    * DOCUMENT id lets exact-duplicate documents straddle the split
    * boundary (the model trains on its own test set). Here the bucket
    * keys on the duplicate-group fingerprint (md5 of the text), so
    * every copy of a document lands in ONE split by construction —
    * the "split by group" rule every leakage-aware pipeline applies.
    * The report also MEASURES what the naive split would have leaked:
    * `doc_split_leaky_groups` counts fingerprint groups the id-keyed
    * buckets scatter across splits — the reason this operator exists.
    * (Near-zero at small SF where dup groups are rare; the replicated
    * sf1 corpus, where every document has 10 copies, shows the leak at
    * full force — and PipelineQueriesSpec forces it on a fixture.)
    *
    * Scale shape: two map-side-combinable aggs keyed by fingerprint
    * (group spans, per-split group counts) and a 1-row leak total
    * broadcast-crossed onto the 3-row report. */
  def qSplitGrouped(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("gkey"))
    def bucket(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 4), 16, 10).cast("int") % 100
    def splitOf(b: org.apache.spark.sql.Column) =
      when(b < 90, "train").when(b < 95, "val").otherwise("test")
    val tagged = docs
      .withColumn("gsplit", splitOf(bucket(col("gkey"))))
      .withColumn("dsplit", splitOf(bucket(col("doc_id").cast("string"))))
    val leaky = tagged.groupBy(col("gkey"))
      .agg(countDistinct(col("dsplit")).as("nd"))
      .agg(sum(when(col("nd") > 1, 1L).otherwise(0L))
        .as("doc_split_leaky_groups"))
    tagged.groupBy(col("gsplit").as("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("gkey")).as("n_groups"))
      .crossJoin(broadcast(leaky))
      .orderBy(col("split"))
  }

  val qSplitGroupedSql: String =
    """WITH t AS (
      |  SELECT doc_id, md5(text) gkey,
      |    CASE WHEN gb < 90 THEN 'train' WHEN gb < 95 THEN 'val'
      |         ELSE 'test' END gsplit,
      |    CASE WHEN db < 90 THEN 'train' WHEN db < 95 THEN 'val'
      |         ELSE 'test' END dsplit
      |  FROM (SELECT doc_id, text,
      |          ('0x' || substr(md5(md5(text)), 1, 4))::INTEGER % 100 gb,
      |          ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INTEGER % 100 db
      |        FROM documents)),
      |leaky AS (
      |  SELECT sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT doc_split_leaky_groups
      |  FROM (SELECT gkey, count(DISTINCT dsplit) nd FROM t GROUP BY 1))
      |SELECT gsplit AS split, count(*)::BIGINT AS n_docs,
      |  count(DISTINCT gkey)::BIGINT AS n_groups, doc_split_leaky_groups
      |FROM t CROSS JOIN leaky
      |GROUP BY 1, 4 ORDER BY split""".stripMargin

  /** Domain-mixing rates toward a uniform target across sources: each
    * source's sampling rate = min(1, target_share / actual_share), i.e.
    * total / (k·n). Over-represented domains downsample; the rest pass
    * through. One tiny agg (k rows) joined back nowhere — the rates FEED
    * a sample(), they don't shuffle the corpus. */
  /** Corpus totals (total rows, source count) as a 1-row aggregate
    * broadcast-crossed onto the k-row counts relation — the same values
    * an empty-frame window would compute, without the "moving all data to
    * a single partition" plan (harmless at k rows, but the cross join is
    * obviously safe at ANY k and keeps the bench log WARN-free). */
  private def withTotals(counts: DataFrame): DataFrame =
    counts.crossJoin(broadcast(counts.agg(
      sum(col("n")).as("total"), count(lit(1)).as("n_sources"))))

  def qMixWeights(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    withTotals(counts)
      .withColumn("rate",
        least(lit(1.0), col("total").cast("double") /
          (col("n_sources") * col("n")).cast("double")))
      .withColumn("eff_rows", floor(col("n") * col("rate")).cast("bigint"))
      .select(col("source"), col("n"), round(col("rate"), 6).as("rate"),
        col("eff_rows"))
      .orderBy(col("source"))
  }

  val qMixWeightsSql: String =
    """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |t AS (SELECT sum(n) AS total, count(*) AS k FROM c)
      |SELECT source, n,
      |  round(least(1.0, total::DOUBLE / (k * n)), 6) AS rate,
      |  floor(n * least(1.0, total::DOUBLE / (k * n)))::BIGINT AS eff_rows
      |FROM c, t ORDER BY source""".stripMargin

  /** Temperature-based (α) mixture: target share ∝ share^α, the standard
    * multilingual/domain re-balancing rule (α < 1 upsamples tails, α = 1
    * is pass-through, α → 0 approaches uniform — [[qMixWeights]]'s
    * target). Emitted per source: actual share, target share, and the
    * per-row rate that reshapes the corpus to the target at constant
    * total size (rate > 1 = duplication factor for tail sources — a
    * mixture report states it rather than silently capping). Same scale
    * shape as the other mix queries: one k-row agg + a broadcast cross
    * join, nothing corpus-sized moves. */
  def qMixTemperature(s: SparkSession, d: String, alpha: Double = 0.5): DataFrame = {
    val counts = Tables.documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val share = col("n").cast("double") / col("total").cast("double")
    val powered = withTotals(counts)
      .withColumn("share", share)
      .withColumn("pw", pow(share, lit(alpha)))
    val zDf = broadcast(powered.agg(sum(col("pw")).as("z")))
    powered.crossJoin(zDf)
      .withColumn("target_share", col("pw") / col("z"))
      .select(col("source"), col("n"),
        round(col("share"), 6).as("share"),
        round(col("target_share"), 6).as("target_share"),
        round(col("target_share") * col("total") / col("n"), 6).as("rate"))
      .orderBy(col("source"))
  }

  val qMixTemperatureSql: String =
    """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |t AS (SELECT sum(n) AS total FROM c),
      |p AS (SELECT source, n, n / total::DOUBLE AS share,
      |        pow(n / total::DOUBLE, 0.5) AS pw, total FROM c, t),
      |z AS (SELECT sum(pw) AS z FROM p)
      |SELECT source, n, round(share, 6) AS share,
      |  round(pw / z, 6) AS target_share,
      |  round(pw / z * total / n, 6) AS rate
      |FROM p, z ORDER BY source""".stripMargin

  /** Benchmark-contamination check: training docs sharing ≥1 word-3-gram
    * with the held-out eval set (stand-in: doc_id % 97 = 0). The join is
    * keyed by shingle against the DISTINCT eval shingle set — at scale
    * that set is small enough to broadcast, so the corpus never shuffles;
    * n is a parameter (3 fits the synthetic corpus; real leakage checks
    * run 8-13). Output: per-source contaminated-doc counts. */
  def qContamination(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val isEval = col("doc_id") % 97 === 0
    val evalShingles = docs.filter(isEval)
      .select(explode(col("sh")).as("shingle")).distinct()
    val trainPostings = docs.filter(!isEval)
      .select(col("doc_id"), col("source"), explode(col("sh")).as("shingle"))
    trainPostings
      .join(broadcast(evalShingles), "shingle")
      .select(col("doc_id"), col("source")).distinct()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_contaminated"))
      .orderBy(col("source"))
  }

  val qContaminationSql: String =
    """WITH tok AS (
      |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') w FROM documents),
      |sh AS (
      |  SELECT doc_id, source,
      |    unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN range(1, len(w)-1)])) s
      |  FROM tok WHERE len(w) >= 3),
      |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
      |flagged AS (
      |  SELECT DISTINCT a.doc_id, a.source
      |  FROM sh a JOIN ev USING (s) WHERE a.doc_id % 97 <> 0)
      |SELECT source, count(*)::BIGINT AS n_contaminated
      |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin

  /** Bloom-filter decontamination — the broadcast-shrinking scale variant
    * of [[qContamination]]. The exact check broadcasts the distinct eval
    * SHINGLE STRINGS; at a 100 TB eval corpus that set outgrows executor
    * memory long before the bloom twin does: the sketch stores xxhash64
    * bits only (~2.9 MB per million shingles at fpp 1e-4, ~20× smaller
    * than the strings), and the probe (`exists(sh, might_contain)`) fuses
    * into the corpus scan — NO join, NO shuffle on the training side.
    *
    * The trade is bounded, one-sided error, and the gate checks BOTH
    * sides of the contract per source:
    *   - `superset_ok`: every exactly-contaminated doc is bloom-flagged —
    *     structural (blooms have no false negatives), must be all-true;
    *   - `fp_ok`: bloom-only extras ≤ budget, where budget =
    *     max(ceil(3·fpp·Σ m_doc), 5) and m_doc is the doc's distinct
    *     shingle count — 3× the expected-FP bound fpp·Σm, floored so
    *     Poisson noise at tiny scale can't flip it; sketches are
    *     deterministic given data + the fixed xxhash64 seed.
    * The oracle recomputes n_exact and budget relationally and expects
    * TRUE for both booleans, so the DuckDB hash gate pins the
    * build→broadcast→probe pipeline end to end. */
  def qContaminationBloom(s: SparkSession, d: String): DataFrame = {
    val fpp = 1e-4
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val isEval = col("doc_id") % 97 === 0
    val evalShingles = docs.filter(isEval)
      .select(explode(col("sh")).as("shingle")).distinct()
    // honest production shape: count the key set, size the sketch for it
    val nEval = math.max(evalShingles.count(), 1L)
    val bloomBytes = evalShingles
      .agg(graft.functions.BloomFunctions
        .bloomAgg(col("shingle"), nEval, fpp).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val bloom = lit(bloomBytes)
    val train = docs.filter(!isEval)
    val flags = train.select(
      col("doc_id"), col("source"), size(col("sh")).as("m"),
      exists(col("sh"),
        x => graft.functions.BloomFunctions.bloomMightContain(bloom, x))
        .as("bloom_hit"))
    // exact flags (the qContamination plan) — gate-side reference only
    val exact = train
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .join(broadcast(evalShingles), "shingle")
      .select(col("doc_id")).distinct()
      .withColumn("exact_hit", lit(true))
    val budget = greatest(ceil(lit(3 * fpp) * sum(col("m"))), lit(5L))
    flags.join(exact, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        sum(when(col("exact_hit"), 1L).otherwise(0L)).as("n_exact"),
        budget.as("budget"),
        expr("bool_and(IF(coalesce(exact_hit, false), bloom_hit, true))")
          .as("superset_ok"),
        (sum(when(col("bloom_hit"), 1L).otherwise(0L)) -
          sum(when(col("exact_hit"), 1L).otherwise(0L)) <= budget).as("fp_ok"))
      .orderBy(col("source"))
  }

  val qContaminationBloomSql: String =
    """WITH tok AS (
      |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') w FROM documents),
      |g AS (
      |  SELECT doc_id, source,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN range(1, len(w)-1)]) sh
      |  FROM tok WHERE len(w) >= 3),
      |ev AS (SELECT DISTINCT unnest(sh) s FROM g WHERE doc_id % 97 = 0),
      |train AS (SELECT doc_id, source, sh, len(sh) AS m FROM g WHERE doc_id % 97 <> 0),
      |con AS (
      |  SELECT DISTINCT a.doc_id
      |  FROM (SELECT doc_id, unnest(sh) s FROM train) a JOIN ev USING (s))
      |SELECT t.source,
      |  count(*) FILTER (WHERE c.doc_id IS NOT NULL)::BIGINT AS n_exact,
      |  greatest(CAST(ceil(3 * 0.0001 * sum(t.m)) AS BIGINT), 5) AS budget,
      |  TRUE AS superset_ok,
      |  TRUE AS fp_ok
      |FROM train t LEFT JOIN con c USING (doc_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-source quota cap (the C4/RefinedWeb-style per-domain limit): keep
    * at most K docs per source, chosen by deterministic md5 order (not
    * arrival order — reproducible, reorder-stable, and unbiased w.r.t.
    * position in the crawl). At 100 TB the quota prunes mega-domains
    * before any expensive stage; the plan matters more than the arithmetic:
    * `row_number ≤ K` over (source | hash) plans with a pre-shuffle
    * WindowGroupLimit, so each map task forwards at most K candidate rows
    * per source instead of shuffling whole domains to find their top-K —
    * the same guardrail PlanQualitySpec pins for the relational top-k. */
  def qSourceQuota(s: SparkSession, d: String, k: Int = 15): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("source"), col("rk"))
  }

  val qSourceQuotaSql: String =
    """SELECT source, doc_id, rk FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 15 ORDER BY source, rk""".stripMargin

  /** The sampler the mix weights feed: deterministic hash-Bernoulli per
    * row — keep a doc iff its md5 bucket (of 10000) falls under
    * floor(rate·10000) for its source. Hash-based (not rand()) so the
    * sampled dataset is reproducible, stable under reordering, and
    * consistent on incremental recompute — and the whole pass is one
    * broadcast join of the k-row rate table against the corpus scan.
    * Output: per-source kept counts vs targets. */
  def qMixSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val rates = withTotals(counts)
      .withColumn("rate",
        least(lit(1.0), col("total").cast("double") /
          (col("n_sources") * col("n")).cast("double")))
      .select(col("source").as("r_source"), col("n"), col("rate"))
    val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("long") % 10000)
    docs.join(broadcast(rates), col("source") === col("r_source"))
      .filter(bucket < floor(col("rate") * 10000))
      .groupBy(col("source"))
      // n is join-constant per source group; min (not first) makes the
      // determinism self-evident (first() is partition-order dependent)
      .agg(count(lit(1)).as("n_kept"), min(col("n")).as("n_total"))
      .withColumn("kept_frac",
        round(col("n_kept").cast("double") / col("n_total").cast("double"), 4))
      .orderBy(col("source"))
  }

  val qMixSampleSql: String =
    """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |t AS (SELECT sum(n) AS total, count(*) AS k FROM c),
      |r AS (SELECT source, n,
      |        least(1.0, total::DOUBLE / (k * n)) AS rate FROM c, t),
      |kept AS (
      |  SELECT d.source, count(*) AS n_kept
      |  FROM documents d JOIN r ON d.source = r.source
      |  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 6))::BIGINT % 10000
      |        < floor(r.rate * 10000)
      |  GROUP BY 1)
      |SELECT r.source, kept.n_kept, r.n AS n_total,
      |  round(kept.n_kept::DOUBLE / r.n, 4) AS kept_frac
      |FROM kept JOIN r ON kept.source = r.source
      |ORDER BY r.source""".stripMargin

  /** Sequence packing — the step that turns a filtered corpus into
    * fixed-length training sequences: concatenate documents in doc_id
    * order and chunk the token stream at `SeqLen` boundaries (the
    * GPT-style pack-then-split shape). Output per document: its token
    * count, the sequence its first token lands in, and how many
    * sequences it spans — the relation a data loader needs to map
    * sequences back to documents.
    *
    * Scale shape: the global ordered prefix sum is computed WITHOUT the
    * naive `sum().over(orderBy(doc_id))` window, which plans as a
    * SINGLE-partition sort at any size (the canonical cumsum scale
    * trap). Instead: range-repartition by doc_id → per-partition token
    * sums (P rows, collected) → exclusive partition offsets broadcast
    * back → PARTITION-LOCAL running-sum window + offset. Every stage is
    * parallel; the only driver data is one row per partition. The
    * ranged relation is persisted per sf-dir so the offsets and the
    * main pass see identical partition ids (and repeated bench calls
    * reuse it, like the shingle relation). */
  val SeqLen = 2048

  private val packCache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def rangedTokens(s: SparkSession, d: String): DataFrame =
    packCache.getOrElseUpdate(d, {
      val parts = math.max(2, s.sparkContext.defaultParallelism / 4)
      Tables.documents(s, d)
        .select(col("doc_id"), tokenCount(col("text")).as("n"))
        .repartitionByRange(parts, col("doc_id"))
        .withColumn("pid", spark_partition_id())
        .persist()
    })

  def qPackSequences(s: SparkSession, d: String): DataFrame = {
    val ranged = rangedTokens(s, d)
    // exclusive prefix over the per-partition sums: P rows on the driver
    val psums = ranged.groupBy(col("pid")).agg(sum(col("n")).as("psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = psums.scanLeft((0, 0L)) { case ((_, acc), (pid, ps)) =>
      (pid, acc + ps)
    }.init.zip(psums).map { case ((_, off), (pid, _)) => (pid, off) }
    val odf = s.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranged.join(broadcast(odf), "pid")
      .withColumn("before", sum(col("n")).over(w) - col("n") + col("offset"))
      .select(col("doc_id"), col("n").cast("bigint").as("n_tokens"),
        expr(s"before DIV $SeqLen").as("start_seq"),
        when(col("n") === 0, lit(0L)).otherwise(
          expr(s"(before + n - 1) DIV $SeqLen - before DIV $SeqLen + 1"))
          .as("n_spans"))
      .orderBy(col("doc_id"))
  }

  val qPackSequencesSql: String =
    """WITH t AS (
      |  SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n,
      |    sum(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) - n AS before
      |  FROM t)
      |SELECT doc_id, n::BIGINT AS n_tokens,
      |  (before // 2048)::BIGINT AS start_seq,
      |  CASE WHEN n = 0 THEN 0
      |    ELSE (before + n - 1) // 2048 - before // 2048 + 1
      |  END::BIGINT AS n_spans
      |FROM c ORDER BY doc_id""".stripMargin

  /** The composed curation funnel — the end-to-end pass a training-data
    * pipeline actually runs, as ONE query: raw corpus → train split
    * (eval held out) → Gopher quality rules → exact dedup (keep min id
    * per fingerprint) → benchmark decontamination. Emits the survivor
    * count at each stage, the number every pipeline report leads with.
    * Each stage reuses the exact operator the standalone query ships
    * (same columns, same thresholds), so this is composition, not
    * re-implementation — and each piece scales exactly as its
    * standalone twin does (per-doc column programs; fp-partitioned
    * window; broadcast eval shingles). */
  def qFilterFunnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    // Stage membership is computed as per-doc FLAGS in one annotated
    // frame, then counted with a single aggregate + stack: a union of
    // five per-stage counts would re-evaluate the expensive quality /
    // shingle subtrees once per union branch (measured 5.9 s vs 1.3 s at
    // sf0.1 — the shared-parent-duplication gotcha). The flags compose
    // because the stages are doc-local properties: contamination is
    // "shares a shingle with the eval set" regardless of dedup, and the
    // dedup keeper ranks by doc_id among ELIGIBLE (train ∩ quality)
    // copies via a (fp, eligible)-partitioned window.
    val isEval = col("doc_id") % 97 === 0
    val sh = docs.select(col("doc_id"),
      explode(shingles(col("text"), 3)).as("shingle"))
    val evalShingles = sh.filter(isEval).select(col("shingle")).distinct()
    val contaminatedIds = sh.filter(!isEval)
      .join(broadcast(evalShingles), "shingle")
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
    val flags = docs
      .join(TextQueries.qQualityRules(s, d)
        .select(col("doc_id"), col("gopher_pass")), "doc_id")
      .withColumn("is_train", !isEval)
      .withColumn("eligible", col("is_train") && col("gopher_pass"))
      .withColumn("fp", fingerprint(col("text")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp"), col("eligible")).orderBy(col("doc_id"))))
      .withColumn("kept", col("eligible") && col("rn") === 1)
      .join(contaminatedIds, Seq("doc_id"), "left")
      .withColumn("clean",
        col("kept") && !coalesce(col("contaminated"), lit(false)))
    flags.agg(
      count(lit(1)).as("c0"),
      sum(when(col("is_train"), 1L).otherwise(0L)).as("c1"),
      sum(when(col("eligible"), 1L).otherwise(0L)).as("c2"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("c3"),
      sum(when(col("clean"), 1L).otherwise(0L)).as("c4"))
      .select(expr(
        """stack(5, '0_raw', c0, '1_train', c1, '2_quality', c2,
          |'3_dedup', c3, '4_clean', c4) as (stage, n_docs)""".stripMargin))
      .orderBy(col("stage"))
  }

  /** Round-7 curation funnel — the composed pipeline a curator actually
    * runs with the NEW operators, in the order the cheap filters prune
    * for the expensive ones: C4 line cleaning keeps the doc
    * ([[TextQueries.qC4Clean]]), its duplicated-span fraction stays
    * under 0.5 ([[DedupQueries.qDedupSubstring]]'s coverage — the same
    * relation the rewrite removes), it sits in CCNet's head or middle
    * tercile ([[TextQueries.qCcnetBuckets]]), and it wins exact dedup
    * among the survivors (min doc_id per fingerprint). Same
    * one-annotated-frame + stack shape as [[qFilterFunnel]] (stage
    * unions would re-evaluate the expensive subtrees per branch). The
    * tercile is computed corpus-wide, then filtered — the CCNet artifact
    * is corpus-relative by definition. */
  def qCurationFunnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val flags = docs
      .join(TextQueries.qC4Clean(s, d)
        .select(col("doc_id"), col("c4_keep")), "doc_id")
      .join(DedupQueries.qDedupSubstring(s, d)
        .select(col("doc_id"), col("dup_frac")), "doc_id")
      .join(TextQueries.qCcnetBuckets(s, d)
        .select(col("doc_id"), col("tier")), "doc_id")
      .withColumn("span_ok", col("c4_keep") && col("dup_frac") <= 0.5)
      .withColumn("tier_ok", col("span_ok") && col("tier") <= 2)
      .withColumn("fp", fingerprint(col("text")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp"), col("tier_ok")).orderBy(col("doc_id"))))
      .withColumn("kept", col("tier_ok") && col("rn") === 1)
    flags.agg(
      count(lit(1)).as("c0"),
      sum(when(col("c4_keep"), 1L).otherwise(0L)).as("c1"),
      sum(when(col("span_ok"), 1L).otherwise(0L)).as("c2"),
      sum(when(col("tier_ok"), 1L).otherwise(0L)).as("c3"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("c4"))
      .select(expr(
        """stack(5, '0_raw', c0, '1_c4', c1, '2_span', c2,
          |'3_tercile', c3, '4_dedup', c4) as (stage, n_docs)""".stripMargin))
      .orderBy(col("stage"))
  }

  // the sub-oracles are spliced AFTER stripMargin: qC4CleanSql contains
  // `||` concatenations at line starts, and an outer stripMargin would
  // strip their first pipe
  val qCurationFunnelSql: String =
    s"""WITH c4 AS (
       |  SELECT doc_id, c4_keep FROM (@C4@)),
       |sub AS (
       |  SELECT doc_id, dup_frac FROM (@SUB@)),
       |cc AS (
       |  SELECT doc_id, tier FROM (@CC@)),
       |flags AS (
       |  SELECT d.doc_id, d.text, c4.c4_keep,
       |    (c4.c4_keep AND sub.dup_frac <= 0.5::DOUBLE) span_ok,
       |    (c4.c4_keep AND sub.dup_frac <= 0.5::DOUBLE AND cc.tier <= 2) tier_ok
       |  FROM documents d
       |  JOIN c4 ON d.doc_id = c4.doc_id
       |  JOIN sub ON d.doc_id = sub.doc_id
       |  JOIN cc ON d.doc_id = cc.doc_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
       |      tier_ok
       |    ORDER BY doc_id) rn
       |  FROM flags)
       |SELECT '0_raw' AS stage, count(*)::BIGINT AS n_docs FROM ranked
       |UNION ALL SELECT '1_c4', sum(CASE WHEN c4_keep THEN 1 ELSE 0 END)::BIGINT FROM ranked
       |UNION ALL SELECT '2_span', sum(CASE WHEN span_ok THEN 1 ELSE 0 END)::BIGINT FROM ranked
       |UNION ALL SELECT '3_tercile', sum(CASE WHEN tier_ok THEN 1 ELSE 0 END)::BIGINT FROM ranked
       |UNION ALL SELECT '4_dedup', sum(CASE WHEN tier_ok AND rn = 1 THEN 1 ELSE 0 END)::BIGINT FROM ranked
       |ORDER BY stage""".stripMargin
      .replace("@C4@", TextQueries.qC4CleanSql)
      .replace("@SUB@", DedupQueries.qDedupSubstringSql)
      .replace("@CC@", TextQueries.qCcnetBucketsSql)

  val qFilterFunnelSql: String =
    s"""WITH qr AS (SELECT doc_id, gopher_pass FROM (${TextQueries.qQualityRulesSql})),
       |train AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
       |quality AS (
       |  SELECT t.doc_id, t.text FROM train t JOIN qr ON t.doc_id = qr.doc_id
       |  WHERE qr.gopher_pass),
       |dedup AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text, row_number() OVER (
       |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
       |      ORDER BY doc_id) rn
       |    FROM quality) WHERE rn = 1),
       |tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') w FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN range(1, len(w)-1)])) s
       |  FROM tok WHERE len(w) >= 3),
       |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
       |cont AS (
       |  SELECT DISTINCT sh.doc_id FROM sh
       |  JOIN dedup dd ON sh.doc_id = dd.doc_id JOIN ev ON sh.s = ev.s),
       |clean AS (
       |  SELECT doc_id FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM cont))
       |SELECT '0_raw' AS stage, count(*)::BIGINT AS n_docs FROM documents
       |UNION ALL SELECT '1_train', count(*) FROM train
       |UNION ALL SELECT '2_quality', count(*) FROM quality
       |UNION ALL SELECT '3_dedup', count(*) FROM dedup
       |UNION ALL SELECT '4_clean', count(*) FROM clean
       |ORDER BY stage""".stripMargin

  /** Weighted sampling without replacement, stratified per source —
    * Efraimidis & Spirakis 2006 ("Weighted random sampling with a
    * reservoir", IPL; public paper): each row draws key = ln(u)/w with
    * u ~ U(0,1]; the k largest keys per stratum are EXACTLY a weighted
    * sample without replacement. Here u derives from md5(doc_id) (first
    * 8 hex digits / 2³²) so the "random" draw is reproducible,
    * reorder-stable, and consistent for late-arriving rows — the same
    * determinism contract as [[qSplitAssign]] — and w = n_chars, the
    * size-biased selection a token-budget curator runs.
    *
    * Scale shape: one scan computes keys inside codegen; per-stratum
    * top-k plans as pre-shuffle WindowGroupLimit, so only k rows per
    * source per partition reach the exchange. No global sort, no
    * driver-side randomness, no seed coordination across executors. */
  def qWeightedSample(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + 1.0) / 4294967296.0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("key").desc, col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (log(u) / col("n_chars").cast("double")).as("key"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("doc_id"), col("n_chars"),
        round(col("key"), 9).as("key"))
      .orderBy(col("source"), col("rank"))
  }

  val qWeightedSampleSql: String =
    """WITH keyed AS (
      |  SELECT doc_id, source, n_chars,
      |    ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1.0::DOUBLE)
      |       / 4294967296.0::DOUBLE) / n_chars AS key
      |  FROM documents),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY source ORDER BY key DESC, doc_id) rank
      |  FROM keyed)
      |SELECT source, rank::INTEGER AS rank, doc_id, n_chars,
      |  round(key, 9) AS key
      |FROM ranked WHERE rank <= 10 ORDER BY source, rank""".stripMargin

  /** DSIR importance weighting — data selection by hashed-n-gram
    * log-likelihood ratio (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling", NeurIPS; public paper). A target
    * distribution (here: the src0/src1 sources, standing in for the
    * curated domain a real pipeline targets) and the raw rest each induce
    * a unigram distribution over B=1024 hashed buckets; every document
    * scores mean-per-token log(p_target(b)/p_raw(b)) with add-1
    * smoothing, and the top-k by score are flagged selected.
    *
    * Scale shape: one pass over the token stream aggregates per-doc
    * bucket counts (map-side combinable; materialized once — it is far
    * smaller than the text and feeds both the model and the scoring
    * pass); the model is ≤B rows built from that relation and broadcast
    * back, so scoring never shuffles corpus data again. The selected
    * flag avoids the single-partition global-rank trap: the k-th
    * (score, doc_id) tuple comes off a TakeOrdered top-k (bounded k-row
    * driver collect), and the flag is a broadcast scalar compare.
    *
    * Determinism contract with the oracle: buckets hash via the portable
    * md5-prefix (same as [[qWeightedSample]]'s u), scores round to 6dp
    * before the rank compare, ties break on doc_id. */
  private val DsirBuckets = 1024
  private val dsirScoreCache = Caches.register(
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame])

  def qDsirWeights(s: SparkSession, d: String, buckets: Int = DsirBuckets,
      k: Int = 50): DataFrame = {
    // EVERYTHING lives inside the builder so a cache hit does zero Spark
    // work (an eagerly-checkpointed token pass outside it would re-run
    // the whole scan per call and discard the result)
    def buildScores(): DataFrame = {
      val bucketsD = lit(buckets.toDouble)
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(filter(split(lower(trim(col("text"))), "\\s+"),
            t => length(t) > 0)).as("tok"))
      val bt = toks
        .withColumn("b",
          conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
            % buckets)
        .groupBy(col("doc_id"), col("source"), col("b"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val isTarget = col("source").isin("src0", "src1")
      val model = bt.groupBy(col("b"))
        .agg(sum(when(isTarget, col("cnt")).otherwise(lit(0L))).as("nt"),
          sum(when(isTarget, lit(0L)).otherwise(col("cnt"))).as("nr"))
      val totals = model.agg(sum(col("nt")).as("tt"), sum(col("nr")).as("tr"))
      val lr = model.crossJoin(broadcast(totals))
        .select(col("b"),
          log(((col("nt") + 1.0) / (col("tt") + bucketsD)) /
            ((col("nr") + 1.0) / (col("tr") + bucketsD))).as("llr"))
      // zero-token docs (empty/whitespace text) produce no bt rows; bring
      // them back with a null score so the relation covers every document —
      // a mixture planner must see the doc to decide its fate, not lose it
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .join(bt.join(broadcast(lr), "b")
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt")).as("n_tokens"),
            round(sum(col("cnt") * col("llr")) / sum(col("cnt")), 6)
              .as("logratio")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("logratio"))
    }
    // consumed twice (kth-tuple collect + the output) and across calls;
    // persisted under the Caches lifecycle like the dedup fixpoints
    val scores =
      if (buckets == DsirBuckets)
        dsirScoreCache.getOrElseUpdate(d, buildScores().persist())
      else buildScores()
    val kth = scores.filter(col("logratio").isNotNull)
      .orderBy(col("logratio").desc, col("doc_id")).limit(k)
      .collect().lastOption
    val selected = kth match {
      case Some(r) =>
        val (ts, ti) = (r.getDouble(r.fieldIndex("logratio")),
          r.getLong(r.fieldIndex("doc_id")))
        col("logratio") > ts || (col("logratio") === ts && col("doc_id") <= ti)
      case None => lit(false)
    }
    scores.select(col("doc_id"), col("source"), col("n_tokens"),
        col("logratio"), coalesce(selected, lit(false)).as("selected"))
      .orderBy(col("doc_id"))
  }

  val qDsirWeightsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |      t -> len(t) > 0)) AS tok
      |  FROM documents),
      |bt AS (
      |  SELECT doc_id, source,
      |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b,
      |    count(*) AS cnt
      |  FROM toks GROUP BY 1, 2, 3),
      |model AS (
      |  SELECT b,
      |    sum(CASE WHEN source IN ('src0','src1') THEN cnt ELSE 0 END) AS nt,
      |    sum(CASE WHEN source IN ('src0','src1') THEN 0 ELSE cnt END) AS nr
      |  FROM bt GROUP BY 1),
      |totals AS (SELECT sum(nt) AS tt, sum(nr) AS tr FROM model),
      |lr AS (
      |  SELECT b, ln(((nt + 1.0) / (tt + 1024.0))
      |             / ((nr + 1.0) / (tr + 1024.0))) AS llr
      |  FROM model CROSS JOIN totals),
      |scored AS (
      |  SELECT bt.doc_id, sum(bt.cnt)::BIGINT AS n_tokens,
      |    round(sum(bt.cnt * lr.llr) / sum(bt.cnt), 6) AS logratio
      |  FROM bt JOIN lr ON bt.b = lr.b GROUP BY 1),
      |scores AS (
      |  SELECT d.doc_id, d.source,
      |    coalesce(sc.n_tokens, 0)::BIGINT AS n_tokens, sc.logratio
      |  FROM documents d LEFT JOIN scored sc ON d.doc_id = sc.doc_id),
      |ranked AS (SELECT *, row_number() OVER (
      |  ORDER BY logratio DESC, doc_id) rn FROM scores WHERE logratio IS NOT NULL)
      |SELECT s.doc_id, s.source, s.n_tokens, s.logratio,
      |  coalesce(r.rn <= 50, FALSE) AS selected
      |FROM scores s LEFT JOIN ranked r ON s.doc_id = r.doc_id
      |ORDER BY s.doc_id""".stripMargin

  /** Z-order (Morton) clustering values over two scan dimensions — the
    * multi-dimensional layout key behind `ZORDER BY` (see
    * [[graft.operators.ZOrder]] for the write path and ZOrderSpec for
    * the measured row-group-pruning effect). Dimensions here: n_chars
    * (the real scan predicate a curator uses) and an md5-derived second
    * axis standing in for an independent column; both clamped to 10
    * bits. The oracle recomputes the interleave bit-by-bit with the
    * same shift/mask arithmetic, so the gate value-checks the layout
    * key itself. */
  def qZorderValues(s: SparkSession, d: String): DataFrame = {
    import graft.operators.ZOrder.zvalue
    val y = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long") % 1024
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), y.as("y"))
      .select(col("doc_id"), col("n_chars"), col("y"),
        zvalue(col("n_chars"), col("y"), 10).as("zval"))
      .orderBy(col("doc_id"))
  }

  val qZorderValuesSql: String = {
    val terms = (0 until 10).map { i =>
      s"((x >> $i) & 1) * ${1L << (2 * i)} + ((y >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""WITH dims AS (
       |  SELECT doc_id, n_chars,
       |    least(greatest(n_chars, 0), 1023) AS x,
       |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 1024 AS y
       |  FROM documents)
       |SELECT doc_id, n_chars, y, ($terms)::BIGINT AS zval
       |FROM dims ORDER BY doc_id""".stripMargin
  }

  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** One-pass table profiler (the `ANALYZE TABLE` twin a pipeline runs
    * before planning a curation pass): per column — non-null count,
    * exact distinct count, min/max (stringified, truncated to 24 chars).
    * All five columns profile in a SINGLE scan: Spark plans the multiple
    * countDistinct aggregates as one Expand (×columns) feeding one
    * hash-agg pair, so the input is read once however many columns are
    * profiled; the 1-row result is unpivoted with `stack`. At 100 TB the
    * same plan holds (swap countDistinct for approx_count_distinct when
    * exactness isn't required — the Expand disappears entirely). */
  def qProfileTable(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val aggs = count(lit(1)).as("n_rows") +: ProfileCols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val stackArgs = ProfileCols
      .map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    docs.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${ProfileCols.size}, $stackArgs) AS " +
          "(column_name, n_non_null, n_distinct, min_val, max_val)")
      .select(col("column_name"), col("n_rows"), col("n_non_null"),
        col("n_distinct"),
        substring(col("min_val"), 1, 24).as("min_val"),
        substring(col("max_val"), 1, 24).as("max_val"))
      .orderBy(col("column_name"))
  }

  val qProfileTableSql: String = {
    val branches = ProfileCols.map { c =>
      s"""SELECT '$c' AS column_name, n_rows, nn_$c AS n_non_null,
         |  nd_$c AS n_distinct, substr(mn_$c, 1, 24) AS min_val,
         |  substr(mx_$c, 1, 24) AS max_val FROM a""".stripMargin
    }.mkString("\n|UNION ALL\n|".stripMargin)
    val aggs = ProfileCols.map { c =>
      s"""count($c) nn_$c, count(DISTINCT $c) nd_$c,
         |  min($c)::VARCHAR mn_$c, max($c)::VARCHAR mx_$c""".stripMargin
    }.mkString(",\n")
    s"""WITH a AS (
       |  SELECT count(*) n_rows,
       |$aggs
       |  FROM documents)
       |$branches
       |ORDER BY column_name""".stripMargin
  }

  /** Declarative data-quality constraints over the corpus table — the
    * Deequ/dbt-test shape (AWS Deequ is public prior art; this is the
    * relational core): each constraint is one aggregate expression, so
    * the whole suite evaluates in a SINGLE scan (plus one distinct-agg
    * for uniqueness), emitting a per-constraint violation count and
    * pass flag. At 100 TB this is the pre-publication gate a dataset
    * release runs; constraints compose as Columns, so adding one never
    * adds a pass over the data. */
  def qConstraints(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val agg = docs.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("v_doc_id_null"),
      sum(when(length(trim(col("text"))) === 0 || col("text").isNull, 1L)
        .otherwise(0L)).as("v_text_empty"),
      sum(when(col("n_chars") <= 0 || col("n_chars").isNull, 1L)
        .otherwise(0L)).as("v_n_chars_range"),
      sum(when(!col("lang").isin("en", "de", "fr", "es", "zh", "ja", "ru", "pt",
        "it", "ko"), 1L).otherwise(0L)).as("v_lang_domain"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("v_n_chars_consistent"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("v_doc_id_unique"))
    val names = Seq(
      "doc_id_not_null" -> "v_doc_id_null",
      "doc_id_unique" -> "v_doc_id_unique",
      "lang_in_domain" -> "v_lang_domain",
      "n_chars_matches_text" -> "v_n_chars_consistent",
      "n_chars_positive" -> "v_n_chars_range",
      "text_not_empty" -> "v_text_empty")
    val stackArgs = names.map { case (n, c) => s"'$n', $c" }.mkString(", ")
    agg.selectExpr("n_rows",
      s"stack(${names.size}, $stackArgs) AS (constraint_name, n_violations)")
      .select(col("constraint_name"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0).as("pass"))
      .orderBy(col("constraint_name"))
  }

  val qConstraintsSql: String =
    """WITH a AS (
      |  SELECT count(*) n_rows,
      |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) v_doc_id_null,
      |    sum(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 1 ELSE 0 END) v_text_empty,
      |    sum(CASE WHEN n_chars IS NULL OR n_chars <= 0 THEN 1 ELSE 0 END) v_n_chars_range,
      |    sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh','ja','ru','pt','it','ko')
      |             THEN 1 ELSE 0 END) v_lang_domain,
      |    sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) v_n_chars_consistent,
      |    count(*) - count(DISTINCT doc_id) v_doc_id_unique
      |  FROM documents)
      |SELECT c.name AS constraint_name, a.n_rows,
      |  CASE c.name
      |    WHEN 'doc_id_not_null' THEN v_doc_id_null
      |    WHEN 'doc_id_unique' THEN v_doc_id_unique
      |    WHEN 'lang_in_domain' THEN v_lang_domain
      |    WHEN 'n_chars_matches_text' THEN v_n_chars_consistent
      |    WHEN 'n_chars_positive' THEN v_n_chars_range
      |    ELSE v_text_empty END::BIGINT AS n_violations,
      |  (CASE c.name
      |    WHEN 'doc_id_not_null' THEN v_doc_id_null
      |    WHEN 'doc_id_unique' THEN v_doc_id_unique
      |    WHEN 'lang_in_domain' THEN v_lang_domain
      |    WHEN 'n_chars_matches_text' THEN v_n_chars_consistent
      |    WHEN 'n_chars_positive' THEN v_n_chars_range
      |    ELSE v_text_empty END = 0) AS pass
      |FROM a, (VALUES ('doc_id_not_null'), ('doc_id_unique'), ('lang_in_domain'),
      |  ('n_chars_matches_text'), ('n_chars_positive'), ('text_not_empty')) c(name)
      |ORDER BY constraint_name""".stripMargin

  /** Deterministic per-epoch training order (the seeded reshuffle every
    * multi-epoch training run needs for reproducibility — e.g. the
    * public T5/C4 and Pile training setups reshuffle per epoch from a
    * seed): position of doc d in epoch e = rank of md5(d ":" e) — a new
    * pseudo-random permutation per epoch, identical on every rerun,
    * derivable for ANY doc without materializing the order.
    *
    * The ranking is the scale-correct two-level global sort-rank (the
    * range-partitioned sort idiom): bucket by the key's first hex byte,
    * rank WITHIN (epoch, bucket) — a distributed window — and add each
    * bucket's global offset from a 256-row prefix sum that broadcasts
    * back. No global single-partition window ever exists; the plan
    * holds at any corpus size. Output: the first 10 positions per epoch
    * plus an order-sensitive per-epoch checksum
    * (Σ (pos mod p)·(doc_id mod q) mod p, p=100003, q=1009 — modular
    * terms keep the 64-bit sum exact at any realistic corpus size, so
    * both engines agree without ANSI/overflow divergence) computed over
    * the FULL permutation, so the hash gate proves the entire order,
    * not just its head. */
  def qEpochShuffle(s: SparkSession, d: String): DataFrame = {
    val keyed = Tables.documents(s, d).select(col("doc_id"))
      .crossJoin(broadcast(
        s.range(2).select(col("id").cast("int").as("epoch"))))
      .withColumn("key", md5(concat(col("doc_id"), lit(":"), col("epoch"))))
      .withColumn("bucket", substring(col("key"), 1, 2))
    val wB = Window.partitionBy(col("epoch"), col("bucket"))
      .orderBy(col("key"), col("doc_id"))
    val local = keyed.withColumn("lrank", row_number().over(wB))
    // 2 epochs × ≤256 buckets — the offset relation is tiny by
    // construction; its prefix-sum window is over ≤256 rows per epoch
    val wOff = Window.partitionBy(col("epoch")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("epoch"), col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(wOff), lit(0L)))
      .select(col("epoch"), col("bucket"), col("off"))
    val pos = local
      .join(broadcast(offsets), Seq("epoch", "bucket"))
      .withColumn("pos", col("off") + col("lrank"))
    // bounded modular terms: each term < 100003, so a 64-bit sum is
    // exact below ~9e13 rows per epoch — Spark's non-ANSI long sum and
    // DuckDB's HUGEINT sum agree everywhere in that range (an unbounded
    // pos·id product would wrap Spark's long near 6M docs while the
    // oracle's HUGEINT kept going — a gate divergence, not an engine one)
    val checksum = pos.groupBy(col("epoch"))
      .agg(sum((col("pos") % 100003) * (col("doc_id") % 1009) % 100003)
        .as("epoch_checksum"))
    pos.filter(col("pos") <= 10)
      .join(broadcast(checksum), "epoch")
      .select(col("epoch"), col("pos"), col("doc_id"), col("epoch_checksum"))
      .orderBy(col("epoch"), col("pos"))
  }

  val qEpochShuffleSql: String =
    """WITH k AS (
      |  SELECT e.epoch, d.doc_id, md5(d.doc_id || ':' || e.epoch) skey
      |  FROM documents d CROSS JOIN (VALUES (0), (1)) e(epoch)),
      |p AS (
      |  SELECT epoch, doc_id,
      |    row_number() OVER (PARTITION BY epoch ORDER BY skey, doc_id) pos
      |  FROM k),
      |c AS (
      |  SELECT epoch, sum((pos % 100003) * (doc_id % 1009) % 100003)::BIGINT cs
      |  FROM p GROUP BY 1)
      |SELECT p.epoch, p.pos, p.doc_id, c.cs AS epoch_checksum
      |FROM p JOIN c USING (epoch)
      |WHERE pos <= 10 ORDER BY 1, 2""".stripMargin

  /** k-anonymity threshold for the release report. */
  private val KAnon = 5

  /** k-anonymity suppression report (Sweeney 2002, "k-anonymity: a model
    * for protecting privacy", IJUFKS — public paper): group the corpus
    * by its quasi-identifier tuple (lang, source, length decile — the
    * released metadata an attacker could join on), and report per
    * (lang, source) how many QI groups fall below k and how many rows a
    * k-anonymous release would have to suppress or generalize. The
    * pre-release privacy audit every dataset publisher runs next to PII
    * redaction.
    *
    * Scale shape: one map-side-combinable QI-group count, then a
    * (lang, source)-keyed rollup of the group relation — corpus touched
    * once, everything after is |QI groups|-sized. Integer counts only. */
  def qKAnonymity(s: SparkSession, d: String): DataFrame = {
    val groups = Tables.documents(s, d)
      .withColumn("len_bucket", (col("n_chars") / 100).cast("long"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("gn"))
    groups
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_groups"),
        count(when(col("gn") < KAnon, lit(1))).as("n_small_groups"),
        coalesce(sum(when(col("gn") < KAnon, col("gn"))), lit(0L))
          .as("rows_suppressed"),
        sum(col("gn")).as("n_rows"))
      .withColumn("suppression_frac",
        round(col("rows_suppressed").cast("double") /
          col("n_rows").cast("double"), 4))
      .orderBy(col("lang"), col("source"))
  }

  val qKAnonymitySql: String =
    s"""WITH g AS (
       |  SELECT lang, source, (n_chars // 100) len_bucket, count(*) gn
       |  FROM documents GROUP BY 1, 2, 3)
       |SELECT lang, source,
       |  count(*) AS n_groups,
       |  count(*) FILTER (WHERE gn < $KAnon) AS n_small_groups,
       |  coalesce(sum(gn) FILTER (WHERE gn < $KAnon), 0)::BIGINT AS rows_suppressed,
       |  sum(gn)::BIGINT AS n_rows,
       |  round(coalesce(sum(gn) FILTER (WHERE gn < $KAnon), 0)::DOUBLE
       |    / sum(gn), 4) AS suppression_frac
       |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** l-diversity floor for the companion audit. */
  private val LDiv = 3

  /** l-diversity audit (Machanavajjhala et al. 2007, "l-diversity:
    * privacy beyond k-anonymity", TKDD — public paper): k-anonymity
    * alone fails when a QI group's SENSITIVE values are homogeneous
    * (everyone in the group shares the attribute, so membership reveals
    * it). Re-using [[qKAnonymity]]'s quasi-identifier tuple with
    * `source` as the sensitive attribute, report per lang how many QI
    * groups carry fewer than l=[[LDiv]] distinct sensitive values and
    * the affected row fraction — the companion check a release audit
    * runs next to the k-anonymity one. Same one-scan shape. */
  def qLDiversity(s: SparkSession, d: String): DataFrame = {
    val groups = Tables.documents(s, d)
      .withColumn("len_bucket", (col("n_chars") / 100).cast("long"))
      .groupBy(col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("gn"),
        countDistinct(col("source")).as("n_sensitive"))
    groups
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_groups"),
        count(when(col("n_sensitive") < LDiv, lit(1))).as("n_low_diversity"),
        coalesce(sum(when(col("n_sensitive") < LDiv, col("gn"))), lit(0L))
          .as("rows_affected"),
        sum(col("gn")).as("n_rows"))
      .withColumn("affected_frac",
        round(col("rows_affected").cast("double") /
          col("n_rows").cast("double"), 4))
      .orderBy(col("lang"))
  }

  val qLDiversitySql: String =
    s"""WITH g AS (
       |  SELECT lang, (n_chars // 100) len_bucket, count(*) gn,
       |    count(DISTINCT source) n_sensitive
       |  FROM documents GROUP BY 1, 2)
       |SELECT lang,
       |  count(*) AS n_groups,
       |  count(*) FILTER (WHERE n_sensitive < $LDiv) AS n_low_diversity,
       |  coalesce(sum(gn) FILTER (WHERE n_sensitive < $LDiv), 0)::BIGINT AS rows_affected,
       |  sum(gn)::BIGINT AS n_rows,
       |  round(coalesce(sum(gn) FILTER (WHERE n_sensitive < $LDiv), 0)::DOUBLE
       |    / sum(gn), 4) AS affected_frac
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** t-closeness threshold: groups whose rounded source-distribution
    * distance from the corpus-wide distribution exceeds this leak
    * membership signal. 0.52 sits with ≥0.02 margin from the discrete
    * rational distances the harness corpus produces on BOTH sides (the
    * group shares are small-denominator fractions, so distances cluster
    * at values like 0.45/0.5/0.55 — a 0.5 cut would gate on float dust). */
  private val TClose = 0.52

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007, "t-Closeness:
    * Privacy Beyond k-Anonymity and l-Diversity", ICDE — public paper):
    * the third leg of the release-audit trio next to [[qKAnonymity]] and
    * [[qLDiversity]]. k-anonymity bounds group SIZE, l-diversity bounds
    * sensitive-value COUNT, but a group can pass both while its
    * sensitive distribution differs wildly from the corpus baseline —
    * that skew is itself the leak. Distance = total variation
    * (the categorical-ground-distance EMD the paper uses):
    * 0.5·Σ_present |p_group − p_global| + 0.5·(1 − Σ_present p_global),
    * where the second term accounts for globally-present sources ABSENT
    * from the group without materializing the group×source zero matrix —
    * the shuffle stays on observed (group, source) rows. Same
    * quasi-identifier groups as l-diversity (lang × length bucket);
    * per-lang rollup with rows affected, mirrored shape. */
  def qTCloseness(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val total = docs.count().toDouble
    val global = docs.groupBy(col("source"))
      .agg((count(lit(1)) / total).as("p_global"))
    val cells = docs
      .withColumn("len_bucket", (col("n_chars") / 100).cast("long"))
      .groupBy(col("lang"), col("len_bucket"), col("source"))
      .agg(count(lit(1)).as("c"))
    val gt = cells.groupBy(col("lang"), col("len_bucket"))
      .agg(sum(col("c")).as("tot"))
    val dist = cells
      .join(broadcast(global), "source")
      .join(gt, Seq("lang", "len_bucket"))
      .groupBy(col("lang"), col("len_bucket"))
      .agg(sum(abs(col("c") / col("tot") - col("p_global"))).as("absdev"),
        sum(col("p_global")).as("p_present"),
        sum(col("c")).as("gn"))
      .withColumn("dist",
        round(lit(0.5) * col("absdev") + lit(0.5) * (lit(1.0) - col("p_present")), 4))
    dist.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_groups"),
        count(when(col("dist") > TClose, lit(1))).as("n_far"),
        coalesce(sum(when(col("dist") > TClose, col("gn"))), lit(0L))
          .as("rows_affected"),
        sum(col("gn")).as("n_rows"),
        round(max(col("dist")), 4).as("max_dist"))
      .withColumn("affected_frac",
        round(col("rows_affected").cast("double") /
          col("n_rows").cast("double"), 4))
      .orderBy(col("lang"))
  }

  val qTClosenessSql: String =
    s"""WITH gp AS (
       |  SELECT source,
       |    count(*)::DOUBLE / (SELECT count(*) FROM documents) p_global
       |  FROM documents GROUP BY 1),
       |cells AS (
       |  SELECT lang, (n_chars // 100) len_bucket, source, count(*) c
       |  FROM documents GROUP BY 1, 2, 3),
       |gt AS (SELECT lang, len_bucket, sum(c) tot FROM cells GROUP BY 1, 2),
       |d AS (
       |  SELECT cells.lang, cells.len_bucket,
       |    round(0.5 * sum(abs(cells.c / gt.tot - gp.p_global))
       |          + 0.5 * (1 - sum(gp.p_global)), 4) dist,
       |    sum(cells.c) gn
       |  FROM cells JOIN gt USING (lang, len_bucket)
       |    JOIN gp ON cells.source = gp.source
       |  GROUP BY 1, 2)
       |SELECT lang,
       |  count(*) AS n_groups,
       |  count(*) FILTER (WHERE dist > $TClose) AS n_far,
       |  coalesce(sum(gn) FILTER (WHERE dist > $TClose), 0)::BIGINT AS rows_affected,
       |  sum(gn)::BIGINT AS n_rows,
       |  round(max(dist), 4) AS max_dist,
       |  round(coalesce(sum(gn) FILTER (WHERE dist > $TClose), 0)::DOUBLE
       |    / sum(gn), 4) AS affected_frac
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  /** DP release budget: ε per released statistic and the tail bound's δ. */
  private val DpEps = 1.0
  private val DpDelta = 1e-4

  /** Differentially-private release of the corpus composition (Dwork,
    * McSherry, Nissim & Smith 2006, "Calibrating noise to sensitivity in
    * private data analysis", TCC — the Laplace mechanism; composition
    * accounting per McSherry 2009's PINQ, SIGMOD — both public papers).
    * The fourth leg of the release toolkit: k-anonymity / l-diversity /
    * t-closeness AUDIT a release; this one actually PERFORMS a private
    * release — per-language doc counts plus the corpus total, each with
    * Laplace(Δf/ε) noise (Δf = 1 for counting queries).
    *
    * Noise is derived, not drawn: u = md5(stat ":dp1") mapped to (0,1),
    * noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|) — the exact Laplace inverse
    * CDF over a cryptographic-hash uniform. Deterministic noise is NOT
    * privacy-weaker here in any way the engine controls (a production
    * release swaps one seeded draw for the hash), and it makes the whole
    * mechanism hash-checkable across engines. `within_budget` gates each
    * noise draw against the Laplace tail bound (1/ε)·ln(1/2δ);
    * `composed_eps` carries the accounting: the per-language histogram
    * partitions the corpus (parallel composition → max ε = ε), the total
    * overlaps it (sequential → +ε), so the release spends 2ε.
    *
    * Scale shape: one ROLLUP scan (map-side combinable) produces every
    * released row; the noise arithmetic runs over the |langs|+1-row
    * aggregate. Nothing document-sized survives the first shuffle. */
  def qDpRelease(s: SparkSession, d: String): DataFrame = {
    val rows = Tables.documents(s, d)
      .rollup(col("lang")).agg(count(lit(1)).as("n_true"))
      .select(coalesce(col("lang"), lit("TOTAL")).as("released"), col("n_true"))
    val u = (conv(substring(md5(concat(col("released"), lit(":dp1"))), 1, 12),
      16, 10).cast("double") + 0.5) / 281474976710656.0
    val centered = u - lit(0.5)
    val noise = signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered)) * lit(-1.0 / DpEps)
    val bound = math.log(1.0 / (2 * DpDelta)) / DpEps
    rows
      .withColumn("noise", noise)
      .select(col("released"),
        lit(DpEps).as("eps"),
        round(col("n_true") + col("noise"), 6).as("n_noised"),
        (abs(col("noise")) <= lit(bound)).as("within_budget"),
        lit(2.0 * DpEps).as("composed_eps"))
      .orderBy(col("released"))
  }

  val qDpReleaseSql: String = {
    val bound = math.log(1.0 / (2 * DpDelta)) / DpEps
    s"""WITH released AS (
       |  SELECT coalesce(lang, 'TOTAL') released, count(*) n_true
       |  FROM documents GROUP BY ROLLUP (lang)),
       |noised AS (
       |  SELECT released, n_true,
       |    -sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)) / $DpEps AS noise
       |  FROM (SELECT released, n_true,
       |      (('0x' || substr(md5(released || ':dp1'), 1, 12))::BIGINT + 0.5)
       |        / 281474976710656.0 u
       |    FROM released))
       |SELECT released, $DpEps::DOUBLE AS eps,
       |  round(n_true + noise, 6) AS n_noised,
       |  (abs(noise) <= $bound) AS within_budget,
       |  ${2.0 * DpEps}::DOUBLE AS composed_eps
       |FROM noised ORDER BY released""".stripMargin
  }

  /** Rendezvous (highest-random-weight) shard assignment + the
    * grow-by-one rebalance report (Thaler & Ravishankar 1998, "Using
    * name-based mappings to increase hit rates", IEEE/ACM ToN — the
    * public HRW scheme; the consistent-placement primitive a 100 TB
    * corpus store uses so adding capacity does NOT reshuffle the world).
    * Each doc scores every shard with a 60-bit md5-derived hash and
    * lands on the argmax; the report compares the 16-shard and 17-shard
    * placements per old shard. HRW's contract — visible in the gated
    * values — is that growth moves docs ONLY to the new shard (an old
    * shard's score order among themselves is unchanged), at ~1/17 of
    * each shard. One projection pass (17 struct scores per row,
    * codegen'd array_max), one 16-row groupBy — no shuffle of the
    * corpus itself. */
  def qShardRebalance(s: SparkSession, d: String): DataFrame = {
    def score(sid: Int) =
      conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("_"), lit(sid.toString))), 1, 15), 16, 10)
        .cast("bigint")
    val scores = array((0 until 17).map(sid =>
      struct(score(sid).as("h"), lit(sid).as("sid"))): _*)
    Tables.documents(s, d)
      .select(col("doc_id"),
        array_max(slice(scores, 1, 16)).getField("sid").as("shard16"),
        array_max(scores).getField("sid").as("shard17"))
      .groupBy(col("shard16").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard17") =!= col("shard16"), 1L).otherwise(0L))
          .as("n_moved"),
        // HRW invariant: every move lands on the NEW shard (16)
        sum(when(col("shard17") =!= col("shard16") &&
          col("shard17") =!= lit(16), 1L).otherwise(0L)).as("n_misrouted"))
      .orderBy(col("shard_id"))
  }

  val qShardRebalanceSql: String =
    """WITH h AS (
      |  SELECT doc_id, s,
      |    ('0x' || substr(md5(doc_id::VARCHAR || '_' || s::VARCHAR), 1, 15))::BIGINT hv
      |  FROM documents, range(17) t(s)),
      |a AS (
      |  SELECT doc_id,
      |    arg_max(CASE WHEN s < 16 THEN s END,
      |            CASE WHEN s < 16 THEN hv END) shard16,
      |    arg_max(s, hv) shard17
      |  FROM h GROUP BY doc_id)
      |SELECT shard16 AS shard_id, count(*)::BIGINT n_docs,
      |  sum(CASE WHEN shard17 <> shard16 THEN 1 ELSE 0 END)::BIGINT n_moved,
      |  sum(CASE WHEN shard17 <> shard16 AND shard17 <> 16
      |           THEN 1 ELSE 0 END)::BIGINT n_misrouted
      |FROM a GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "td_split_assign" -> (qSplitAssign _),
    "td_shard_rebalance" -> (qShardRebalance _),
    "td_t_closeness" -> (qTCloseness _),
    "td_dp_release" -> (qDpRelease _),
    "td_epoch_shuffle" -> (qEpochShuffle _),
    "td_k_anonymity" -> (qKAnonymity _),
    "td_l_diversity" -> (qLDiversity _),
    "td_split_grouped" -> (qSplitGrouped _),
    "td_mix_weights" -> (qMixWeights _),
    "td_mix_sample" -> (qMixSample _),
    "td_contamination" -> (qContamination _),
    "td_contam_bloom" -> (qContaminationBloom _),
    "td_source_quota" -> ((s: SparkSession, d: String) => qSourceQuota(s, d)),
    "td_pack_sequences" -> (qPackSequences _),
    "td_mix_temperature" -> ((s: SparkSession, d: String) => qMixTemperature(s, d)),
    "td_filter_funnel" -> (qFilterFunnel _),
    "td_curation_funnel" -> (qCurationFunnel _),
    "td_weighted_sample" -> ((s: SparkSession, d: String) => qWeightedSample(s, d)),
    "td_dsir" -> ((s: SparkSession, d: String) => qDsirWeights(s, d)),
    "td_zorder" -> (qZorderValues _),
    "td_profile_table" -> (qProfileTable _),
    "td_constraints" -> (qConstraints _),
  )

  def oracles: Map[String, String] = Map(
    "td_split_assign" -> qSplitAssignSql,
    "td_shard_rebalance" -> qShardRebalanceSql,
    "td_t_closeness" -> qTClosenessSql,
    "td_dp_release" -> qDpReleaseSql,
    "td_epoch_shuffle" -> qEpochShuffleSql,
    "td_k_anonymity" -> qKAnonymitySql,
    "td_l_diversity" -> qLDiversitySql,
    "td_split_grouped" -> qSplitGroupedSql,
    "td_mix_weights" -> qMixWeightsSql,
    "td_mix_sample" -> qMixSampleSql,
    "td_contamination" -> qContaminationSql,
    "td_contam_bloom" -> qContaminationBloomSql,
    "td_source_quota" -> qSourceQuotaSql,
    "td_pack_sequences" -> qPackSequencesSql,
    "td_mix_temperature" -> qMixTemperatureSql,
    "td_filter_funnel" -> qFilterFunnelSql,
    "td_curation_funnel" -> qCurationFunnelSql,
    "td_weighted_sample" -> qWeightedSampleSql,
    "td_dsir" -> qDsirWeightsSql,
    "td_zorder" -> qZorderValuesSql,
    "td_profile_table" -> qProfileTableSql,
    "td_constraints" -> qConstraintsSql,
  )
}
