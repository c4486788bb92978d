package graft.streaming

import graft.queries.SearchQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming BM25 inverted-index maintenance — the index-maintenance
  * tail of the stored keyword path ([[SearchQueries.bm25Index]]): new
  * documents arrive as a stream and each micro-batch appends DELTA
  * relations (postings, per-term document-frequency partials, corpus
  * stats partials) instead of rebuilding the index. This is the shape
  * index maintenance must have at 100 TB: per-batch work is O(batch
  * tokens), the existing index is never re-shuffled, and a periodic
  * [[compact]] folds the deltas into the bucketed serving tables
  * (`bucketBy(term)`) whose probe scans stay bucket-pruned.
  *
  * Correctness of merge-on-read, under the append-only ingest contract
  * (each doc_id arrives in exactly one micro-batch — the same contract
  * as [[EmbedStream]]'s corpus):
  *   - postings are per (term, doc_id) and doc_ids never repeat across
  *     batches, so the union of batch deltas IS the full postings
  *     relation;
  *   - df(term) = Σ batches' per-batch distinct-doc counts, exact for
  *     the same reason;
  *   - n_docs / avgdl aggregate from per-batch (n_docs, sum_dl) pairs.
  *
  * Exactly-once across restarts without a transactional sink: every
  * delta lands under `<component>/batch=<id>` in overwrite mode, so a
  * replayed micro-batch (foreachBatch's at-least-once contract after a
  * crash) rewrites the same paths byte-for-byte instead of
  * double-counting — the [[EmbedStream]] discipline.
  */
object IndexStream {

  /** Start maintaining the index at `indexDir` from a streaming
    * (doc_id long, text string) frame. */
  def start(s: SparkSession, input: DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeDelta(batch, indexDir, batchId)
      }
      .start()

  /** One micro-batch's delta writes — exposed so specs can reproduce a
    * redelivered batch byte-for-byte. One tokenization pass feeds all
    * three components (localCheckpoint, not recompute-per-sink). */
  def writeDelta(batch: DataFrame, indexDir: String, batchId: Long): Unit = {
    val tok = SearchQueries.tokenizeDocs(
      batch.select(col("doc_id"), col("text"))).localCheckpoint()
    // one explode pass feeds BOTH the positional and frequency postings:
    // tf = |positions| by construction, so the components cannot drift
    // (the .pos/.doc-file pairing real engines flush together)
    val positional = tok
      .select(col("doc_id"), col("dl"),
        posexplode(col("w")).as(Seq("p0", "term")))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(sort_array(collect_list(col("p0") + 1)).as("positions"))
      .localCheckpoint()
    positional.write.mode("overwrite")
      .parquet(s"$indexDir/positions/batch=$batchId")
    val postings = positional
      .select(col("term"), col("doc_id"), col("dl"),
        size(col("positions")).cast("long").as("tf"))
      .localCheckpoint()
    postings.write.mode("overwrite")
      .parquet(s"$indexDir/postings/batch=$batchId")
    postings.select(col("term"), col("doc_id")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$indexDir/dfreq/batch=$batchId")
    tok.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$indexDir/stats/batch=$batchId")
    ()
  }

  /** Read a delta component, or an empty frame with `schema` before the
    * first micro-batch has committed — the merge-on-read view must have
    * an empty-index base case (a serving path can probe right after
    * [[start]], before any delta lands). */
  private def component(s: SparkSession, dir: String,
      schema: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.parquet(dir)
    else s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** Merge-on-read views of the streamed index components. The
    * `batch=<id>` partition-discovery column is dropped — it is delivery
    * bookkeeping, not index schema (and must not leak into the compacted
    * tables, which mirror the [[SearchQueries.bm25Index]] layout). */
  def postings(s: SparkSession, indexDir: String): DataFrame =
    component(s, s"$indexDir/postings",
      "term STRING, doc_id BIGINT, dl INT, tf BIGINT")
      .select(col("term"), col("doc_id"), col("dl"), col("tf"))
  def dfreq(s: SparkSession, indexDir: String): DataFrame =
    component(s, s"$indexDir/dfreq", "term STRING, df BIGINT")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
  def stats(s: SparkSession, indexDir: String): DataFrame =
    component(s, s"$indexDir/stats", "n_docs BIGINT, sum_dl BIGINT")
      .agg(sum(col("n_docs")).as("n_docs"),
        (sum(col("sum_dl")) / sum(col("n_docs")).cast("double")).as("avgdl"))
  def positions(s: SparkSession, indexDir: String): DataFrame =
    component(s, s"$indexDir/positions",
      "term STRING, doc_id BIGINT, dl INT, positions ARRAY<INT>")
      .select(col("term"), col("doc_id"), col("dl"), col("positions"))

  /** BM25 top-k served straight off the streamed (uncompacted) index —
    * the same scorer as the stored-table path, so stream ≡ batch is an
    * invariant, not a coincidence. */
  def search(s: SparkSession, indexDir: String,
      queries: Seq[(Long, String)] = SearchQueries.Bm25Queries,
      k: Int = 5): DataFrame = {
    val (terms, qterms) = SearchQueries.queryTerms(s, queries)
    SearchQueries.scoreIndex(
      postings(s, indexDir).filter(col("term").isin(terms: _*)),
      dfreq(s, indexDir).filter(col("term").isin(terms: _*)),
      stats(s, indexDir), qterms, k)
  }

  /** Phrase top-k served off the streamed POSITIONAL component — the
    * delta-maintained twin of [[SearchQueries.qPhraseStored]]: the
    * per-batch position lists union into the full positional postings
    * (same append-only doc_id contract as the frequency components), the
    * probe restricts to the phrase terms, and the shared
    * [[SearchQueries.phraseRank]] kernel does the rest — so stream ≡
    * batch is structural, not tested-in. */
  def searchPhrase(s: SparkSession, indexDir: String): DataFrame = {
    val (terms, qoff, qlen) = SearchQueries.phraseQuery(s)
    val pos = positions(s, indexDir)
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("dl"), col("term"),
        explode(col("positions")).as("pos"))
    SearchQueries.phraseRank(pos, qoff, qlen, stats(s, indexDir))
  }

  /** Fold the accumulated deltas into bucketed serving tables (the
    * [[SearchQueries.bm25Index]] layout: `bucketBy(8, term)`, sorted
    * within buckets) and return their names + stats path. Run on the
    * maintenance cadence; queries between compactions use [[search]]'s
    * merge-on-read view. The rewrite shuffles each posting once into its
    * term bucket — O(index), amortized across every query served from
    * the bucket-pruned scans afterwards. */
  def compact(s: SparkSession, indexDir: String): SearchQueries.Bm25Index = {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(indexDir.getBytes).map("%02x".format(_)).mkString.take(8)
    val idx = SearchQueries.Bm25Index(
      s"bm25s_postings_$suffix", s"bm25s_dfreq_$suffix",
      s"bm25s_fwd_$suffix", s"$indexDir/compacted_stats")
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    // same orphan-location reclamation as bm25Index: with a persistent
    // indexDir across JVM restarts the md5-derived names repeat, and a
    // dead JVM's warehouse dir would fail CREATE with
    // LOCATION_ALREADY_EXISTS
    SearchQueries.reclaimOrphanTables(s,
      Seq(idx.postingsTable, idx.dfreqTable, idx.fwdTable))
    postings(s, indexDir)
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "term").sortBy("term", "doc_id")
      .saveAsTable(idx.postingsTable)
    stats(s, indexDir).write.mode("overwrite").parquet(idx.statsPath)
    // per-term metadata mirrors bm25Index's impacts-bearing layout:
    // df AND max_sat, both derived from the stored postings with the
    // CURRENT global avgdl — impacts must be recomputed at fold time
    // because avgdl drifts as deltas accumulate (a per-batch max under
    // the batch-local avgdl would not bound the merged scorer)
    val avgdlC = s.read.parquet(idx.statsPath)
      .select(col("avgdl")).head.getDouble(0)
    val satC = col("tf") * lit(SearchQueries.K1 + 1) /
      (col("tf") + lit(SearchQueries.K1) *
        (lit(1 - SearchQueries.B) +
          lit(SearchQueries.B) * col("dl") / lit(avgdlC)))
    s.table(idx.postingsTable).groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"), max(satC).as("max_sat"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "term").sortBy("term")
      .saveAsTable(idx.dfreqTable)
    // forward copy re-buckets the STORED postings (one delta-merge pass
    // above, not two)
    s.table(idx.postingsTable)
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "doc_id").sortBy("doc_id", "term")
      .saveAsTable(idx.fwdTable)
    idx
  }

  /** Fold the positional deltas into the bucketed positional serving
    * table (the [[SearchQueries.phraseIndex]] layout: `bucketBy(8,
    * term)`, sorted within buckets). Additive to [[compact]] on purpose
    * — frequency-only deployments never pay the positions IO, matching
    * the separate-.pos-file layout of the batch-built index. */
  def compactPositions(s: SparkSession, indexDir: String): String = {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(indexDir.getBytes).map("%02x".format(_)).mkString.take(8)
    val table = s"bm25s_pos_$suffix"
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    SearchQueries.reclaimOrphanTables(s, Seq(table))
    positions(s, indexDir)
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "term").sortBy("term", "doc_id")
      .saveAsTable(table)
    table
  }

  /** BM25 top-k off a compacted index — the serving-path probe
    * ([[SearchQueries.qBm25Stored]] shape: `In(term, …)` pushed into a
    * bucket-pruned scan). */
  def searchCompacted(s: SparkSession, idx: SearchQueries.Bm25Index,
      queries: Seq[(Long, String)] = SearchQueries.Bm25Queries,
      k: Int = 5): DataFrame = {
    val (terms, qterms) = SearchQueries.queryTerms(s, queries)
    SearchQueries.scoreIndex(
      s.table(idx.postingsTable).filter(col("term").isin(terms: _*)),
      s.table(idx.dfreqTable).filter(col("term").isin(terms: _*)),
      s.read.parquet(idx.statsPath), qterms, k)
  }
}
