package graft

import graft.queries.SearchQueries
import org.apache.spark.sql.functions._

/** BM25 keyword search + hybrid RRF fusion: hand-computed fixture scores,
  * fusion arithmetic, determinism, and the scale-shape plan assertions
  * (oracle equivalence vs DuckDB is the driver gate).
  */
class SearchQueriesSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  /** Reference BM25 (naive, driver-side) for the fixture check. */
  private def bm25Ref(corpus: Seq[(Long, String)], query: Seq[String]): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq
    }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val terms = query.distinct
    toks.flatMap { case (id, w) =>
      val score = terms.map { t =>
        val tf = w.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df = toks.values.count(_.contains(t)).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * w.size / avgdl))
        }
      }.sum
      if (score > 0) Some(id -> score) else None
    }
  }

  test("BM25 matches a hand-checkable reference on a fixture corpus") {
    import spark.implicits._
    val corpus: Seq[(Long, String)] = Seq(
      0L -> "hash join hash join hash",          // tf-heavy, short
      1L -> "hash join sort merge window scan",  // both terms once, longer
      2L -> "sort merge window scan batch",      // no query terms
      3L -> "join join join join join join join join join join", // tf saturation
      4L -> "hash table scan")                   // one term
    val dir = java.nio.file.Files.createTempDirectory("bm25fix").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SearchQueries.qBm25(spark, dir)
      .filter(col("query_id") === 0) // query 0 = "hash join"
      .collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val want = bm25Ref(corpus, Seq("hash", "join"))
    assert(got.keySet == want.keySet, s"hit sets differ: $got vs $want")
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-3, s"doc $id: $s vs ${want(id)}")
    }
    // tf saturation: doc 0 (tf 3+2, dl 5) must outrank doc 1 (tf 1+1, dl 6)
    assert(got(0L) > got(1L))
  }

  test("BM25 per-query top-k is ranked, bounded, and deterministic") {
    val rows = SearchQueries.qBm25(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val ranked = rs.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to ranked.length),
        "ranks are 1..k with no gaps")
      // scores non-increasing in rank
      assert(ranked.map(_.getDouble(3)).toSeq
        .sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
    assert(SearchQueries.qBm25(spark, sf).collect().toSeq == rows.toSeq,
      "hash-deterministic: identical across evaluations")
  }

  test("hybrid RRF: fusion arithmetic and rank-list consistency") {
    val rows = SearchQueries.qHybridRrf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vr = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val kr = if (r.isNullAt(5)) None else Some(r.getInt(5))
      assert(vr.nonEmpty || kr.nonEmpty, "every fused doc comes from a list")
      val expect = vr.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        kr.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-6,
        s"rrf ${r.getDouble(3)} != 1/(60+v)+1/(60+k) = $expect")
      assert(r.getLong(2) != r.getLong(0), "self-match excluded")
    }
    // a doc on BOTH lists must outrank a doc appearing on one list at the
    // same positions; spot-check global ordering per query instead
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getInt(1))
      assert(ranked.map(_.getDouble(3)).toSeq
        .sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        "rrf non-increasing in rank")
    }
  }

  /** Full RM3 reference (driver-side, mirrors the operator's rounding) on
    * a corpus small enough to hand-trace. */
  private def rm3Ref(corpus: Seq[(Long, String)], queries: Seq[(Long, Seq[String])],
      fbDocs: Int = 10, expTerms: Int = 8, lambda: Double = 0.5)
      : Map[(Long, Long), Double] = {
    def rnd(x: Double, p: Int): Double =
      BigDecimal(x).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = corpus.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    queries.flatMap { case (qid, qts) =>
      val terms = qts.distinct
      def bm25(weights: Seq[(String, Double)]): Map[Long, Double] =
        toks.flatMap { case (id, w) =>
          val s = weights.map { case (t, wt) =>
            val tf = w.count(_ == t).toDouble
            if (tf == 0) 0.0
            else {
              val df = toks.values.count(_.contains(t)).toDouble
              val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
              wt * idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * w.size / avgdl))
            }
          }.sum
          if (s > 0) Some(id -> rnd(s, 4)) else None
        }
      val fb = bm25(terms.map(_ -> 1.0)).toSeq
        .sortBy { case (id, s) => (-s, id) }.take(fbDocs)
      val wts = fb.flatMap { case (id, s) =>
        val w = toks(id)
        w.distinct.map(t => t -> w.count(_ == t).toDouble / w.size * s)
      }.groupBy(_._1).view.mapValues(v => rnd(v.map(_._2).sum, 6)).toMap
      val sel = wts.filterNot { case (t, _) => terms.contains(t) }.toSeq
        .sortBy { case (t, wt) => (-wt, t) }.take(expTerms)
      val sum = sel.map(_._2).sum
      val weights = terms.map(_ -> rnd(lambda / terms.size, 6)) ++
        sel.map { case (t, wt) => t -> rnd((1 - lambda) * wt / sum, 6) }
      bm25(weights).toSeq.sortBy { case (id, s) => (-s, id) }.take(5)
        .map { case (id, s) => (qid, id) -> s }
    }.toMap
  }

  test("RM3 expansion matches the driver-side reference on a fixture corpus") {
    import spark.implicits._
    // enough lexical structure that feedback docs introduce NEW terms:
    // "hash join" retrieves docs 0/1/3/4 whose other tokens (sort, merge,
    // window, scan, table, probe) become the expansion candidates
    val corpus: Seq[(Long, String)] = Seq(
      0L -> "hash join hash join probe",
      1L -> "hash join sort merge window scan",
      2L -> "sort merge window scan batch",
      3L -> "join probe table scan",
      4L -> "hash table probe build",
      5L -> "filter project exchange batch")
    val dir = java.nio.file.Files.createTempDirectory("rm3fix").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SearchQueries.qBm25Rm3(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val want = rm3Ref(corpus,
      SearchQueries.Bm25Queries.map { case (id, q) => id -> q.split(" ").toSeq })
    assert(got.keySet == want.keySet,
      s"result sets differ:\n got ${got.keySet}\nwant ${want.keySet}")
    got.foreach { case (k, s) =>
      assert(math.abs(s - want(k)) < 1e-3, s"$k: $s vs ${want(k)}")
    }
    // expansion must actually move the needle: some returned doc scores on
    // expansion terms it shares with the feedback set even when it misses
    // every original query term (doc 5 shares no term with any query 0
    // feedback doc, docs 2/3/4 ride expansion terms into query 0's list)
    val q0 = got.keySet.collect { case (0L, d) => d }
    assert(q0.exists(d => !Seq("hash", "join").exists(t =>
      corpus.toMap.apply(d).split(" ").contains(t))),
      s"query 0 top-5 $q0 must include an expansion-only doc")
  }

  test("RM3 scale shape: both corpus passes broadcast-prune; no cartesian") {
    val df = SearchQueries.qBm25Rm3(spark, sf)
    df.collect()
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), "no cartesian anywhere")
    // every join that touches the corpus-sized token stream is broadcast.
    // Since r15 the Q-bounded stage-1 feedback list and the query model
    // are localCheckpoints (the nested two-pass plan was re-optimized and
    // re-run per consumer), so the FINAL plan shows stage 3's pass only:
    // term prune + df attachment (stats ride a broadcast nested-loop-free
    // cross of a 1-row aggregate). Stage 1 runs the identical bm25Scores
    // kernel, whose plan shape ks_bm25's own assertions pin.
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected >=2 broadcast joins in the stage-3 pass:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side joins must not shuffle-sort:\n$plan")
    // (the checkpointed stage-1/2 intermediates enter as materialized RDD
    // scans, but AQE's executed-plan rendering elides materialized stage
    // subtrees, so their node is not string-assertable here; the
    // RM3-reference parity test above pins their values instead)
  }

  test("stored-index RM3: identical output; expanded terms pushed into the probe scan") {
    val direct = SearchQueries.qBm25Rm3(spark, sf).collect().toSeq
    val df = SearchQueries.qBm25Rm3Stored(spark, sf)
    val stored = df.collect().toSeq
    assert(stored == direct, "index-served RM3 must equal the direct scan")
    // the final (stage-3) probe carries the EXPANDED term set as pushed
    // In(term,…) literals — the plan is a pruned index scan, and the
    // expansion genuinely widened it beyond the original query terms
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"expanded terms must push into the postings scan:\n$plan")
    val pushed = "In\\(term, \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    val nPushed = pushed.split(",").length
    val nOrig = SearchQueries.Bm25Queries.flatMap(_._2.split(" ")).distinct.size
    assert(nPushed > nOrig,
      s"stage-3 probe should carry expansion terms too: $nPushed <= $nOrig")
    // the forward table serves by-document pulls as a bucket-pruned probe
    val idx = SearchQueries.bm25Index(spark, sf)
    val fwd = spark.table(idx.fwdTable).filter(col("doc_id") === 0L)
    fwd.collect()
    val fplan = fwd.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(fplan.contains("SelectedBucketsCount: 1 out of 8"),
      s"by-doc pull must bucket-prune the forward index:\n$fplan")
  }

  test("stored-index BM25: identical output; term filter pushed into the postings scan") {
    val direct = SearchQueries.qBm25(spark, sf).collect().toSeq
    val df = SearchQueries.qBm25Stored(spark, sf)
    val stored = df.collect().toSeq
    assert(stored == direct, "index-served BM25 must equal the direct scan")
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"query terms must push into the postings scan:\n$plan")
  }

  test("bucketed index: bucket-pruned probe; postings-dfreq join has zero exchanges") {
    val idx = SearchQueries.bm25Index(spark, sf)

    // single-term probe: the In(term,…) filter prunes to the one bucket
    // the term hashes into — the scan never touches the other 7
    val probe = spark.table(idx.postingsTable).filter(col("term") === "hash")
    probe.collect()
    val pplan = probe.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(pplan.contains("SelectedBucketsCount: 1 out of 8"),
      s"single-term probe must bucket-prune to 1 of 8:\n$pplan")
    assert(pplan.contains("PushedFilters: [IsNotNull(term), EqualTo(term,hash)"),
      s"term predicate must also push into parquet:\n$pplan")

    // index maintenance: postings ⋈ dfreq on term is a zero-exchange
    // bucket join (broadcast forced off so the layout, not the size,
    // carries the proof) — merging a new postings batch re-shuffles
    // nothing that's already in the index
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val maintained = spark.table(idx.postingsTable)
        .join(spark.table(idx.dfreqTable), "term")
        .groupBy(col("term")).agg(sum(col("tf")).as("tf_total"),
          first(col("df")).as("df"))
      val rows = maintained.collect()
      assert(rows.nonEmpty)
      val plan = maintained.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed index join must not shuffle either side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("index build reclaims an orphan warehouse location (crashed-JVM leftover)") {
    // same data, distinct index identity: the builder hashes the dir STRING
    val d2 = sf + java.io.File.separator + "."
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(d2.getBytes).map("%02x".format(_)).mkString.take(8)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // plant what a crashed JVM leaves behind: table directories on disk
    // with no entry in the (fresh, in-memory) catalog
    for (t <- Seq(s"bm25_postings_$suffix", s"bm25_dfreq_$suffix")) {
      val orphan = new org.apache.hadoop.fs.Path(wh, t)
      val out = fs.create(new org.apache.hadoop.fs.Path(orphan, "junk"), true)
      out.write(42); out.close()
      assert(fs.exists(orphan))
      assert(!spark.catalog.tableExists(t))
    }
    // without reclaim this CREATE dies with LOCATION_ALREADY_EXISTS
    val idx = SearchQueries.bm25Index(spark, d2)
    assert(spark.table(idx.postingsTable).count() > 0)
    assert(spark.table(idx.dfreqTable).count() > 0)
  }

  test("phrase search: consecutive-match semantics on a hand-traced fixture") {
    import spark.implicits._
    // query 0 = "hash join": docs 0 (starts 1,4 → tf 2) and 2 (tf 1)
    // match; docs 1/3 contain BOTH terms but never consecutively in
    // order — the rows bag-of-words BM25 would return and phrase must not
    val corpus: Seq[(Long, String)] = Seq(
      0L -> "hash join x hash join",
      1L -> "join hash z join",
      2L -> "y hash join",
      3L -> "hash z join",
      4L -> "window merge sort end",   // query 1's only true phrase hit
      5L -> "window merge x sort")
    val dir = java.nio.file.Files.createTempDirectory("phrasefix").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SearchQueries.qPhrase(spark, dir).collect()
    val tf = rows.map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    assert(tf.keySet.filter(_._1 == 0L).map(_._2) == Set(0L, 2L),
      s"query 0 phrase hits: ${tf.keySet}")
    assert(tf((0L, 0L)) == 2L && tf((0L, 2L)) == 1L)
    assert(tf.keySet.filter(_._1 == 1L).map(_._2) == Set(4L),
      "3-term phrase needs all three consecutive, in order")
    // score = single BM25 saturation expression over the phrase tf with
    // the phrase's own df — hand-check doc 0 / query 0
    val n = corpus.size.toDouble
    val avgdl = corpus.map(_._2.split(" ").length).sum.toDouble / n
    val (df0, tf0, dl0) = (2.0, 2.0, 5.0)
    val idf = math.log(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
    val want = idf * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl0 / avgdl))
    val got = rows.find(r => r.getLong(0) == 0L && r.getLong(2) == 0L)
      .get.getDouble(4)
    assert(math.abs(got - want) < 1e-3, s"score $got vs ref $want")
  }

  test("stored positional index: identical output; term probe is a pruned bucketed scan") {
    val direct = SearchQueries.qPhrase(spark, sf).collect().toSeq
    val df = SearchQueries.qPhraseStored(spark, sf)
    val stored = df.collect().toSeq
    assert(stored == direct, "positional-index phrase path must equal direct")
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"phrase terms must push into the positions scan:\n$plan")
    assert("SelectedBucketsCount: [0-7] out of 8".r.findFirstIn(plan).isDefined,
      s"positions probe must bucket-prune:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("symspell match set equals the naive cross-join levenshtein filter") {
    import spark.implicits._
    val vocab = Seq("hash", "join", "hashx", "hsh", "hask", "ahsh", "josh",
      "jion", "windw", "window", "a", "ab").toDF("term")
    val qc = Seq(0L -> "hash", 1L -> "jion", 2L -> "windw", 3L -> "ab")
      .toDF("query_id", "ct")
    val got = SearchQueries.symspellMatch(vocab, qc).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    val naive = vocab.crossJoin(qc)
      .filter(levenshtein(col("term"), col("ct")) <= 1)
      .select(col("query_id"), col("term")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == naive, s"symspell $got != naive $naive")
    // the neighborhood is exact, not approximate: transposition "ahsh" is
    // Levenshtein distance 2 from "hash" and must be absent
    assert(!got.contains((0L, "ahsh")))
    // and genuine distance-1 families are all present: deletion, insertion,
    // substitution against "hash"
    assert(Set("hash", "hsh", "hashx", "hask").forall(t => got((0L, t))))
  }

  test("fuzzy search recovers every corrupted query without a cartesian plan") {
    val df = SearchQueries.qFuzzy(spark, sf)
    val rows = df.collect()
    // each fixed query's terms were deterministically corrupted, so exact
    // lookup fails — the expansion must still rank docs for ALL queries
    assert(rows.map(_.getLong(0)).toSet ==
      SearchQueries.Bm25Queries.map(_._1).toSet,
      "every corrupted query recovers results through the fuzzy expansion")
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"candidate generation must be the delete-key equi-join:\n$plan")
  }

  test("ad-hoc searchStored: normalization + ranking equal the fixed-query stored path") {
    val adhoc = SearchQueries.searchStored(spark, sf, "  Hash   JOIN ", 5)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val fixed = SearchQueries.qBm25Stored(spark, sf).collect()
      .filter(_.getLong(0) == 0L) // query 0 = "hash join"
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(adhoc == fixed,
      s"ad-hoc path must normalize and rank like the fixed set: $adhoc vs $fixed")
  }

  test("more-like-this: nearest doc wins, seed excluded, selected terms pushed") {
    import spark.implicits._
    // seeds are doc_ids 0..4; docs 5/7 are crafted near-duplicates of
    // seeds 0/1, doc 6 shares nothing with seed 0 beyond 'delta'
    val corpus: Seq[(Long, String)] = Seq(
      0L -> "alpha beta alpha gamma",
      1L -> "hash join probe",
      2L -> "sort merge spill",
      3L -> "window frame bound",
      4L -> "scan filter project",
      5L -> "alpha beta gamma delta",
      6L -> "delta epsilon zeta",
      7L -> "hash join build probe table")
    val dir = java.nio.file.Files.createTempDirectory("mltfix").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SearchQueries.qMoreLikeThis(spark, dir).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)),
      "the seed must never match itself")
    val top1 = rows.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top1(0L) == 5L, s"seed 0's nearest is its near-duplicate: $top1")
    assert(top1(1L) == 7L, s"seed 1's nearest is its near-duplicate: $top1")

    // real data: every seed queries, exclusion holds, term probe pushed
    val df = SearchQueries.qMoreLikeThis(spark, sf)
    val real = df.collect()
    assert(real.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L, 4L))
    assert(real.forall(r => r.getLong(0) != r.getLong(2)))
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"selected MLT terms must push into the postings probe:\n$plan")
  }

  test("wildcard: prefix expansion is dictionary-exact and an equi-join in the plan") {
    import spark.implicits._
    // crafted corpus: 'hash join' expands hash* (hashing, hashmap, hash)
    // and join* (join, joined) but NOT 'has' (shorter than the prefix)
    // or 'josh'/'ahash' (prefix mismatch)
    val docs = Seq(
      (0L, "hashing tables quickly", "en", "web", 22L),
      (1L, "hashmap lookup cost", "en", "web", 19L),
      (2L, "hash join strategies", "en", "web", 20L),
      (3L, "joined relations stream", "en", "web", 23L),
      (4L, "josh has a cat", "en", "web", 14L))
    val dir = java.nio.file.Files.createTempDirectory("kswild").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SearchQueries.qWildcard(spark, dir).collect()
    val q0docs = rows.filter(_.getLong(0) == 0L).map(_.getLong(2)).toSet
    assert(q0docs == Set(0L, 1L, 2L, 3L),
      s"'hash join' must reach every hash*/join* doc and no other: $q0docs")
    // the full-corpus run: dictionary expansion must plan as an
    // equi-join (the range-scan twin), never LIKE-over-vocab nested loop
    val df = SearchQueries.qWildcard(spark, sf)
    df.collect()
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"prefix match must be the (plen, prefix) equi-join:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      "per-query top-k must filter before the final window shuffle")
  }

  test("scale shape: query-term pruning broadcasts; top-k plans pre-shuffle WindowGroupLimit") {
    val df = SearchQueries.qBm25(spark, sf)
    df.collect()
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "query terms must prune the token stream via broadcast, not shuffle")
    assert(plan.contains("WindowGroupLimit"),
      "per-query top-k must filter before the final window shuffle")
    assert(!plan.contains("CartesianProduct"), "no cartesian anywhere")
  }
}
