package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Dataset-assembly ops: split determinism/shape, mixing-rate bounds,
  * contamination plan shape (oracle equivalence is the driver gate). */
class PipelineQueriesSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("split assignment: exhaustive, deterministic, ~90/5/5") {
    val out = PipelineQueries.qSplitAssign(spark, sf).collect()
    val total = out.map(_.getLong(2)).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs, "every doc gets exactly one split")
    val bySplit = out.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val train = bySplit("train").toDouble / total
    assert(train > 0.8 && train < 0.97, s"train share $train")
    // hash-based: identical across evaluations
    assert(PipelineQueries.qSplitAssign(spark, sf).collect().toSeq == out.toSeq)
  }

  test("mix weights: rates in (0,1], pass-through for the rarest source") {
    val rows = PipelineQueries.qMixWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, rate, eff) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(rate > 0.0 && rate <= 1.0, s"rate $rate")
      assert(eff <= n, "downsampling never upsamples")
    }
    // the most under-represented source is never downsampled
    val rarest = rows.minBy(_.getLong(1))
    assert(rarest.getDouble(2) == 1.0, s"rarest source rate ${rarest.getDouble(2)}")
  }

  test("contamination: eval shingle set broadcasts; corpus never shuffles to the join") {
    val df = PipelineQueries.qContamination(spark, sf)
    df.collect()
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval set must broadcast:\n${plan.linesIterator.take(25).mkString("\n")}")
  }

  test("bloom decontamination: superset + fp budget hold; no false negatives") {
    val rows = PipelineQueries.qContaminationBloom(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"bloom missed an exact hit (impossible): $r")
      assert(r.getBoolean(4), s"false-positive budget exceeded: $r")
    }
  }

  test("bloom build/probe round-trip: inserted keys always hit, FP rate ≈ fpp") {
    import graft.functions.BloomFunctions._
    import spark.implicits._
    val keys = (1 to 5000).map(i => s"key-$i")
    val keysDf = keys.toDF("k")
    val bytes = keysDf.agg(bloomAgg(col("k"), 5000L, 1e-4).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val hits = keysDf.select(bloomMightContain(lit(bytes), col("k")).as("h"))
      .filter(col("h")).count()
    assert(hits == 5000L, "blooms have no false negatives")
    val fps = (1 to 20000).map(i => s"other-$i").toDF("k")
      .select(bloomMightContain(lit(bytes), col("k")).as("h"))
      .filter(col("h")).count()
    assert(fps <= 20, s"fp rate ${fps / 20000.0} far above configured 1e-4")
  }

  test("source quota: ≤K per source, deterministic, pre-shuffle group limit") {
    val k = 15
    val df = PipelineQueries.qSourceQuota(spark, sf, k)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getString(0))
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= k, s"$src over quota: ${rs.length}")
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    assert(df.collect().toSeq == rows.toSeq, "hash order is deterministic")
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"quota must prune before the shuffle, not after:\n$plan")
  }

  test("char-LM bits: typical docs score below atypical ones; model broadcasts") {
    import spark.implicits._
    // 9 docs share the corpus's character statistics; 1 is mojibake —
    // under the corpus-trigram model the outlier must cost more bits
    val docs = (0L until 9L).map(i =>
      (i, s"the quick brown fox jumps over the lazy dog number $i", "en", "web", 50L)) :+
      ((9L, "§±¿þß¤µ¬©®÷Ø", "en", "web", 12L))
    val dir = java.nio.file.Files.createTempDirectory("charlm").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueries.qCharLmBits(spark, dir)
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(rows.size == 10, "one row per doc")
    val typicalBits = (0L until 9L).map(rows(_)._2.get)
    val outlierBits = rows(9L)._2.get
    assert(outlierBits > typicalBits.max,
      s"mojibake doc must be atypical: $outlierBits vs ${typicalBits.max}")
    rows.values.foreach { case (n, b) =>
      assert((n == 0) == b.isEmpty, "bits defined iff the doc has trigrams")
      b.foreach(v => assert(v > 0.0, s"bits must be positive, got $v"))
    }
    // the trigram model is bounded by |charset|³, never corpus-sized —
    // the scoring join must broadcast it, keeping document data unshuffled
    val df = graft.queries.TextQueries.qCharLmBits(spark, sf)
    df.collect()
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"trigram model must broadcast:\n${plan.linesIterator.take(25).mkString("\n")}")
  }

  test("curation funnel: monotone stages that agree with the standalone operators") {
    val sf = "/root/testdata/sf0.001"
    val rows = PipelineQueries.qCurationFunnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("0_raw", "1_c4", "2_span", "3_tercile", "4_dedup"))
    val ordered = Seq("0_raw", "1_c4", "2_span", "3_tercile", "4_dedup").map(rows)
    assert(ordered.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel must be non-increasing: $ordered")
    assert(ordered.last > 0, "some docs survive the whole funnel")
    assert(ordered.head > ordered.last, "the funnel actually filters")
    // stage 1 must equal the standalone C4 keep count — the composition
    // reuses the operator, it doesn't reimplement it
    val c4Keep = graft.queries.TextQueries.qC4Clean(spark, sf).collect()
      .count(_.getBoolean(3)).toLong
    assert(rows("1_c4") == c4Keep, s"${rows("1_c4")} != standalone $c4Keep")
  }

  test("CCNet buckets: tercile assignment equals a driver-side recomputation") {
    val sf = "/root/testdata/sf0.001"
    // the score relation the buckets derive from
    val bits = graft.queries.TextQueries.qCharLmBits(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val lang = graft.queries.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // ntile(3) semantics: per lang, sort (bits NULLS FIRST, doc_id); the
    // first n mod 3 terciles take one extra row
    val want = lang.groupBy(_._2).flatMap { case (_, docs) =>
      val ordered = docs.keys.toSeq
        .sortBy(id => (bits(id).isDefined, bits(id).getOrElse(0.0), id))
      val n = ordered.size
      val base = n / 3
      val sizes = (0 until 3).map(i => base + (if (i < n % 3) 1 else 0))
      val bounds = sizes.scanLeft(0)(_ + _)
      ordered.zipWithIndex.map { case (id, i) =>
        id -> bounds.indexWhere(_ > i)
      }
    }
    val got = graft.queries.TextQueries.qCcnetBuckets(spark, sf).collect()
    assert(got.length == lang.size, "one row per doc")
    got.foreach { r =>
      val (id, tier, bucket) = (r.getLong(0), r.getInt(3), r.getString(4))
      assert(tier == want(id), s"doc $id: tier $tier != ${want(id)}")
      assert(bucket == Seq("head", "middle", "tail")(tier - 1))
    }
    // terciles are balanced within each language (ntile's contract)
    got.groupBy(_.getString(1)).foreach { case (l, rs) =>
      val sizes = rs.groupBy(_.getInt(3)).view.mapValues(_.size).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"lang $l terciles unbalanced: $sizes")
    }
  }

  test("grouped split: dup copies stay in one split; the naive leak is measured") {
    import spark.implicits._
    // ids 0 and 1 bucket to test/train under the id-keyed split (md5
    // arithmetic, precomputed) — giving both the SAME text forces the
    // exact leak the grouped split exists to prevent
    val docs = Seq(
      (0L, "dup dup dup"), (1L, "dup dup dup"),
      (2L, "solo two"), (3L, "solo three"), (4L, "solo four"))
    val dir = java.nio.file.Files.createTempDirectory("gsplitfix").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("fix"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = PipelineQueries.qSplitGrouped(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // the id-keyed split scatters the dup pair (doc 0 → test, doc 1 →
    // train): exactly one leaky group measured
    assert(rows.values.head._3 == 1L, s"leak must be measured: $rows")
    // under the grouped split both copies land together: total groups =
    // 4, and every split's n_docs ≥ n_groups with equality except where
    // the dup pair landed
    assert(rows.values.map(_._2).sum == 4L, s"4 fingerprint groups: $rows")
    val dupSplit = rows.find { case (_, (nd, ng, _)) => nd == ng + 1 }
    assert(dupSplit.nonEmpty && rows.values.map(_._1).sum == 5L,
      s"dup pair must land in ONE split: $rows")
  }

  test("drift: hand-computed smoothed KL; stable source reads ~0, shifted source reads high") {
    import spark.implicits._
    // src_stable: identical halves → KL exactly 0 after smoothing;
    // src_shift: hand-traceable 3-token halves → KL = 0.2·ln(1.5) each way
    // (pa = {0.6, 0.4}, pb = {0.4, 0.6} over vocab {a, b}, add-one, V=2);
    // src_swap: disjoint vocab halves → large drift both directions
    val docs = Seq(
      (0L, "a b", "src_stable"), (1L, "a b", "src_stable"),
      (2L, "a a b", "src_shift"), (3L, "a b b", "src_shift"),
      (4L, "x x x y", "src_swap"), (5L, "z z w w", "src_swap"))
    val dir = java.nio.file.Files.createTempDirectory("driftfix").toString
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextQueries.qDrift(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(6), r.getDouble(7))).toMap
    assert(got("src_stable") == ((0.0, 0.0)), s"stable: ${got("src_stable")}")
    val want = BigDecimal(0.2 * math.log(1.5))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("src_shift") == ((want, want)), s"shift: ${got("src_shift")}")
    assert(got("src_swap")._1 > 5 * want && got("src_swap")._2 > 5 * want,
      s"disjoint vocab must dominate: ${got("src_swap")}")
  }

  test("DSIR: target-like raw docs outrank raw-vocabulary docs and get selected") {
    import spark.implicits._
    // target sources speak vocabulary A; raw docs speak vocabulary B —
    // except doc 99, a raw doc written in the target vocabulary, which
    // importance weighting exists to surface
    val vocabA = "alpha beta gamma alpha beta"
    val vocabB = "delta epsilon zeta delta epsilon"
    val docs =
      (0L to 1L).map(i => (i, vocabA, "en", "src0", 30L)) ++
      (2L to 3L).map(i => (i, vocabA, "en", "src1", 30L)) ++
      (10L to 19L).map(i => (i, vocabB, "en", s"src${2 + i % 5}", 30L)) ++
      Seq((50L, "   ", "en", "src4", 3L), // zero tokens: kept, null score
        (99L, vocabA, "en", "src3", 30L))
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineQueries.qDsirWeights(spark, dir, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3), r.getBoolean(4)))
    assert(out.length == docs.size, "one row per doc, zero-token docs included")
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(50L)._3 == 0L && byId(50L)._4.isNaN && !byId(50L)._5,
      s"whitespace-only doc must survive with a null score: ${byId(50L)}")
    val aScores = (Seq(0L, 1L, 2L, 3L, 99L)).map(byId(_)._4)
    val bScores = (10L to 19L).map(byId(_)._4)
    assert(aScores.min > bScores.max,
      s"target-vocabulary docs must outscore raw vocabulary: $aScores vs $bScores")
    assert(byId(99L)._5, "the target-like raw doc must be selected")
    assert(out.count(_._5) == 5, "exactly k docs selected")
    // the selected flag must equal the top-k by (score desc, doc_id)
    val topK = out.sortBy(t => (-t._4, t._1)).take(5).map(_._1).toSet
    assert(out.filter(_._5).map(_._1).toSet == topK)
    // n_tokens = whitespace token count
    assert(byId(0L)._3 == 5L)
    // deterministic across evaluations
    // evict the cached score relation first, so the re-call exercises a
    // genuine RECOMPUTE (a cache hit would make this assertion vacuous)
    graft.queries.Caches.close(dir)
    val again = PipelineQueries.qDsirWeights(spark, dir, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3), r.getBoolean(4)))
    assert(again.map(_.toString).toSeq == out.map(_.toString).toSeq)
    // model is ≤B rows: the scoring join must broadcast it, document
    // data shuffles only into the per-doc aggregate
    val df = PipelineQueries.qDsirWeights(spark, sf)
    df.collect()
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"llr model must broadcast:\n${plan.linesIterator.take(25).mkString("\n")}")
  }

  test("k-anonymity: hand-counted suppression on a crafted QI table") {
    import spark.implicits._
    // en/web: one group of 6 (len 100-199) and one of 2 (len 0-99) ->
    // 1 small group, 2 suppressed rows. fr/web: single group of 5 (= k,
    // NOT small). Buckets pin the /100 integer division.
    val docs =
      (1L to 6L).map(i => (i, "x" * 150, "en", "web", 150L)) ++
        Seq((7L, "y", "en", "web", 50L), (8L, "y", "en", "web", 51L)) ++
        (9L to 13L).map(i => (i, "z" * 100, "fr", "web", 100L))
    val dir = java.nio.file.Files.createTempDirectory("kanon").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.PipelineQueries.qKAnonymity(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    assert(got(("en", "web")) == (2L, 1L, 2L, 8L, 0.25))
    assert(got(("fr", "web")) == (1L, 0L, 0L, 5L, 0.0))
  }

  test("l-diversity: homogeneous sensitive values flag the group") {
    import spark.implicits._
    // en/len-1 group: 4 docs, ALL from one source -> low diversity
    // (n_sensitive 1 < 3). en/len-0: 3 docs from 3 sources -> diverse.
    val docs =
      (1L to 4L).map(i => (i, "x" * 150, "en", "web", 150L)) ++
        Seq((5L, "y", "en", "a", 50L), (6L, "y", "en", "b", 51L),
          (7L, "y", "en", "c", 52L))
    val dir = java.nio.file.Files.createTempDirectory("ldiv").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.PipelineQueries.qLDiversity(spark, dir).head()
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L, s"groups: $r")
    assert(r.getLong(3) == 4L && r.getLong(4) == 7L, s"rows: $r")
    assert(r.getDouble(5) == 0.5714, s"frac: $r")
  }

  test("Heaps curve: exact growth on a crafted corpus; closed-form fit matches") {
    import spark.implicits._
    // doc i carries one shared token and one fresh type: after decile d
    // (one doc per decile), tokens seen = 2d, vocabulary = 1 + d
    val docs = (1L to 10L).map(i => (i, s"w new$i", "en", "web", 10L))
    val dir = java.nio.file.Files.createTempDirectory("heaps").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextQueries.qHeapsLaw(spark, dir).collect()
    assert(rows.length == 10)
    rows.zipWithIndex.foreach { case (r, i) =>
      val d = i + 1
      assert(r.getInt(0) == d)
      assert(r.getLong(1) == 2L * d, s"tokens at decile $d: $r")
      assert(r.getLong(2) == 1L + d, s"vocab at decile $d: $r")
    }
    // closed-form least squares over the same 10 log-log points
    val pts = (1 to 10).map(d => (math.log(2.0 * d), math.log(1.0 + d)))
    val (ax, ay) = (pts.map(_._1).sum / 10, pts.map(_._2).sum / 10)
    val beta = pts.map(p => (p._1 - ax) * (p._2 - ay)).sum /
      pts.map(p => (p._1 - ax) * (p._1 - ax)).sum
    val k = math.exp(ay - beta * ax)
    assert(math.abs(rows.head.getDouble(3) - beta) < 1e-5, s"beta ${rows.head}")
    assert(math.abs(rows.head.getDouble(4) - k) < 1e-3, s"k ${rows.head}")
  }

  test("DP release: noise is the analytic Laplace inverse-CDF of the hash draw") {
    import spark.implicits._
    def write(docs: Seq[(Long, String, String, String, Long)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("dprel").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val base = (1L to 10L).map(i => (i, s"doc $i", if (i <= 7) "en" else "fr", "web", 10L))
    val out = graft.queries.PipelineQueries.qDpRelease(spark, write(base))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(3), r.getDouble(4))).toMap
    assert(out.keySet == Set("en", "fr", "TOTAL"))
    // recompute the mechanism independently: u from md5, Laplace icdf
    def expectedNoise(stat: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((stat + ":dp1").getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 281474976710656.0
      val c = u - 0.5
      -math.signum(c) * math.log(1 - 2 * math.abs(c))
    }
    for ((stat, truth) <- Seq(("en", 7.0), ("fr", 3.0), ("TOTAL", 10.0))) {
      val (eps, noised, ok, composed) = out(stat)
      assert(eps == 1.0 && composed == 2.0)
      val want = BigDecimal(truth + expectedNoise(stat))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(noised == want, s"$stat: served $noised, analytic $want")
      assert(ok == (math.abs(expectedNoise(stat)) <= math.log(5000.0)),
        s"$stat budget gate")
    }
    // deterministic noise depends only on the stat name: growing a
    // language moves its release by exactly the true delta
    val grown = base ++ (11L to 15L).map(i => (i, s"doc $i", "en", "web", 10L))
    val out2 = graft.queries.PipelineQueries.qDpRelease(spark, write(grown))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(out2("en") - out("en")._2 - 5.0) < 1e-9)
    assert(out2("fr") == out("fr")._2)
  }
}
