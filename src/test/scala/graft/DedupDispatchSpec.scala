package graft

import graft.queries.DedupQueries

/** The size-gated Jaccard dispatch: both branches are exact and must be
  * row-identical; the gate itself just picks the cheaper plan. */
class DedupDispatchSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("triangle count: exact on known graphs, once per triangle, no cartesian") {
    import spark.implicits._
    def stats(edges: Seq[(Long, Long)]): (Long, Long) = {
      val r = DedupQueries.triangleStats(edges.toDF("a", "b")).head()
      (r.getLong(0), r.getLong(1))
    }
    // K4: C(4,3) = 4 triangles; path: 0; star (hub degree 5): 0;
    // two triangles sharing an edge: 2
    assert(stats(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))) == (6L, 4L))
    assert(stats(Seq((1L,2L),(2L,3L),(3L,4L))) == (3L, 0L))
    assert(stats(Seq((9L,1L),(9L,2L),(9L,3L),(9L,4L),(9L,5L))) == (5L, 0L))
    assert(stats(Seq((1L,2L),(1L,3L),(2L,3L),(1L,4L),(2L,4L))) == (5L, 2L))
    // plan shape: the wedge step must be an equi-join on the low vertex
    val df = DedupQueries.qDedupTriangles(spark, sf)
    df.collect()
    val p = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "triangle join must stay equi-keyed")
  }

  test("triangle broadcast and wedge-join branches agree (cap forces fallback)") {
    import spark.implicits._
    // K4 + shared-edge triangles + a star + a path: cap=0 forces the
    // legacy wedge self-join plan, which no dataset reaches by default
    val g = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),
      (5L,6L),(5L,7L),(6L,7L),(5L,8L),(6L,8L),
      (9L,10L),(9L,11L),(9L,12L),(13L,14L),(14L,15L)).toDF("a", "b")
    def run(cap: Long) = {
      val r = DedupQueries.triangleStats(g, cap).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(run(Long.MaxValue) == run(0L), "gate must not change the counts")
    assert(run(0L) == (16L, 6L))
  }

  test("pagerank: conservation, symmetry, and hub dominance on known graphs") {
    import spark.implicits._
    // star K1,4: hub must outrank leaves; leaves symmetric
    val star = DedupQueries.pagerankRanks(
      Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(star(0L) > star(1L), s"hub must dominate: $star")
    assert((1L to 4L).map(star).distinct.size == 1, "leaves are symmetric")
    assert(math.abs(star.values.sum - 5.0) < 1e-3, "ranks sum to N (no dangling)")
    // cycle: perfect symmetry → every rank_scaled = 1
    val cyc = DedupQueries.pagerankRanks(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b"), 10)
      .collect().map(_.getDouble(1))
    assert(cyc.forall(v => math.abs(v - 1.0) < 1e-9), cyc.toSeq)
  }

  test("prefix-filtered Jaccard output equals the naive inverted-index join") {
    val naive = DedupQueries.qDedupJaccard(spark, sf).collect().toSeq
    val prefix = DedupQueries.qDedupJaccardPrefixFull(spark, sf).collect().toSeq
    assert(prefix == naive)
  }

  test("gate: small corpus routes dd_jaccard_prefix to the naive plan") {
    // sf0.001 is far below PrefixGateDocs → the dispatched plan must not
    // contain the prefix filter's ranking window
    val p = DedupQueries.qDedupJaccardPrefix(spark, sf)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("window"), p.linesIterator.take(20).mkString("\n"))
  }

  test("star CC agrees with label propagation on the simhash dup graph") {
    val prop = DedupQueries.qDedupClusters(spark, sf).collect().toSeq
    val stars = DedupQueries.qDedupClustersStars(spark, sf).collect().toSeq
    assert(stars == prop)
  }

  test("substring spans: hand-computable coverage on a crafted corpus") {
    import spark.implicits._
    // d0 ≡ d1 (every 8-gram duplicated), d2 shares only its first 8-gram
    // with them, d3 is below the W=8 span threshold, d4 repeats an 8-token
    // block WITHIN one document (within-doc occurrences must count too)
    val docs = Seq(
      (0L, "a b c d e f g h i j", "en", "web", 19L),
      (1L, "a b c d e f g h i j", "en", "web", 19L),
      (2L, "a b c d e f g h x y", "en", "web", 19L),
      (3L, "u1 u2 u3 u4 u5 u6 u7", "en", "web", 20L),
      (4L, "p q r s t u v w p q r s t u v w", "en", "web", 31L))
    val dir = java.nio.file.Files.createTempDirectory("ddsub").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupQueries.qDedupSubstring(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((10L, 10L, 1.0)), "exact dup covers every token")
    assert(out(1L) == ((10L, 10L, 1.0)))
    assert(out(2L) == ((10L, 8L, 0.8)), "only the shared leading 8-gram")
    assert(out(3L) == ((7L, 0L, 0.0)), "below the span threshold")
    assert(out(4L) == ((16L, 16L, 1.0)), "within-doc repeat covers both copies")
  }

  test("substring rewrite: cleaned text is exact on the crafted corpus") {
    import spark.implicits._
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // same corpus as the coverage fixture; expectations are the cleaned
    // TEXTS, so the keep/drop decision and reassembly are value-checked
    val docs = Seq(
      (0L, "a b c d e f g h i j", "en", "web", 19L),
      (1L, "a b c d e f g h i j", "en", "web", 19L),
      (2L, "a b c d e f g h x y", "en", "web", 19L),
      (3L, "u1 u2 u3 u4 u5 u6 u7", "en", "web", 20L),
      (4L, "p q r s t u v w p q r s t u v w", "en", "web", 31L))
    val dir = java.nio.file.Files.createTempDirectory("ddsubrw").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupQueries.qDedupSubstringRewrite(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5)))).toMap
    assert(out(0L) == ((10L, 0L, 10L, md5(""))), "exact dup fully removed")
    assert(out(1L) == ((10L, 0L, 10L, md5(""))))
    assert(out(2L) == ((10L, 2L, 8L, md5("x y"))),
      "shared leading 8-gram cut, unique tail survives in order")
    assert(out(3L) == ((7L, 7L, 0L, md5("u1 u2 u3 u4 u5 u6 u7"))),
      "below-threshold doc unchanged")
    assert(out(4L) == ((16L, 0L, 16L, md5(""))),
      "within-doc repeat removes both copies")
  }

  test("substring rewrite removal count equals the measurement query corpus-wide") {
    // the two operators decide coverage with DIFFERENT relational programs
    // (lag-window interval union vs union+running-max) — their per-doc
    // token counts agreeing on real data is a strong cross-check of both
    val measured = DedupQueries.qDedupSubstring(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rewritten = DedupQueries.qDedupSubstringRewrite(spark, sf).collect()
    assert(rewritten.nonEmpty)
    rewritten.foreach { r =>
      assert(r.getLong(3) == measured(r.getLong(0)),
        s"doc ${r.getLong(0)}: removed ${r.getLong(3)} != dup ${measured(r.getLong(0))}")
    }
  }

  test("line dedup: cleaned text exact on a crafted corpus; rule fires corpus-wide") {
    import spark.implicits._
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val shared = "b1 b2 b3 b4 b5 b6 b7 b8" // boilerplate line in docs 0 and 1
    val docs = Seq(
      (0L, s"$shared u1 u2 u3 u4 u5 u6 u7 u8", "en", "web", 40L),
      (1L, s"$shared v1 v2 v3 v4 v5 v6 v7 v8", "en", "web", 40L),
      (2L, s"$shared $shared", "en", "web", 40L), // within-doc repeat: both drop
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "en", "web", 20L)) // 2 unique lines
    val dir = java.nio.file.Files.createTempDirectory("ddline").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupQueries.qLineDedup(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(4)))).toMap
    assert(out(0L) == ((2, 1, md5("u1 u2 u3 u4 u5 u6 u7 u8"))),
      "shared boilerplate line cut, unique line survives")
    assert(out(1L) == ((2, 1, md5("v1 v2 v3 v4 v5 v6 v7 v8"))))
    assert(out(2L) == ((2, 0, md5(""))), "within-doc repeated line drops both")
    assert(out(3L) == ((2, 2, md5("w1 w2 w3 w4 w5 w6 w7 w8 w9"))),
      "short tail line is its own unique line")
    // the phrase-pool corpus must actually repeat lines across docs
    val corpus = DedupQueries.qLineDedup(spark, sf).collect()
    assert(corpus.exists(r => r.getInt(2) < r.getInt(1)),
      "some real doc loses a duplicated line")
    assert(corpus.exists(r => r.getInt(2) == r.getInt(1)),
      "some real doc keeps every line")
  }

  test("substring spans at sf0.01: coverage invariants hold corpus-wide") {
    val sf = "/root/testdata/sf0.01"
    val rows = DedupQueries.qDedupSubstring(spark, sf).collect()
    val nDocs = graft.queries.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "one row per document")
    rows.foreach { r =>
      val (n, dup, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dup >= 0 && dup <= n, s"doc ${r.getLong(0)}: dup=$dup n=$n")
      // coverage is a union of 8-wide spans: any covered doc has ≥8
      assert(dup == 0 || dup >= 8, s"doc ${r.getLong(0)}: partial span dup=$dup")
      assert(math.abs(frac - (dup.toDouble / n * 10000).round / 10000.0) < 1e-9)
    }
    // the synthetic corpus templates text from a small phrase pool, so
    // duplicated spans must exist, including fully-templated docs
    assert(rows.count(_.getLong(2) > 0) > 0, "no duplicated spans found")
    assert(rows.exists(_.getDouble(3) == 1.0), "expected fully-covered docs")
  }

  test("star CC contracts a chain graph — the propagation worst case") {
    import spark.implicits._
    // 0-1-2-...-99 single chain (diameter 99), plus an isolated pair
    val chain = (0L until 99L).map(i => (i, i + 1)) :+ (500L, 501L)
    val labels = DedupQueries.componentsStars(spark,
      chain.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 99L).forall(labels(_) == 0L),
      "every chain node must label to the component min")
    assert(labels(500L) == 500L && labels(501L) == 500L)
    assert(labels.size == 102)
  }

  test("star CC agg-explode and join-back kernels agree (cap forces fallback)") {
    import spark.implicits._
    // chain (adversarial diameter) + triangle + hub star + isolated pair
    val g = ((0L until 40L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L)) ++
      (200L until 210L).map(i => (250L, i)) :+ (300L, 301L))
      .toDF("doc_a", "doc_b")
    def run(cap: Long) = DedupQueries.componentsStars(spark, g, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val agg = run(Long.MaxValue) // agg-explode kernel
    val join = run(0L)           // join-back fallback
    assert(agg == join, "both star kernels must produce identical labels")
    assert(agg.count(_._2 == 0L) == 41 && agg.count(_._2 == 100L) == 3 &&
      agg.count(_._2 == 200L) == 11 && agg.count(_._2 == 300L) == 2)
  }

  test("source overlap: exact matrix on a crafted corpus; zero-overlap pairs absent") {
    import spark.implicits._
    // srcA={"a b c","b c d"}, srcB={"a b c","b c e"}, srcC disjoint
    val docs = Seq(
      (1L, "a b c d", "en", "srcA", 7L),
      (2L, "a b c e", "en", "srcB", 7L),
      (3L, "x y z w", "en", "srcC", 7L))
    val dir = java.nio.file.Files.createTempDirectory("srcov").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.DedupQueries.qSourceOverlap(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // A∩B = {"a b c"}: inter 1, union 3, jaccard 1/3; C shares nothing →
    // its pairs don't appear (inner intersection join by design)
    assert(out.keySet == Set(("srcA", "srcB")))
    assert(out(("srcA", "srcB")) == ((1L, 3L, 0.3333)))
    // corpus-wide sanity at test SF: bounds + determinism
    val sf = "/root/testdata/sf0.001"
    val m = graft.queries.DedupQueries.qSourceOverlap(spark, sf).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getString(0) < r.getString(1), "unordered pair, a < b")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(3))
      val j = r.getDouble(4)
      assert(j > 0.0 && j <= 1.0, s"jaccard $j")
    }
    val m2 = graft.queries.DedupQueries.qSourceOverlap(spark, sf).collect()
    assert(m2.map(_.toString).toSeq == m.map(_.toString).toSeq)
  }

  test("soft dedup: cluster mass sums to one effective doc per cluster") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.DedupQueries.qSoftDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == totalDocs, "every doc weighed once")
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getLong(1) + 1e-9, "weights never upsample")
      assert(r.getDouble(4) <= r.getLong(3) + 1e-9)
    }
    // Σ eff_docs = #clusters + #isolated docs: each near-dup cluster
    // contributes exactly one doc of mass, everything else weighs 1
    val clusters = graft.queries.DedupQueries.qDedupClusters(spark, sf).collect()
    val clustered = clusters.map(_.getLong(1)).sum
    val expected = clusters.length + (totalDocs - clustered)
    val effTotal = rows.map(_.getDouble(2)).sum
    assert(math.abs(effTotal - expected) < 0.01,
      s"effective corpus size $effTotal vs clusters+isolated $expected")
  }

  test("sorted neighborhood: adjacency blocking on a crafted corpus") {
    import spark.implicits._
    // d0/d1: near-dups sharing their whole prefix — MUST sort adjacent
    // and verify ≥0.8. d2 shares d0's first words only (candidate by
    // adjacency, rejected by verification). d5/d9 are far apart in key
    // space — never candidates despite being near-dups of nothing.
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (0L, base + " one", "en", "web", 60L),
      (1L, base + " two", "en", "web", 60L),
      (2L, "the quick brown cat sat still on a completely different mat entirely", "en", "web", 60L),
      (5L, "zebra stripes pattern in the wild savanna at dusk tonight", "en", "web", 50L),
      (9L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "web", 50L))
    val dir = java.nio.file.Files.createTempDirectory("ddsnm").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.DedupQueries.qSortedNeighborhood(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.keySet == Set((0L, 1L)), s"only the prefix-adjacent near-dup pair: $out")
    assert(out((0L, 1L)) >= 0.8)
  }

  test("containment: a swallowed doc flags at containment 1.0 where Jaccard misses") {
    import spark.implicits._
    // d1 is wholly contained in d0 (a 4x wrapper): containment = 1.0 but
    // J = |small|/|big| << 0.8 — the pair ONLY containment finds. d2/d3
    // share nothing with them.
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val pad = (1 to 30).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (0L, s"$pad $small ${pad.replace("pad", "tail")}", "en", "web", 300L),
      (1L, small, "en", "web", 50L),
      (2L, "one two three four five six seven eight nine ten", "en", "web", 50L),
      (3L, "uno dos tres cuatro cinco seis siete ocho nueve", "en", "web", 50L))
    val dir = java.nio.file.Files.createTempDirectory("ddcont").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.DedupQueries.qDedupContainment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out.keySet == Set((0L, 1L)), s"only the swallowed pair: $out")
    val (c, j, missed) = out((0L, 1L))
    assert(c == 1.0, s"full containment: $c")
    assert(j < 0.8 && missed, s"resemblance must miss it: j=$j")
    // and the Jaccard operator indeed does not emit the pair
    val jac = graft.queries.DedupQueries.qDedupJaccard(spark, dir).collect()
    assert(!jac.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
  }

  test("edit distance: exact DP value on a crafted corpus; exact copies contract first") {
    import spark.implicits._
    // d0 ≡ d1 ≡ d2 (exact copies — must contract to ONE representative),
    // d3 = d0 with two words SWAPPED: identical distinct-token set, so
    // simhash (order-blind) blocks them at distance 0 — and the edit
    // distance is the signal that separates reorder from copy,
    // d4 shares nothing
    val base = "the quick brown fox jumps over the lazy dog again today"
    val swapped = "the brown quick fox jumps over the lazy dog again today"
    val docs = Seq(
      (0L, base, "en", "web", 55L), (1L, base, "en", "web", 55L),
      (2L, base, "en", "web", 55L), (3L, swapped, "en", "web", 55L),
      (4L, "completely unrelated writing with nothing shared at all", "en", "web", 55L))
    val dir = java.nio.file.Files.createTempDirectory("ddedit").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.DedupQueries.qDedupEditDistance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // exactly one audit row: doc 3 against its anchor (representative 0)
    // — never 1 or 2 (contracted away before blocking)
    assert(out.keySet == Set((3L, 0L)), s"contracted representatives only: $out")
    // reference Wagner–Fischer DP, independent of both engines
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val (dist, sim) = out((3L, 0L))
    val want = lev(base, swapped)
    assert(dist == want.toLong, s"DP distance: got $dist, reference $want")
    assert(sim == BigDecimal(1.0 - want.toDouble / base.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"sim $sim")
  }

  test("sorted neighborhood pairs are verified-exact: subset of the full Jaccard join") {
    val snm = graft.queries.DedupQueries.qSortedNeighborhood(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = graft.queries.DedupQueries.qDedupJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(snm.subsetOf(full),
      s"SNM must emit a verified subset of the exact pair relation: ${snm -- full}")
  }
}
