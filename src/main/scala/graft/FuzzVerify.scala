package graft

import graft.queries.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Randomized differential fuzzing against the DuckDB oracle (VERDICT
  * r12 item 6): every row in the standing correctness gate is a FIXED
  * query, so a systematic divergence that happens to miss the chosen
  * constants (a date-boundary off-by-one, a wrong null treatment under
  * an empty group, a tiebreak that only matters for some k) survives
  * round after round. This main draws N seeded parameter vectors across
  * twenty query templates — date windows, thresholds, group keys,
  * top-k cuts, semi/anti membership, window ranks, text predicates,
  * and (r14) the dd/vs surfaces: shingle-k × Jaccard threshold,
  * MinHash bands/rows, SimHash Hamming radius with pigeonhole-derived
  * banding, filtered kNN with drawn k, containment, exact-dup
  * normalization modes, BM25 with drawn (k1, b), sessionization with a
  * drawn inactivity gap, backward as-of join with drawn (type pair,
  * strict bound, window-vs-custom-merge plan path), k-core with drawn
  * (k, round budget), and (r15) the STREAMING stores under drawn
  * micro-batch splits — SpanStream postings, MinhashStream near-dup
  * pairs, SketchStream CMS ledger, EventStream hourly ledger, each
  * driven through its real writeDelta kernel with a drawn (batch
  * count, salted arrival assignment, corpus subset) and checked for
  * split-invariance of the merge-on-read view — builds
  * the Spark result AND the equivalent DuckDB SQL from the SAME
  * parameters, and dumps both in the [[Verify]] contract (parquet per
  * query + oracle_sql.json), so `tools/oracle_check.py` replays the
  * whole batch with the gate's own comparator (sorted columns, sorted
  * rows, 9-dp float rounding).
  *
  * Determinism: seed s runs template s % templates.length with parameters from
  * `new Random(s * GOLDEN)`, so any failing `fuzz_t<k>_s<seed>` row is
  * reproducible in isolation (SPARK_GRAFT_ONLY on the name re-runs it).
  * Occasional empty results are kept — both engines must agree on
  * empty, which is itself a class the fixed suite under-tests.
  *
  * Usage: `sbt "runMain graft.FuzzVerify <sfDir> <outDir> [nSeeds]"`
  * then `python3 tools/oracle_check.py <sfDir> <outDir>`.
  */
object FuzzVerify {

  private val Golden = 0x9E3779B97F4A7C15L

  private def day(base: java.time.LocalDate, off: Int): String =
    base.plusDays(off.toLong).toString

  /** One template instantiation: (spark frame, duckdb sql). */
  private type Gen = (SparkSession, String, scala.util.Random) => (DataFrame, String)

  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")
  private val langs = Seq("en", "de", "fr", "es", "zh")
  private val words = Seq("the", "data", "and", "for", "model")
  private val shipBase = java.time.LocalDate.parse("1995-01-02")
  private val evBase = java.time.LocalDate.parse("2024-01-01")

  /** t0: lineitem pricing summary over a random ship-date window. */
  private val t0: Gen = (s, d, r) => {
    val d1 = day(shipBase, r.nextInt(2200))
    val d2 = day(java.time.LocalDate.parse(d1), 30 + r.nextInt(400))
    val df = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(d1).cast("timestamp") &&
        col("l_shipdate") < lit(d2).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    val sql =
      s"""SELECT l_returnflag, l_linestatus,
         |  round(sum(l_quantity),2) AS sum_qty, count(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '$d1' AND l_shipdate < TIMESTAMP '$d2'
         |GROUP BY 1,2 ORDER BY 1,2""".stripMargin
    (df, sql)
  }

  /** t1: one-row revenue under random quantity/discount thresholds
    * (sometimes empty-group null — both engines must agree). */
  private val t1: Gen = (s, d, r) => {
    val qLo = 1 + r.nextInt(30)
    val qHi = qLo + r.nextInt(25)
    val disc = math.round(r.nextDouble() * 8.0) / 100.0
    val df = Tables.lineitem(s, d)
      .filter(col("l_quantity").between(qLo, qHi) && col("l_discount") >= disc)
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(30,10)")), 2).cast("double")
        .as("revenue"), count(lit(1)).as("n"))
    val sql =
      s"""SELECT CAST(round(sum(CAST(l_extendedprice*(1-l_discount)
         |    AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |WHERE l_quantity BETWEEN $qLo AND $qHi AND l_discount >= $disc""".stripMargin
    (df, sql)
  }

  /** t2: order-priority rollup over a random (date, totalprice) slice. */
  private val t2: Gen = (s, d, r) => {
    val d1 = day(shipBase.minusDays(1), r.nextInt(2000))
    val d2 = day(java.time.LocalDate.parse(d1), 60 + r.nextInt(500))
    val t = 20000 + r.nextInt(280000)
    val df = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(d1).cast("timestamp") &&
        col("o_orderdate") < lit(d2).cast("timestamp") &&
        col("o_totalprice") > t)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(30,10)")), 2)
          .cast("double").as("sum_tp"))
      .orderBy(col("o_orderpriority"))
    val sql =
      s"""SELECT o_orderpriority, count(*) AS n,
         |  CAST(round(sum(o_totalprice::DECIMAL(30,10)), 2) AS DOUBLE)
         |    AS sum_tp
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '$d1' AND o_orderdate < TIMESTAMP '$d2'
         |  AND o_totalprice > $t
         |GROUP BY 1 ORDER BY 1""".stripMargin
    (df, sql)
  }

  /** t3: top-k orders by totalprice with the orderkey tiebreak — k is
    * the fuzzed parameter the fixed suite never varies. */
  private val t3: Gen = (s, d, r) => {
    val k = 5 + r.nextInt(56)
    val d1 = day(shipBase.minusDays(1), r.nextInt(1800))
    val d2 = day(java.time.LocalDate.parse(d1), 90 + r.nextInt(700))
    val df = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(d1).cast("timestamp") &&
        col("o_orderdate") < lit(d2).cast("timestamp"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        round(col("o_totalprice"), 2).as("tp"))
    val sql =
      s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
         |  round(o_totalprice,2) AS tp
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '$d1' AND o_orderdate < TIMESTAMP '$d2'
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT $k""".stripMargin
    (df, sql)
  }

  /** t4: semi/anti membership with a random nation set — the flipped
    * EXISTS polarity is drawn, not fixed. */
  private val t4: Gen = (s, d, r) => {
    val nations = r.shuffle((0 to 24).toList).take(3 + r.nextInt(6)).sorted
    val t = 50000 + r.nextInt(250000)
    val anti = r.nextBoolean()
    val big = Tables.orders(s, d).filter(col("o_totalprice") > t)
      .select(col("o_custkey"))
    val df = Tables.customer(s, d)
      .filter(col("c_nationkey").isin(nations: _*))
      .join(big, col("c_custkey") === col("o_custkey"),
        if (anti) "left_anti" else "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
    val ex = if (anti) "NOT EXISTS" else "EXISTS"
    val sql =
      s"""SELECT c_mktsegment, count(*) AS n FROM customer c
         |WHERE c_nationkey IN (${nations.mkString(",")})
         |  AND $ex (SELECT 1 FROM orders o
         |           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > $t)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    (df, sql)
  }

  /** t5: per-customer top-n window rank, rolled up by priority — n and
    * the rank tiebreak direction are the fuzzed surface. */
  private val t5: Gen = (s, d, r) => {
    val n = 1 + r.nextInt(3)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(30,10)")), 2)
          .cast("double").as("sum_tp"))
      .orderBy(col("o_orderpriority"))
    val sql =
      s"""SELECT o_orderpriority, count(*) AS n,
         |  CAST(round(sum(o_totalprice::DECIMAL(30,10)), 2) AS DOUBLE)
         |    AS sum_tp
         |FROM (SELECT o_orderpriority, o_totalprice,
         |        row_number() OVER (PARTITION BY o_custkey
         |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
         |      FROM orders)
         |WHERE rn <= $n GROUP BY 1 ORDER BY 1""".stripMargin
    (df, sql)
  }

  /** t6: event hourly rollup over a random (type-set, day-window). */
  private val t6: Gen = (s, d, r) => {
    val types = r.shuffle(eventTypes).take(1 + r.nextInt(3)).sorted
    val d1 = day(evBase, r.nextInt(25))
    val d2 = day(java.time.LocalDate.parse(d1), 1 + r.nextInt(6))
    val df = Tables.events(s, d)
      .filter(col("event_type").isin(types: _*) &&
        col("ts") >= lit(d1).cast("timestamp") &&
        col("ts") < lit(d2).cast("timestamp"))
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
    val inList = types.map(t => s"'$t'").mkString(",")
    val sql =
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         |  event_type, count(*) AS n, round(sum(value),2) AS sum_value
         |FROM events
         |WHERE event_type IN ($inList)
         |  AND ts >= TIMESTAMP '$d1' AND ts < TIMESTAMP '$d2'
         |GROUP BY 1,2 ORDER BY hour, event_type""".stripMargin
    (df, sql)
  }

  /** t7: heavy-user count under a random (type, min-events) HAVING. */
  private val t7: Gen = (s, d, r) => {
    val tpe = eventTypes(r.nextInt(eventTypes.length))
    val m = 1 + r.nextInt(5)
    val perUser = Tables.events(s, d)
      .filter(col("event_type") === tpe)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= m)
    val df = perUser.agg(count(lit(1)).as("n_users"),
      coalesce(sum(col("n")), lit(0L)).cast("long").as("n_events"))
    val sql =
      s"""WITH u AS (
         |  SELECT user_id, count(*) AS n FROM events
         |  WHERE event_type = '$tpe' GROUP BY 1 HAVING count(*) >= $m)
         |SELECT count(*) AS n_users,
         |  coalesce(sum(n),0)::BIGINT AS n_events FROM u""".stripMargin
    (df, sql)
  }

  /** t8: document stats under random (lang-set, char-band, contains). */
  private val t8: Gen = (s, d, r) => {
    val ls = r.shuffle(langs).take(1 + r.nextInt(3)).sorted
    val lo = 50 + r.nextInt(400)
    val hi = lo + 200 + r.nextInt(2000)
    val w = words(r.nextInt(words.length))
    val df = Tables.t(s, d, "documents")
      .filter(col("lang").isin(ls: _*) && col("n_chars").between(lo, hi))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        sum(when(col("text").contains(w), 1L).otherwise(0L)).as("n_with_word"))
      .orderBy(col("lang"))
    val inList = ls.map(l => s"'$l'").mkString(",")
    val sql =
      s"""SELECT lang, count(*) AS n, round(avg(n_chars),2) AS avg_chars,
         |  sum(CASE WHEN contains(text, '$w') THEN 1 ELSE 0 END)::BIGINT
         |    AS n_with_word
         |FROM documents
         |WHERE lang IN ($inList) AND n_chars BETWEEN $lo AND $hi
         |GROUP BY 1 ORDER BY 1""".stripMargin
    (df, sql)
  }

  /** t9: customer⋈orders⋈nation revenue by nation under a random
    * (region, date-window) — the broadcast-dim join shape. */
  private val t9: Gen = (s, d, r) => {
    val reg = r.nextInt(5)
    val d1 = day(shipBase.minusDays(1), r.nextInt(1500))
    val d2 = day(java.time.LocalDate.parse(d1), 120 + r.nextInt(900))
    val df = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(d1).cast("timestamp") &&
        col("o_orderdate") < lit(d2).cast("timestamp"))
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).filter(col("n_regionkey") === reg)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(30,10)")), 2)
          .cast("double").as("revenue"))
      .orderBy(col("n_name"))
    val sql =
      s"""SELECT n_name, count(*) AS n,
         |  CAST(round(sum(o_totalprice::DECIMAL(30,10)), 2) AS DOUBLE)
         |    AS revenue
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE n_regionkey = $reg
         |  AND o_orderdate >= TIMESTAMP '$d1' AND o_orderdate < TIMESTAMP '$d2'
         |GROUP BY 1 ORDER BY 1""".stripMargin
    (df, sql)
  }

  // ---- dd/vs templates (VERDICT r13 item 4): the suite's riskiest
  // logic — shingling, banding, signature and threshold semantics in the
  // dedup family, rank/tiebreak semantics in the vector family — was
  // fixed-constant; these draw the parameters the fixed rows never vary.

  /** Shared shingle relation for the dedup templates: distinct word
    * k-grams via the SAME native expression the dd family uses. */
  private def shingleRel(s: SparkSession, d: String, k: Int): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.TextFunctions.shingles(col("text"), k).as("sh"))
      .filter(size(col("sh")) > 0)

  /** DuckDB CTE producing the same (doc_id, s) distinct word-k-gram
    * postings as [[shingleRel]] explodes. */
  private def shingleSql(k: Int): String = {
    val terms = (0 until k)
      .map(j => if (j == 0) "w[i]" else s"w[i+$j]").mkString("||' '||")
    s"""tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') w
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    unnest(list_distinct([$terms FOR i IN range(1, len(w)-${k - 2})])) s
       |  FROM tok WHERE len(w) >= $k)""".stripMargin
  }

  /** Exact shingle-Jaccard pairs at (k, t) — the engine half shared by
    * t10/t11/t14: inverted-index join, never doc×doc. */
  private def jaccardPairs(s: SparkSession, d: String, k: Int,
      denom: (Column, Column, Column) => Column): DataFrame = {
    val sh = shingleRel(s, d, k)
    val posting = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val cnt = sh.select(col("doc_id"), size(col("sh")).as("n"))
    posting.as("a")
      .join(posting.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("sim",
        col("inter").cast("double") /
          denom(col("na"), col("nb"), col("inter")).cast("double"))
  }

  /** t10: exact shingle-Jaccard pairs under a drawn (shingle-k,
    * threshold) — k and t are exactly what dd_jaccard never varies. */
  private val t10: Gen = (s, d, r) => {
    val k = 2 + r.nextInt(3)
    val tTen = 5 + r.nextInt(5) // 0.5 .. 0.9 as an exact decimal literal
    val t = tTen / 10.0
    val df = jaccardPairs(s, d, k, (na, nb, inter) => na + nb - inter)
      .filter(col("sim") >= t)
      .select(col("doc_a"), col("doc_b"), round(col("sim"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
    val sql =
      s"""WITH ${shingleSql(k)},
         |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id i, b.doc_id j, count(*) inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT i AS doc_a, j AS doc_b,
         |  round(inter / (ca.n + cb.n - inter)::DOUBLE, 4) AS jaccard
         |FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |WHERE inter / (ca.n + cb.n - inter)::DOUBLE >= 0.$tTen
         |ORDER BY doc_a, doc_b""".stripMargin
    (df, sql)
  }

  /** t11: MinHash-LSH mechanics under drawn (numHashes, rows-per-band,
    * threshold): the verified candidate set must be a SUBSET of the
    * exact pair set (verification threshold semantics) and its size
    * bounded by it, while the exact count differentially checks against
    * DuckDB — banding/signature bugs (slice off-by-one, band-key
    * collisions dropped, threshold >= vs >) flip a boolean. */
  private val t11: Gen = (s, d, r) => {
    import graft.functions.TextFunctions.{jaccardShingles, minhashBands, minhashSignature}
    val numHashes = Seq(16, 32, 64)(r.nextInt(3))
    val rows = Seq(2, 4)(r.nextInt(2))
    val bands = numHashes / rows
    val tTen = 7 + r.nextInt(3) // 0.7 .. 0.9
    val t = tTen / 10.0
    val k = 3
    val exact = jaccardPairs(s, d, k, (na, nb, inter) => na + nb - inter)
      .filter(col("sim") >= t)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val sh = shingleRel(s, d, k)
    val signed = sh.select(col("doc_id"),
      minhashSignature(col("sh"), numHashes).as("sig"))
    val banded = minhashBands(signed, numHashes, bands)
    val verified = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .filter(jaccardShingles(col("sha"), col("shb")) >= t)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val nExact = exact.count()
    val nVerified = verified.count()
    val nInExact =
      verified.join(exact, Seq("doc_a", "doc_b"), "left_semi").count()
    import s.implicits._
    val df = Seq((nExact, nInExact == nVerified, nVerified <= nExact))
      .toDF("n_exact", "subset_ok", "bounded_ok")
    val sql =
      s"""WITH ${shingleSql(k)},
         |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id i, b.doc_id j, count(*) inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT count(*) AS n_exact, TRUE AS subset_ok, TRUE AS bounded_ok
         |FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |WHERE inter / (ca.n + cb.n - inter)::DOUBLE >= 0.$tTen""".stripMargin
    (df, sql)
  }

  /** t12: SimHash near-dup pairs under a drawn Hamming radius, with the
    * band layout re-derived per radius from the pigeonhole guarantee
    * (radius+1 bands of 60/(radius+1) bits: ≤ radius differing bits
    * leave ≥ 1 band identical, so the band equi-join is lossless). The
    * fixed dd_simhash row only ever exercises radius 3 / 4×15. */
  private val t12: Gen = (s, d, r) => {
    import graft.functions.TextFunctions.{simhash, tokens}
    val radius = 1 + r.nextInt(5)
    val nBands = radius + 1
    val bandBits = 60 / nBands
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), simhash(tokens(col("text"))).as("sig"))
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until nBands).map { bi =>
        shiftright(col("sig"), bi * bandBits).bitwiseAND((1L << bandBits) - 1)
      }: _*)).as(Seq("band_idx", "band_key")))
    val df = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("dist",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int"))
      .filter(col("dist") <= radius)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
    val sql =
      s"""WITH ${graft.queries.DedupQueries.simhashSigSql}
         |SELECT a.doc_id doc_a, b.doc_id doc_b,
         |  bit_count(xor(a.sig, b.sig))::INT dist
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= $radius
         |ORDER BY doc_a, doc_b""".stripMargin
    (df, sql)
  }

  /** t13: filtered brute-force kNN under drawn (k, modulus filter) —
    * the vs family's rank/tiebreak semantics where score ties meet a
    * candidate filter, with k varied (vs_knn_brute pins k=5 forever). */
  private val t13: Gen = (s, d, r) => {
    import graft.functions.VectorFunctions.cosine
    val k = 3 + r.nextInt(13)
    val m = 2 + r.nextInt(4)
    val rem = r.nextInt(m)
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    val df = emb.filter(col("vec_id") % m === rem)
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("score", cosine(col("embedding"), col("qv")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
    val sql =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |q AS (SELECT vec_id query_id, v qv FROM e WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.query_id, e.vec_id neighbor_id,
         |    list_cosine_similarity(e.v, q.qv) score
         |  FROM e, q WHERE e.vec_id <> q.query_id AND e.vec_id % $m = $rem),
         |ranked AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, round(score, 6) AS score, rank
         |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
    (df, sql)
  }

  /** t14: containment pairs (inter / min set size) under drawn (k, t) —
    * the asymmetric-denominator threshold dd_containment fixes. */
  private val t14: Gen = (s, d, r) => {
    val k = 2 + r.nextInt(2)
    val tTen = 5 + r.nextInt(5)
    val t = tTen / 10.0
    val df = jaccardPairs(s, d, k, (na, nb, _) => least(na, nb))
      .filter(col("sim") >= t)
      .select(col("doc_a"), col("doc_b"), round(col("sim"), 4).as("containment"))
      .orderBy(col("doc_a"), col("doc_b"))
    val sql =
      s"""WITH ${shingleSql(k)},
         |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id i, b.doc_id j, count(*) inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT i AS doc_a, j AS doc_b,
         |  round(inter / least(ca.n, cb.n)::DOUBLE, 4) AS containment
         |FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |WHERE inter / least(ca.n, cb.n)::DOUBLE >= 0.$tTen
         |ORDER BY doc_a, doc_b""".stripMargin
    (df, sql)
  }

  /** t15: exact-dup fingerprint stats under a drawn text normalization
    * (raw / lower / trim / whitespace-collapse) — the canonicalization
    * step dd_exact runs with one fixed mode. */
  private val t15: Gen = (s, d, r) => {
    val mode = r.nextInt(4)
    val (key, keySql) = mode match {
      case 0 => (col("text"), "text")
      case 1 => (lower(col("text")), "lower(text)")
      case 2 => (trim(col("text")), "trim(text)")
      case _ => (regexp_replace(lower(col("text")), "\\s+", " "),
        "regexp_replace(lower(text), '\\s+', ' ', 'g')")
    }
    val df = Tables.t(s, d, "documents")
      .groupBy(key.as("k"))
      .agg(count(lit(1)).as("n_copies"))
      .agg(count(lit(1)).as("n_unique"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
        coalesce(sum(col("n_copies") - 1), lit(0L)).cast("long").as("n_removed"))
    val sql =
      s"""WITH fp AS (
         |  SELECT $keySql AS k, count(*) AS n_copies
         |  FROM documents GROUP BY 1)
         |SELECT count(*) AS n_unique,
         |  sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups,
         |  coalesce(sum(n_copies - 1), 0)::BIGINT AS n_removed
         |FROM fp""".stripMargin
    (df, sql)
  }

  /** t16: BM25 under drawn (k1, b, query set, top-k) — the ks family's
    * saturation/length-normalization arithmetic runs through the SAME
    * engine kernel and SQL generator the fixed ks_bm25 row uses
    * (SearchQueries.bm25Scores / bm25Sql), with the two constants the
    * fixed row never varies drawn across their practical ranges. */
  private val t16: Gen = (s, d, r) => {
    import graft.queries.SearchQueries
    import s.implicits._
    val k1 = Seq(0.6, 0.9, 1.2, 1.5, 2.0)(r.nextInt(5))
    val b = Seq(0.0, 0.25, 0.5, 0.75, 1.0)(r.nextInt(5))
    val k = 3 + r.nextInt(8)
    val vocab = Seq("hash", "join", "sort", "window", "merge", "stream",
      "batch", "spark", "filter", "scan", "table", "vector", "query", "data")
    val qs = (0 until 3).map { qi =>
      qi.toLong -> r.shuffle(vocab).take(2 + r.nextInt(2)).mkString(" ") }
    val qterms = qs.toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(split(col("qtext"), " ")).as("term")).distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val df = SearchQueries.bm25Scores(
        SearchQueries.tokenized(s, d), qterms, k1, b)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score"), col("n_terms_hit"))
      .orderBy(col("query_id"), col("rank"))
    val values = qs.map { case (id, q) => s"(${id}::BIGINT, '$q')" }
      .mkString(", ")
    val sql =
      s"""WITH ${SearchQueries.bm25Sql(
        s"""q(query_id, qtext) AS (VALUES $values),
           |qt AS (
           |  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) term
           |  FROM q)""".stripMargin, k1, b)},
         |ranked AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, doc_id) rank
         |  FROM bm25)
         |SELECT query_id, rank::INTEGER AS rank, doc_id, score, n_terms_hit
         |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
    (df, sql)
  }

  /** t17: sessionization under a drawn inactivity gap (the fixed
    * ev_sessionize row pins 1800 s forever) — per-user session summary
    * so the output stays bounded at any gap. */
  private val t17: Gen = (s, d, r) => {
    val gapSec = Seq(60, 300, 900, 1800, 3600, 7200)(r.nextInt(6))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val df = Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
            gapSec * 1000000L, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))
    val sql =
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, ts,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >
         |              $gapSec::BIGINT * 1000000 THEN 1 ELSE 0 END AS new_session
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sessions AS (
         |  SELECT *, (sum(new_session) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
         |    AS session_seq
         |  FROM flagged),
         |per_session AS (
         |  SELECT user_id, session_seq, count(*) AS n_events
         |  FROM sessions GROUP BY 1, 2)
         |SELECT user_id, count(*) AS n_sessions,
         |  max(n_events) AS max_session_events,
         |  sum(n_events)::BIGINT AS n_events
         |FROM per_session GROUP BY 1 ORDER BY user_id""".stripMargin
    (df, sql)
  }

  /** t18: backward as-of join under drawn (left type, right type,
    * strict bound, PLAN PATH) — the riskiest custom code in the repo is
    * the hand-written merge operator (AsofJoinPlan → AsofMergeJoinExec);
    * the fixed rows pin one type pair and the inclusive bound forever.
    * The drawn path makes the window composition and the custom
    * physical operator interchangeable targets of the same DuckDB
    * `ASOF LEFT JOIN`, strict drawn on BOTH (`>` vs `>=`). */
  private val t18: Gen = (s, d, r) => {
    val lt = eventTypes(r.nextInt(eventTypes.length))
    val rts = eventTypes.filter(_ != lt)
    val rt = rts(r.nextInt(rts.length))
    val strict = r.nextBoolean()
    val merge = r.nextBoolean()
    val e = Tables.events(s, d)
    val leftDf = e.filter(col("event_type") === lt)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val rightDf = e.filter(col("event_type") === rt)
      .select(col("user_id"), col("ts"), col("value"))
    val joined =
      if (merge) graft.operators.AsofJoin.asofMerge(
        leftDf, rightDf, Seq("user_id"), "ts", "ts", Seq("value"), strict)
      else graft.operators.AsofJoin.asofBackward(
        leftDf, rightDf, Seq("user_id"), "ts", "ts", Seq("value"), strict)
    val df = joined.select(col("event_id"), col("user_id"),
        col("value").as("l_value"),
        col("asof_value").as("r_value"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("r_ts"))
      .orderBy(col("event_id"))
    val op = if (strict) ">" else ">="
    val sql =
      s"""WITH l AS (
         |  SELECT event_id, user_id, ts, value FROM events
         |  WHERE event_type = '$lt'),
         |rr AS (
         |  SELECT user_id, ts, max(value) AS rv
         |  FROM events WHERE event_type = '$rt' GROUP BY 1, 2)
         |SELECT l.event_id, l.user_id,
         |  l.value AS l_value,
         |  rr.rv AS r_value,
         |  strftime(rr.ts, '%Y-%m-%d %H:%M:%S') AS r_ts
         |FROM l ASOF LEFT JOIN rr
         |  ON l.user_id = rr.user_id AND l.ts $op rr.ts
         |ORDER BY l.event_id""".stripMargin
    (df, sql)
  }

  /** t19: k-core over the simhash near-dup graph under drawn (k, round
    * budget) — BOTH sides run the identical bounded peel (the engine's
    * kcoreNodes and the oracle's unrolled MATERIALIZED rounds), so even
    * a not-yet-converged budget must agree row-for-row; the fixed
    * dd_kcore row pins k=3, rounds=8 forever. */
  private val t19: Gen = (s, d, r) => {
    import graft.queries.DedupQueries
    val k = 2 + r.nextInt(5)
    val rounds = 2 + r.nextInt(7)
    val df = DedupQueries.kcoreNodes(DedupQueries.pairGraph(s, d), k, rounds)
      .orderBy(col("node"))
    val roundsSql = (1 to rounds).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT src node FROM (
         |    SELECT e.src, count(*) d
         |    FROM edges e JOIN k${i - 1} x ON x.node = e.src
         |                 JOIN k${i - 1} y ON y.node = e.dst
         |    GROUP BY e.src)
         |  WHERE d >= $k)""".stripMargin
    }.mkString(",\n")
    val sql =
      s"""WITH ${DedupQueries.simhashSigSql},
         |${DedupQueries.simhashPairsSql("doc_a", "doc_b")},
         |edges AS MATERIALIZED (
         |  SELECT doc_a src, doc_b dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |k0 AS MATERIALIZED (SELECT DISTINCT src node FROM edges),
         |$roundsSql
         |SELECT e.src AS node, count(*)::BIGINT AS core_deg
         |FROM edges e JOIN k$rounds x ON x.node = e.src
         |             JOIN k$rounds y ON y.node = e.dst
         |GROUP BY 1 ORDER BY 1""".stripMargin
    (df, sql)
  }

  // ---- streaming twins under drawn batch splits (VERDICT r14 item 3) --
  // The streaming stores' merge-on-read contract is SPLIT-INVARIANCE:
  // the served relation must not depend on HOW arrival carved the
  // corpus into micro-batches. The fixed specs pin one 3-way pmod split
  // forever; these templates draw (batch count, salted assignment,
  // corpus subset) per seed, drive the stores through the SAME
  // writeDelta kernels the foreachBatch sinks run, and check the merged
  // view — against DuckDB directly where the semantics are relational
  // (t20 span coverage, t23 hourly ledger), and against the in-engine
  // batch kernel plus a DuckDB-checkable exact bound where banding /
  // sketching isn't SQL-expressible (t21 minhash pairs, t22 CMS).

  /** Recursive best-effort delete of a per-seed temp store (the merged
    * result is localCheckpoint'ed first, so the caller's write never
    * re-reads the deleted dir). */
  private def deleteRec(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val root = Paths.get(dir)
      if (Files.exists(root))
        Files.walk(root).iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Salted split of a frame into `nB` pseudo-micro-batches. */
  private def splitOf(df: DataFrame, idCol: String, salt: Int, nB: Int,
      b: Int): DataFrame =
    df.filter(pmod(xxhash64(col(idCol), lit(salt)), lit(nB)) === lit(b))

  /** t20: SpanStream duplicated-span postings under drawn (doc range,
    * batch count, arrival split): cross-batch duplicated spans must be
    * found exactly — coverage is checked against the DuckDB substring
    * oracle over the same subset, so the merge-on-read index equals the
    * batch relation AND the independent engine. */
  private val t20: Gen = (s, d, r) => {
    import graft.streaming.SpanStream
    val lo = r.nextInt(300)
    val hi = lo + 100 + r.nextInt(200)
    val nB = 2 + r.nextInt(4)
    val salt = r.nextInt(1 << 20)
    val subset = Tables.documents(s, d)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select(col("doc_id"), col("text"))
    val dir = Files.createTempDirectory("fuzz_span").toString
    (0 until nB).foreach { b =>
      SpanStream.writeDelta(splitOf(subset, "doc_id", salt, nB, b), dir, b.toLong)
    }
    val df = SpanStream.coverage(s, dir)
      .orderBy(col("doc_id")).localCheckpoint()
    deleteRec(dir)
    val sql =
      s"""WITH tok AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') w
         |  FROM documents WHERE doc_id >= $lo AND doc_id < $hi),
         |ng AS (
         |  SELECT doc_id, unnest([{'pos': i, 'g': array_to_string(w[i:i+7], ' ')}
         |    FOR i IN range(1, len(w)-6)], recursive := true)
         |  FROM tok WHERE len(w) >= 8),
         |dup AS (SELECT g FROM ng GROUP BY g HAVING count(*) >= 2),
         |occ AS (SELECT ng.doc_id AS doc_id, ng.pos AS pos FROM ng JOIN dup USING (g)),
         |lagd AS (
         |  SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) prev
         |  FROM occ),
         |cov AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN prev IS NULL THEN 8 ELSE least(8, pos - prev) END)::BIGINT dup_tokens
         |  FROM lagd GROUP BY 1)
         |SELECT t.doc_id AS doc_id, len(w)::BIGINT AS n_tokens,
         |  coalesce(c.dup_tokens, 0)::BIGINT AS dup_tokens,
         |  round(coalesce(c.dup_tokens, 0) / len(w)::DOUBLE, 4) AS dup_frac
         |FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id
         |ORDER BY doc_id""".stripMargin
    (df, sql)
  }

  /** t21: MinhashStream near-dup index under drawn (doc range, batch
    * count, split): the accumulated verified-pair store must equal the
    * batch LSH kernel at the stream's fixed (128 hashes, 32 bands, 0.8)
    * params over the union — a probe that misses the strictly-before
    * discipline double-finds or drops cross-batch pairs. The stream
    * pairs are additionally a SUBSET of the exact Jaccard pairs, whose
    * count DuckDB computes independently. */
  private val t21: Gen = (s, d, r) => {
    import graft.functions.TextFunctions.{jaccardShingles, minhashBands, minhashSignature, shingles}
    import graft.streaming.MinhashStream
    val lo = r.nextInt(350)
    val hi = lo + 60 + r.nextInt(90)
    val nB = 2 + r.nextInt(3)
    val salt = r.nextInt(1 << 20)
    val subset = Tables.documents(s, d)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select(col("doc_id"), col("text"))
    val dir = Files.createTempDirectory("fuzz_mh").toString
    (0 until nB).foreach { b =>
      MinhashStream.writeDelta(splitOf(subset, "doc_id", salt, nB, b), dir, b.toLong)
    }
    val merged = MinhashStream.pairs(s, dir).localCheckpoint()
    deleteRec(dir)
    // batch truth: the same kernels over the whole subset at once
    val sh = subset
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0).localCheckpoint()
    val banded = minhashBands(
      sh.select(col("doc_id"), minhashSignature(col("sh"), 128).as("sig")),
      128, 32)
    val batchPairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      // filter on the RAW jaccard then round, exactly like writeDelta —
      // filtering on the rounded value would admit raw 0.79996 pairs
      // the stream excludes
      .withColumn("jraw", jaccardShingles(col("sha"), col("shb")))
      .filter(col("jraw") >= 0.8)
      .select(col("doc_a"), col("doc_b"),
        round(col("jraw"), 4).as("jaccard")).localCheckpoint()
    val exactPairs = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .filter(jaccardShingles(col("a.sh"), col("b.sh")) >= 0.8)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .localCheckpoint()
    val nStream = merged.count()
    val onlyStream = merged.exceptAll(batchPairs).count()
    val onlyBatch = batchPairs.exceptAll(merged).count()
    val inExact = merged.select(col("doc_a"), col("doc_b"))
      .join(exactPairs, Seq("doc_a", "doc_b"), "left_semi").count()
    import s.implicits._
    val df = Seq((exactPairs.count(),
      onlyStream == 0L && onlyBatch == 0L, inExact == nStream))
      .toDF("n_exact", "stream_eq_batch", "stream_subset_exact")
    val sql =
      s"""WITH tok AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') w
         |  FROM documents WHERE doc_id >= $lo AND doc_id < $hi),
         |sh AS (
         |  SELECT doc_id,
         |    unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
         |      FOR i IN range(1, len(w)-1)])) s
         |  FROM tok WHERE len(w) >= 3),
         |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id i, b.doc_id j, count(*) inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT count(*) AS n_exact, TRUE AS stream_eq_batch,
         |  TRUE AS stream_subset_exact
         |FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
         |WHERE inter / (ca.n + cb.n - inter)::DOUBLE >= 0.8""".stripMargin
    (df, sql)
  }

  /** t22: SketchStream CMS ledger under drawn (date window, batch
    * count, split, probe users): counter matrices ADD, so the merged
    * ledger's estimates must EQUAL the single-sketch batch estimates
    * for every probe — any split sensitivity (a dropped batch row, a
    * double-merged replay) breaks equality. Estimates are additionally
    * ≥ the exact counts (CMS never underestimates), which DuckDB
    * computes independently per (event_type, probe). */
  private val t22: Gen = (s, d, r) => {
    import graft.queries.EventQueries.{CmsConf, CmsEps, CmsSeed}
    import graft.streaming.SketchStream
    val d1 = day(evBase, r.nextInt(200))
    val d2 = day(java.time.LocalDate.parse(d1), 10 + r.nextInt(60))
    val nB = 2 + r.nextInt(3)
    val salt = r.nextInt(1 << 20)
    val probes = (0 until 5).map(_ => r.nextInt(2000).toLong).distinct.sorted
    val subset = Tables.events(s, d)
      .filter(col("ts") >= lit(d1).cast("timestamp") &&
        col("ts") < lit(d2).cast("timestamp"))
      .select(col("event_id"), col("event_type"), col("user_id"))
    val dir = Files.createTempDirectory("fuzz_cms").toString
    val ledger = s"$dir/ledger"
    (0 until nB).foreach { b =>
      SketchStream.writeDelta(splitOf(subset, "event_id", salt, nB, b),
        ledger, b.toLong)
    }
    import s.implicits._
    val probeDf = probes.toDF("user_id")
    // an all-empty window writes NO ledger (writeDelta skips empty
    // batches) — the merged view is then the empty relation, which the
    // oracle's empty `types` set mirrors
    val streamEst = (if (Files.exists(Paths.get(ledger)))
        SketchStream.estimates(s, ledger, probeDf)
      else s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_type STRING, user_id BIGINT, est_n BIGINT")))
      .withColumnRenamed("est_n", "stream_n").localCheckpoint()
    deleteRec(dir)
    val batchEst = subset.groupBy(col("event_type"))
      .agg(expr(
        s"count_min_sketch(user_id, ${CmsEps}d, ${CmsConf}d, $CmsSeed)").as("sk"))
      .crossJoin(broadcast(probeDf))
      .select(col("event_type"), col("user_id"),
        graft.functions.SketchFunctions.cmsEstimate(col("sk"), col("user_id"))
          .as("batch_n"))
    val exact = subset.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("exact_n"))
    val df = streamEst
      .join(batchEst, Seq("event_type", "user_id"))
      .join(exact, Seq("event_type", "user_id"), "left")
      .select(col("event_type"), col("user_id"),
        (col("stream_n") === col("batch_n")).as("stream_eq_batch"),
        (col("stream_n") >= coalesce(col("exact_n"), lit(0L))).as("ge_exact"))
      .orderBy(col("event_type"), col("user_id"))
    val probeList = probes.mkString("(", "), (", ")")
    val sql =
      s"""WITH types AS (
         |  SELECT DISTINCT event_type FROM events
         |  WHERE ts >= TIMESTAMP '$d1' AND ts < TIMESTAMP '$d2'),
         |probes(user_id) AS (VALUES $probeList)
         |SELECT t.event_type AS event_type, p.user_id::BIGINT AS user_id,
         |  TRUE AS stream_eq_batch, TRUE AS ge_exact
         |FROM types t CROSS JOIN probes p
         |ORDER BY event_type, user_id""".stripMargin
    (df, sql)
  }

  /** t23: EventStream hourly-count ledger under drawn (date window,
    * batch count, split): hours REPEAT across batches (unlike the
    * doc-unique delta stores), so the merge-on-read SUM of partials is
    * the surface under test — checked against DuckDB's direct hourly
    * rollup of the same window. */
  private val t23: Gen = (s, d, r) => {
    import graft.streaming.EventStream
    val d1 = day(evBase, r.nextInt(250))
    val d2 = day(java.time.LocalDate.parse(d1), 5 + r.nextInt(40))
    val nB = 2 + r.nextInt(4)
    val salt = r.nextInt(1 << 20)
    val subset = Tables.events(s, d)
      .filter(col("ts") >= lit(d1).cast("timestamp") &&
        col("ts") < lit(d2).cast("timestamp"))
      .select(col("event_id"), col("event_type"), col("ts"))
    val dir = Files.createTempDirectory("fuzz_hourly").toString
    (0 until nB).foreach { b =>
      EventStream.writeHourlyDelta(splitOf(subset, "event_id", salt, nB, b),
        dir, b.toLong)
    }
    val df = EventStream.hourlyCounts(s, dir)
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH").as("hh"), col("cnt"))
      .orderBy(col("event_type"), col("hh")).localCheckpoint()
    deleteRec(dir)
    val sql =
      s"""SELECT event_type,
         |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hh,
         |  count(*) AS cnt
         |FROM events
         |WHERE ts >= TIMESTAMP '$d1' AND ts < TIMESTAMP '$d2'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    (df, sql)
  }

  /** t24: EmbedStream IVF store under a drawn MAINTENANCE SCHEDULE
    * (appends × folds × retrains): the serving contract says results
    * are exact over the committed rows no matter how arrival carved
    * the corpus into batches or when compaction/retraining ran. The
    * drawn schedule appends the subset through the startIvf foreachBatch
    * body ([[graft.streaming.EmbedStream.ivfReportFor]] + the
    * partitioned list write), interleaving seeded folds and retrains;
    * serving probes member vectors with nprobe ≥ c and an overfetch
    * window ≥ the subset, which makes the q8 two-phase search EXACTLY
    * brute force — so DuckDB's full cosine top-k is a hash-exact
    * oracle, independent of which schedule built the store. Catches:
    * rows lost/duplicated by a fold or retrain swap, q8 re-rank
    * tiebreak drift, and any batch-boundary dependence of the store. */
  private val t24: Gen = (s, d, r) => {
    import graft.streaming.EmbedStream
    val lo = r.nextInt(120)
    val hi = lo + 40 + r.nextInt(80)
    val nB = 2 + r.nextInt(3)
    val salt = r.nextInt(1 << 20)
    val subset = Tables.embeddings(s, d)
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id"), col("embedding"))
    val dir = Files.createTempDirectory("fuzz_ivfsched").toString
    try {
      (0 until nB).foreach { b =>
        val batch = splitOf(subset, "vec_id", salt, nB, b).localCheckpoint()
        val (_, assigned) = EmbedStream.ivfReportFor(
          s, batch, dir, b.toLong, c = 4 + r.nextInt(5))
        assigned.write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$dir/lists/batch=$b")
        // drawn maintenance between appends — the schedule under test
        if (r.nextInt(3) == 0) EmbedStream.compactIndex(s, dir, upTo = Long.MaxValue)
        if (r.nextInt(3) == 0)
          EmbedStream.retrainIvf(s, dir, c = 3 + r.nextInt(6), maxSkew = 2.5)
      }
      val members = subset.collect()
        .map(row => (row.getLong(0), row.getSeq[Float](1).toArray))
        .sortBy(_._1)
      val probeIds = r.shuffle(members.indices.toList).take(6).sorted
      val k = 5
      val rows = probeIds.flatMap { i =>
        val (qid, qv) = members(i)
        // nprobe covers every centroid and overfetch·k ≥ |subset|: the
        // q8 prune keeps ALL rows, so the serve is exact brute force
        EmbedStream.probeVector(s, dir, qv, k = k,
          nprobe = 1024, overfetch = 64)
          .zipWithIndex.map { case ((nid, score), rk) =>
            (qid, nid, score, (rk + 1).toLong) }
      }
      import s.implicits._
      val df = rows.toDF("query_id", "neighbor_id", "score", "rank")
        .orderBy(col("query_id"), col("rank")).localCheckpoint()
      val qCsv = probeIds.map(members(_)._1).mkString(", ")
      val sql =
        s"""WITH e AS (
           |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
           |  WHERE vec_id >= $lo AND vec_id < $hi),
           |q AS (SELECT vec_id query_id, v qv FROM e WHERE vec_id IN ($qCsv)),
           |scored AS (
           |  SELECT q.query_id, e.vec_id neighbor_id,
           |    list_cosine_similarity(e.v, q.qv) score
           |  FROM e, q),
           |ranked AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) rank
           |  FROM scored)
           |SELECT query_id, neighbor_id, round(score, 6) AS score, rank
           |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
      (df, sql)
    } finally deleteRec(dir)
  }

  private val templates: Vector[Gen] =
    Vector(t0, t1, t2, t3, t4, t5, t6, t7, t8, t9,
      t10, t11, t12, t13, t14, t15, t16, t17, t18, t19,
      t20, t21, t22, t23, t24)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val nSeeds = if (args.length > 2) args(2).toInt else 120
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val oracles = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // per-template attempt/success tally (ADVICE r14): a template that
    // throws for EVERY seed (e.g. broken by a refactor) must fail the
    // batch loudly, not silently vanish from oracle_sql.json and leave
    // the differential gate green with zero coverage of that surface
    val attempts = new Array[Int](templates.length)
    val successes = new Array[Int](templates.length)
    (0 until nSeeds).foreach { seed =>
      val tpl = seed % templates.length
      val name = s"fuzz_t${tpl}_s$seed"
      if (only.forall(_.contains(name))) {
        val rnd = new scala.util.Random(seed.toLong * Golden + tpl)
        attempts(tpl) += 1
        // instantiation INSIDE the try: template construction analyzes
        // the plan eagerly, and one bad template must cost one recorded
        // failure, not the whole batch's oracle_sql.json
        try {
          val (df, sql) = templates(tpl)(spark, sfDir, rnd)
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          oracles(name) = sql
          successes(tpl) += 1
        } catch { case e: Throwable =>
          System.err.println(s"[fuzz] $name failed: ${e.getMessage}")
        }
      }
    }
    val json = oracles
      .map { case (k, v) => s"${Verify.jsonQuote(k)}: ${Verify.jsonQuote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val nFailed = attempts.sum - successes.sum
    val dead = attempts.indices
      .filter(i => attempts(i) > 0 && successes(i) == 0)
    println(s"[fuzz] wrote ${oracles.size} seeded cases to $outDir" +
      (if (nFailed > 0) s" ($nFailed failed)" else ""))
    spark.stop()
    if (dead.nonEmpty) {
      System.err.println(s"[fuzz] FATAL: templates with zero successful " +
        s"cases: ${dead.map("t" + _).mkString(",")} — the differential " +
        "gate has no coverage of those surfaces")
      sys.exit(3) // json already written: partial evidence persists
    }
  }
}
