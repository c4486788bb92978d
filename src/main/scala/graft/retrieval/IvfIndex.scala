package graft.retrieval

import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the scale path for
  * similarity search over an embedding column.
  *
  * Build: pick `c` deterministic seed vectors, refine once (mean of
  * assigned vectors, L2-normalized — one Lloyd step), then assign every
  * corpus vector to its nearest centroid. The index is the corpus plus a
  * `centroid_id` column; at production scale it is written bucketed /
  * partitioned by `centroid_id`, so probing `nprobe` lists is a
  * partition-pruned scan of nprobe/c of the data instead of a full sweep.
  *
  * Search: queries are tiny relative to the corpus (always true in
  * retrieval), so the probe set is computed driver-side against the
  * c-row centroid table and pushed down as a (query, centroid) pair join —
  * the same frontier-pushdown shape as [[Retrieval.graphExpand]]. Matches
  * within probed lists re-rank with the exact codegen cosine, so returned
  * scores are exact; only recall is approximate (misses when a true
  * neighbor's list was not probed).
  */
object IvfIndex {

  /** Deterministic centroid build **on a bounded seeded sample** — never
    * on the full corpus. Centroid quality needs O(c) observations per
    * centroid, not O(n): at 100 TB a full-corpus refinement (the round-1
    * posexplode shape: corpus×dim rows shuffled to average c centroids) is
    * a dead end, while a ~max(50·c, 2000)-row sample collects to the
    * driver in megabytes and refines locally.
    *
    * Seeding is farthest-first traversal (Gonzalez): the deterministic
    * k-means++ variant — each next seed maximizes its distance to the
    * chosen set, so seeds spread across the data instead of landing
    * wherever the id order happens to put them; spread seeds → balanced
    * lists → recall at a given nprobe and no oversized hot list at scan
    * time. Then a few Lloyd iterations refine on the sample (driver-local:
    * the sample is ≤ a few thousand rows by construction). Recall floors
    * are asserted in RetrievalSpec to keep the sampling honest. Returns
    * (centroidId, unit vector). */
  def buildCentroids(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      c: Int,
      iterations: Int = 4): Array[(Int, Array[Float])] =
    buildCentroidsWithSample(emb, idCol, vecCol, c, iterations)._1

  /** [[buildCentroids]] plus the build sample itself — callers that need a
    * cheap driver-side estimate of cluster geometry (e.g. the pruning-power
    * probe in [[graft.queries.VectorQueries.qEmbNearDup]]) reuse the sample
    * instead of paying a second corpus scan. */
  def buildCentroidsWithSample(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      c: Int,
      iterations: Int = 4): (Array[(Int, Array[Float])], Array[Array[Float]]) = {
    val n = emb.count()
    if (n == 0 || c <= 0) return (Array.empty, Array.empty)
    val target = math.max(50L * c, 2000L)
    // stable sample order: collect() order follows partition order, which
    // an input repartition may change — sort by (id) so centroids are a
    // pure function of the data
    val sampleVecs =
      (if (n <= target) emb.select(col(idCol), col(vecCol))
       else emb.select(col(idCol), col(vecCol))
         .sample(withReplacement = false, math.min(1.0, target.toDouble * 1.2 / n), seed = 42))
        .orderBy(col(idCol))
        .collect()
        .map(_.getSeq[Float](1).toArray)
    if (sampleVecs.isEmpty) return (Array.empty, Array.empty)

    // farthest-first seeding over the sample (angular distance 1 - cos)
    val k = math.min(c, sampleVecs.length)
    val seedIdx = new Array[Int](k)
    val minDist = Array.fill(sampleVecs.length)(Double.PositiveInfinity)
    seedIdx(0) = 0
    var chosen = 0
    while (chosen < k - 1) {
      val last = sampleVecs(seedIdx(chosen))
      var farthest = 0
      var farthestD = Double.NegativeInfinity
      var i = 0
      while (i < sampleVecs.length) {
        val d = 1.0 - cosineLocal(sampleVecs(i), last)
        if (d < minDist(i)) minDist(i) = d
        if (minDist(i) > farthestD) { farthestD = minDist(i); farthest = i }
        i += 1
      }
      chosen += 1
      seedIdx(chosen) = farthest
    }
    var centroids = seedIdx.zipWithIndex.map { case (si, cid) => (cid, sampleVecs(si)) }

    // Lloyd iterations on the sample: assign → mean → renormalize
    val dim = centroids(0)._2.length
    var iter = 0
    while (iter < iterations) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sampleVecs.foreach { v =>
        var bestC = 0
        var bestS = Double.NegativeInfinity
        centroids.foreach { case (cid, cv) =>
          val s = cosineLocal(v, cv)
          if (s > bestS) { bestS = s; bestC = cid }
        }
        val acc = sums(bestC)
        var i = 0
        while (i < dim && i < v.length) { acc(i) += v(i); i += 1 }
        counts(bestC) += 1
      }
      centroids = centroids.map { case (cid, prev) =>
        if (counts(cid) == 0) (cid, prev) // empty list: keep the seed
        else {
          val m = sums(cid)
          val norm = math.sqrt(m.map(x => x * x).sum)
          if (norm == 0) (cid, prev)
          else (cid, m.map(x => (x / norm).toFloat))
        }
      }
      iter += 1
    }
    (centroids, sampleVecs)
  }

  private def cosineLocal(a: Array[Float], b: Array[Float]): Double =
    Retrieval.cosineLocal(a, b)

  /** [[buildCentroids]] under a max-list-share cap (VERDICT r14 item 1,
    * the skew defense): after the plain sample-trained build, any
    * cluster whose SAMPLE share exceeds `capFrac` is split in two by a
    * driver-local 2-means over its members, repeatedly, until every
    * cluster respects the cap (or splitting stops helping — a cluster
    * of bit-identical vectors has no geometry to split on; the residual
    * defense for that degenerate mass is the q8 two-phase prune).
    *
    * Why this matters at 100 TB: the probe scan's sublinearity claim is
    * `nprobe` lists of ~n/c rows each — but real corpora are cluster-
    * skewed, and ONE hot centroid holding 30–50 % of rows turns any
    * probe that touches it back into a near-full scan (plus one giant
    * window partition in the re-rank). The cap restores a hard bound:
    * scanned rows ≤ nprobe · capFrac · n regardless of data shape.
    * Splitting (vs. re-assigning overflow to second-nearest) keeps the
    * geometry honest — sub-centroids tile the hot region, so a query
    * that lands there shortlists several sub-lists and recall holds;
    * an overflow re-assignment would scatter hot rows into lists whose
    * centroid does not represent them, which silently costs recall.
    *
    * Like all centroid training here, this is DRIVER-LOCAL over the
    * bounded seeded sample (≤ max(50·c, 2000) rows): the corpus itself
    * is still touched exactly once, by the bulk assignment scan. The
    * cap is therefore enforced on sample shares — corpus shares track
    * them to sampling error, which the slack in callers' assertions
    * absorbs. Output count may exceed `c` (at most 4·c; guard below).
    * Deterministic for a given frame. */
  def buildCentroidsBalanced(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      c: Int,
      capFrac: Double,
      iterations: Int = 4): Array[(Int, Array[Float])] = {
    val (cents0, sample) =
      buildCentroidsWithSample(emb, idCol, vecCol, c, iterations)
    if (cents0.isEmpty || sample.isEmpty) return cents0
    var cents = cents0.map(_._2).toBuffer
    val cap = math.max(1, math.floor(capFrac * sample.length).toInt)
    val maxCents = math.max(4 * c, c + 8)
    var guard = 0
    var done = false
    while (!done && cents.length < maxCents && guard < 8 * c) {
      guard += 1
      // assign the sample to current centroids (driver-local)
      val owner = sample.map { v =>
        var bc = 0; var bs = Double.NegativeInfinity; var i = 0
        while (i < cents.length) {
          val s = cosineLocal(v, cents(i))
          if (s > bs) { bs = s; bc = i }
          i += 1
        }
        bc
      }
      val counts = new Array[Int](cents.length)
      owner.foreach(counts(_) += 1)
      val hot = counts.indices.maxBy(counts(_))
      if (counts(hot) <= cap) done = true
      else {
        val members = sample.indices.filter(owner(_) == hot).map(sample(_))
        // deterministic 2-means on the hot cluster's members: seed A =
        // first member in sample order, seed B = member farthest from A
        val a0 = members.head
        val b0 = members.maxBy(m => 1.0 - cosineLocal(m, a0))
        var (ca, cb) = (a0, b0)
        var it = 0
        var degenerate = false
        while (it < 4 && !degenerate) {
          val (ma, mb) = members.partition(m =>
            cosineLocal(m, ca) >= cosineLocal(m, cb))
          if (ma.isEmpty || mb.isEmpty) degenerate = true
          else {
            def mean(ms: Seq[Array[Float]]): Array[Float] = {
              val dim = ms.head.length
              val acc = new Array[Double](dim)
              ms.foreach { m =>
                var i = 0; while (i < dim && i < m.length) { acc(i) += m(i); i += 1 } }
              val norm = math.sqrt(acc.map(x => x * x).sum)
              if (norm == 0) ms.head else acc.map(x => (x / norm).toFloat)
            }
            ca = mean(ma); cb = mean(mb)
          }
          it += 1
        }
        // a split that can't separate the members (identical vectors) or
        // didn't produce two distinct centroids would loop forever — stop
        if (degenerate || java.util.Arrays.equals(ca, cb)) done = true
        else { cents(hot) = ca; cents += cb }
      }
    }
    cents.toArray.zipWithIndex.map { case (v, i) => (i, v) }
  }

  /** Assign every vector to its nearest centroid (one scan; the centroid
    * table is broadcast as a literal — it is c rows by construction). */
  def assign(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[(Int, Array[Float])]): DataFrame =
    // same >32 dispatch as assignScored: past ~32 centroids the
    // greatest-of-structs expression re-decodes the row vector once per
    // centroid (it cost vs_knn_ivf 15 s at sf1/c=141 — evaluated inside
    // the probe join — vs ~1 s through the bulk kernel)
    if (centroids.length <= 32)
      emb.withColumn("centroid_id", best(vecCol, centroids).getField("cid"))
    else assignScored(emb, idCol, vecCol, centroids).drop("centroid_cos")

  /** Like [[assign]] but also keeps the cosine to the owning centroid —
    * the per-vector angular offset the triangle-inequality pruning in
    * [[graft.queries.VectorQueries.qEmbNearDup]] needs. */
  def assignScored(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[(Int, Array[Float])]): DataFrame =
    if (centroids.length <= 32) {
      val b = best(vecCol, centroids)
      emb.withColumn("centroid_id", b.getField("cid"))
        .withColumn("centroid_cos", b.getField("s"))
    } else
      // past ~32 centroids the greatest-of-structs expression decodes the
      // SAME row vector once per centroid (measured 13 s for a 20k×142
      // assignment — c redundant array decodes per row dominate the
      // arithmetic); the shared imperative kernel decodes once and loops
      // over a task-local centroid matrix.
      bulkAssign(emb, vecCol,
        centroids.map { case (cid, v) => (cid.toLong, v.map(_.toDouble)) },
        round6 = false, tieSmallCid = false, nullScores = false,
        intId = true, idCol = "centroid_id", scoreCol = "centroid_cos")

  /** Shared one-decode-per-row assignment kernel behind every >32-centroid
    * dispatch ([[assignScored]] here; `assignToSeeds` in
    * [[graft.queries.VectorQueries]]): decode the row vector ONCE, loop a
    * task-local centroid matrix, append (winning id, winning score). Two
    * scoring contracts live in this one kernel so callers never grow
    * private imperative copies:
    *
    *  - `round6=false, tieSmallCid=false, nullScores=false` — the IVF
    *    contract: raw cosine, ties to the LARGER cid (greatest()'s
    *    lexicographic struct max), zero-denominator pairs score 0.0 and a
    *    min-length loop tolerates ragged vectors — byte-identical to the
    *    [[Retrieval.cosineLocal]] expression twin.
    *  - `round6=true, tieSmallCid=true, nullScores=true` — the seeded-
    *    assignment oracle contract: the argmax is decided on the
    *    6dp-ROUNDED cosine (Spark `round()` semantics: HALF_UP over the
    *    shortest-decimal BigDecimal), ties break to the SMALLER cid, and
    *    null semantics mirror the `max(struct(rc, -cid))` expression
    *    exactly — empty / length-mismatched / zero-norm pairs score null,
    *    and a row whose every score is null keeps the smallest cid with a
    *    null score (null struct fields sort first, so the negated-cid
    *    tiebreak decides).
    *
    * Float element columns are upcast per element (exact), so double
    * arithmetic here is bit-identical to the codegen
    * [[graft.functions.CosineSimilarity]] loop on either element type. */
  private[graft] def bulkAssign(
      emb: DataFrame,
      vecCol: String,
      cents: Array[(Long, Array[Double])],
      round6: Boolean,
      tieSmallCid: Boolean,
      nullScores: Boolean,
      intId: Boolean,
      idCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}
    val outSchema = emb.schema
      .add(idCol, if (intId) IntegerType else LongType)
      .add(scoreCol, DoubleType)
    val vecIdx = emb.schema.fieldIndex(vecCol)
    val isFloat = emb.schema(vecIdx).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val minCid = if (cents.isEmpty) -1L else cents.map(_._1).min
    emb.mapPartitions { rows =>
      rows.map { row =>
        val v: Array[Double] =
          if (row.isNullAt(vecIdx)) Array.emptyDoubleArray
          else if (isFloat) {
            val s = row.getSeq[Float](vecIdx)
            val a = new Array[Double](s.length)
            var i = 0
            while (i < a.length) { a(i) = s(i).toDouble; i += 1 }
            a
          } else row.getSeq[Double](vecIdx).toArray
        var bestC = -1L
        var bestS = Double.NegativeInfinity
        var seen = false
        var i = 0
        while (i < cents.length) {
          val s = cosineD(v, cents(i)._2, strict = nullScores)
          if (s != null) {
            val r = if (round6) roundHalfUp6(s.doubleValue()) else s.doubleValue()
            val cid = cents(i)._1
            if (!seen || r > bestS ||
                (r == bestS && (if (tieSmallCid) cid < bestC else cid > bestC))) {
              bestS = r; bestC = cid; seen = true
            }
          }
          i += 1
        }
        val winC = if (seen) bestC else minCid // all-null: smallest cid
        val idVal: Any = if (intId) winC.toInt else winC
        val scoreVal: Any = if (seen) bestS else null
        Row.fromSeq(row.toSeq :+ idVal :+ scoreVal)
      }
    }(Encoders.row(outSchema))
  }

  /** Local double cosine. `strict = true` mirrors the
    * [[graft.functions.CosineSimilarity]] expression (null on empty /
    * length mismatch / zero denominator); `strict = false` mirrors
    * [[Retrieval.cosineLocal]] (min-length loop, 0.0 on zero
    * denominator). */
  private def cosineD(a: Array[Double], b: Array[Double],
      strict: Boolean): java.lang.Double = {
    if (strict && (a.length == 0 || a.length != b.length)) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val m = math.min(a.length, b.length)
    var i = 0
    while (i < m) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) { if (strict) null else java.lang.Double.valueOf(0.0) }
    else java.lang.Double.valueOf(dot / d)
  }

  /** Spark `round(x, 6)` for doubles, exactly: HALF_UP over the
    * shortest-decimal (valueOf) BigDecimal — property-tested against the
    * expression in BulkAssignSpec. */
  private[graft] def roundHalfUp6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  // score against each centroid, argmax via greatest-of-structs
  private def best(
      vecCol: String,
      centroids: Array[(Int, Array[Float])]): org.apache.spark.sql.Column =
    greatest(centroids.map { case (cid, v) =>
      struct(cosine(col(vecCol), typedlit(v)).as("s"), lit(cid).as("cid"))
    }: _*)

  /** Probe lists for each query vector, driver-side (centroids ≪ corpus). */
  def probes(
      queries: Seq[(Long, Array[Float])],
      centroids: Array[(Int, Array[Float])],
      nprobe: Int): Seq[(Long, Int)] =
    queries.flatMap { case (qid, qv) =>
      centroids
        .map { case (cid, cv) => (cid, cosineLocal(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(nprobe)
        .map { case (cid, _) => (qid, cid) }
    }

  /** Bulk index build: persist the assigned corpus partitioned by
    * centroid_id (plus the centroid table alongside), so probing nprobe
    * lists is a partition-pruned directory read — the "Spark ETL → bulk
    * vector index" shape of the north star. */
  def write(
      index: DataFrame,
      centroids: Array[(Int, Array[Float])],
      path: String): Unit = {
    index.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("centroid_id").parquet(s"$path/lists")
    writeCentroids(index.sparkSession, centroids, path)
  }

  /** Persist just the centroid table (`$path/centroids`, the [[load]]
    * layout) — split out so stores that manage their own lists layout
    * (the streaming index) share the artifact format. */
  def writeCentroids(
      spark: SparkSession,
      centroids: Array[(Int, Array[Float])],
      path: String): Unit = {
    import spark.implicits._
    centroids.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("centroid_id", "centroid")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/centroids")
  }

  /** Load just the centroid table written by [[writeCentroids]]. */
  def loadCentroids(spark: SparkSession, path: String): Array[(Int, Array[Float])] =
    spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Incremental refresh of a persisted index: assign the new batch to
    * the EXISTING centroids and append to their lists — the O(batch)
    * path a continuously-ingesting vector store takes — then rebuild
    * centroids only when list skew (max/mean) exceeds `maxSkew`. Skew is
    * the right trigger: a hot list turns every probe that touches it
    * into a near-full scan, which is precisely what the index exists to
    * avoid; drift that keeps lists balanced costs recall slowly and is
    * caught by the caller's recall floor, not by rebuild thrash.
    *
    * The rebuild stages to `lists.tmp` and swaps via rename, so readers
    * never observe a half-written index and the build never reads files
    * it is overwriting. Returns true iff a rebuild happened. */
  def refresh(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      maxSkew: Double = 4.0): Boolean = {
    val (_, centroids) = load(spark, path)
    require(centroids.nonEmpty, s"no centroids at $path")
    assign(batch, idCol, vecCol, centroids)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("centroid_id").parquet(s"$path/lists")

    val counts = spark.read.parquet(s"$path/lists")
      .groupBy("centroid_id").count().collect().map(_.getLong(1))
    val skew = counts.max.toDouble / (counts.sum.toDouble / centroids.length)
    if (skew <= maxSkew) false
    else {
      val all = spark.read.parquet(s"$path/lists").drop("centroid_id")
      val rebuilt = buildCentroids(all, idCol, vecCol, centroids.length)
      val reassigned = assign(all, idCol, vecCol, rebuilt)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(s"$path/lists.tmp")
      val live = new org.apache.hadoop.fs.Path(s"$path/lists")
      reassigned.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("centroid_id").parquet(tmp.toString)
      fs.delete(live, true)
      fs.rename(tmp, live)
      import spark.implicits._
      rebuilt.toSeq.map { case (cid, v) => (cid, v.toSeq) }
        .toDF("centroid_id", "centroid")
        .coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/centroids")
      true
    }
  }

  /** Load a persisted index: (lists, centroids). */
  def load(spark: SparkSession, path: String): (DataFrame, Array[(Int, Array[Float])]) = {
    val lists = spark.read.parquet(s"$path/lists")
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    (lists, centroids)
  }

  /** Top-k search: join query probe pairs against the indexed corpus on
    * centroid_id (partition-pruned at scale), exact cosine re-rank. */
  def search(
      index: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      centroids: Array[(Int, Array[Float])],
      nprobe: Int,
      k: Int): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val probeDf = probes(queries, centroids, nprobe).toDF("query_id", "p_cid")
    val queryDf = queries.toDF("query_id", "qv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    index
      .join(broadcast(probeDf), col("centroid_id") === col("p_cid"))
      .join(broadcast(queryDf), "query_id")
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("score", cosine(col(vecCol), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank"))
  }

  /** [[search]] with INT8-quantized probe scans (VERDICT r3 item 8): the
    * probed lists score with the integer `cosine_sim_q8` kernel over a
    * `q8` column — 4 bytes/dim less IO when the stored index materializes
    * it ([[write]] of an index built via [[withQ8]]) — keeping
    * `overfetch × k` candidates per query, which then re-rank with the
    * exact float cosine. Output equals [[search]] whenever no true
    * top-k neighbor falls outside the overfetch window (q8 ordering
    * error ≤ 1/254 per element — the qKnnQuant contract, asserted by
    * equality in RetrievalSpec). */
  def searchQ8(
      index: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      centroids: Array[(Int, Array[Float])],
      nprobe: Int,
      k: Int,
      overfetch: Int = 8,
      q8Margin: Double = 0.03): DataFrame = {
    import graft.functions.VectorFunctions.{cosineQ8, quantizeQ8}
    val spark = index.sparkSession
    import spark.implicits._
    val probeDf = probes(queries, centroids, nprobe).toDF("query_id", "p_cid")
    val queryDf = queries.toDF("query_id", "qv")
      .withColumn("qq8", quantizeQ8(col("qv")))
    val indexed = withQ8(index, vecCol)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col(idCol))
    val wk = Window.partitionBy(col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    indexed
      .join(broadcast(probeDf), col("centroid_id") === col("p_cid"))
      .join(broadcast(queryDf), "query_id")
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("qscore", cosineQ8(col("q8"), col("qq8")))
      .withColumn("crank", row_number().over(wq))
      // same error-aware widening as [[searchQ8Lists]]: candidates the
      // quantizer cannot distinguish from the k-th boundary survive
      .withColumn("kth_q", max(when(col("crank") === k, col("qscore"))).over(wk))
      .filter(col("crank") <= overfetch * k ||
        (col("kth_q").isNotNull && col("qscore") >= col("kth_q") - lit(q8Margin)))
      .withColumn("score", cosine(col(vecCol), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank"))
  }

  /** Materialize the q8 column on an index (idempotent — a stored index
    * that already carries `q8` is used as-is). */
  def withQ8(index: DataFrame, vecCol: String): DataFrame = {
    import graft.functions.VectorFunctions.quantizeQ8
    if (index.columns.contains("q8")) index
    else index.withColumn("q8", quantizeQ8(col(vecCol)))
  }

  /** Materialize PQ codes on an index (idempotent, like [[withQ8]]). */
  def withPq(index: DataFrame, vecCol: String,
      cb: graft.functions.PqCodebooks): DataFrame = {
    import graft.functions.VectorFunctions.pqEncode
    if (index.columns.contains("pq")) index
    else index.withColumn("pq", pqEncode(col(vecCol), cb))
  }

  /** Train PQ codebooks for an embedding frame on the same bounded
    * seeded sample discipline as [[buildCentroids]] — never the full
    * corpus. Deterministic for a given frame. */
  def trainPq(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ks: Int): graft.functions.PqCodebooks = {
    val n = emb.count()
    val target = math.max(50L * ks, 2000L)
    val sample =
      (if (n <= target) emb.select(col(idCol), col(vecCol))
       else emb.select(col(idCol), col(vecCol))
         .sample(withReplacement = false,
           math.min(1.0, target.toDouble * 1.2 / n), seed = 42))
        .orderBy(col(idCol))
        .collect()
        .map(_.getSeq[Float](1).toArray)
    graft.functions.PqCodebooks.train(sample, m, ks)
  }

  /** IVF-PQ search ([[graft.functions.PqCodebooks]]): the probe phase
    * touches ONLY (id, centroid_id, pq) — m bytes of code per candidate
    * instead of 4·dim of float — and scores with the ADC kernel against
    * each query's broadcast lookup table; the `overfetch × k` survivors
    * re-rank with the exact float cosine, so scores are exact and only
    * recall is approximate (same contract as [[searchQ8]], one more
    * compression step down: float 256 B → q8 64 B → PQ 8 B per 64-dim
    * vector). Works on an in-memory frame or loaded stored lists; with a
    * stored index the probe scan's ReadSchema carries no float vectors. */
  def searchPq(
      index: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      centroids: Array[(Int, Array[Float])],
      cb: graft.functions.PqCodebooks,
      nprobe: Int,
      k: Int,
      overfetch: Int = 8): DataFrame = {
    import graft.functions.VectorFunctions.pqAdc
    val spark = index.sparkSession
    import spark.implicits._
    val probeDf = probes(queries, centroids, nprobe).toDF("query_id", "p_cid")
    val queryDf = queries.toDF("query_id", "qv")
    val tableDf = queries.map { case (qid, qv) => (qid, cb.adcTable(qv).toSeq) }
      .toDF("query_id", "dt")
    val coded = withPq(index, vecCol, cb)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col(idCol))
    val candidates = coded.select(col(idCol), col("centroid_id"), col("pq"))
      .join(broadcast(probeDf), col("centroid_id") === col("p_cid"))
      .join(broadcast(tableDf), "query_id")
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("adc", pqAdc(col("pq"), col("dt"), cb.ks))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= overfetch * k)
      .select(col("query_id"), col(idCol))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    index.select(col(idCol), col(vecCol))
      .join(candidates, idCol)
      .join(broadcast(queryDf), "query_id")
      .withColumn("score", cosine(col(vecCol), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank"))
  }

  /** Persist trained PQ codebooks alongside an index: one row per
    * (subspace, code) centroid — the index artifact a stored
    * [[searchPqStored]] reloads. */
  def writePq(
      spark: SparkSession,
      cb: graft.functions.PqCodebooks,
      path: String): Unit = {
    import spark.implicits._
    val rows = for {
      j <- 0 until cb.m
      c <- 0 until cb.ks
    } yield (j, c, cb.subDim, cb.centroids(j)(c).toSeq)
    rows.toDF("subspace", "code", "sub_dim", "centroid")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/pq_codebooks")
  }

  /** Load PQ codebooks written by [[writePq]]. */
  def loadPq(spark: SparkSession, path: String): graft.functions.PqCodebooks = {
    val rows = spark.read.parquet(s"$path/pq_codebooks").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getSeq[Float](3).toArray)))
      .toMap
    require(rows.nonEmpty, s"no PQ codebooks at $path")
    val m = rows.keys.map(_._1).max + 1
    val ks = rows.keys.map(_._2).max + 1
    val subDim = rows.values.head._1
    val cents = Array.tabulate(m, ks)((j, c) => rows((j, c))._2)
    graft.functions.PqCodebooks(subDim, cents)
  }

  /** Two-phase IVF-PQ search against a STORED index (the PQ analogue of
    * [[searchQ8Stored]], one compression tier further down): the probe
    * phase reads ONLY (id, centroid_id, pq) — m bytes of code per
    * candidate, no float vectors and no q8 in the scan (ReadSchema
    * asserted in RetrievalSpec) — scores with the ADC kernel against each
    * query's broadcast lookup table, and keeps `overfetch × k` per query;
    * the fetch phase joins the survivors back for float vectors and
    * re-ranks with the exact cosine. For 64-dim float32 vectors the probe
    * scan shrinks 32× vs the float column (256 B → 8 B per row). */
  def searchPqStored(
      spark: SparkSession,
      path: String,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      nprobe: Int,
      k: Int,
      overfetch: Int = 8): DataFrame = {
    import graft.functions.VectorFunctions.pqAdc
    import spark.implicits._
    val (lists, centroids) = load(spark, path)
    require(lists.columns.contains("pq"),
      s"index at $path has no pq column — build it via withPq before write")
    val cb = loadPq(spark, path)
    val probeDf = probes(queries, centroids, nprobe).toDF("query_id", "p_cid")
    val queryDf = queries.toDF("query_id", "qv")
    val tableDf = queries.map { case (qid, qv) => (qid, cb.adcTable(qv).toSeq) }
      .toDF("query_id", "dt")
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col(idCol))
    val candidates = lists.select(col(idCol), col("centroid_id"), col("pq"))
      .join(broadcast(probeDf), col("centroid_id") === col("p_cid"))
      .join(broadcast(tableDf), "query_id")
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("adc", pqAdc(col("pq"), col("dt"), cb.ks))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= overfetch * k)
      .select(col("query_id"), col(idCol))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    lists.select(col(idCol), col(vecCol))
      .join(candidates, idCol)
      .join(broadcast(queryDf), "query_id")
      .withColumn("score", cosine(col(vecCol), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank"))
  }

  /** Two-phase q8 search against a STORED index — the form that actually
    * realizes the 4-bytes/dim IO saving ([[searchQ8]] on an in-memory
    * frame still decodes the float column in the same scan):
    *
    *   1. probe phase reads ONLY (id, centroid_id, q8) — column pruning
    *     keeps the float vectors out of the scan entirely (asserted on
    *     ReadSchema in PlanQualitySpec) — and prunes each probed list to
    *     `overfetch × k` candidates per query with the integer kernel;
    *   2. fetch phase joins the surviving candidate ids back against the
    *     store to read float vectors for ~overfetch × k × Q rows, then
    *     re-ranks with the exact cosine.
    *
    * At 100 TB the probe scan is the dominant cost and shrinks ~4× for
    * 384-dim float32 vectors; the fetch is a point-lookup-sized join.
    * Output equals [[search]] under the same overfetch contract
    * (equality asserted in RetrievalSpec). */
  def searchQ8Stored(
      spark: SparkSession,
      path: String,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      nprobe: Int,
      k: Int,
      overfetch: Int = 8): DataFrame = {
    val (lists, centroids) = load(spark, path)
    require(lists.columns.contains("q8"),
      s"index at $path has no q8 column — build it via withQ8 before write")
    searchQ8Lists(lists, idCol, vecCol, queries, centroids, nprobe, k, overfetch)
  }

  /** The two-phase body of [[searchQ8Stored]] over an explicit lists
    * relation — callers that pre-filter their stored lists (the streaming
    * index store reads only strictly-earlier batch directories,
    * [[graft.streaming.EmbedStream]]) compose the filter with the same
    * narrow probe scan. */
  def searchQ8Lists(
      lists: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      centroids: Array[(Int, Array[Float])],
      nprobe: Int,
      k: Int,
      overfetch: Int = 8,
      q8Margin: Double = 0.03): DataFrame = {
    import graft.functions.VectorFunctions.{cosineQ8, quantizeQ8}
    val spark = lists.sparkSession
    import spark.implicits._
    val probeDf = probes(queries, centroids, nprobe).toDF("query_id", "p_cid")
    val queryDf = queries.toDF("query_id", "qv")
      .withColumn("qq8", quantizeQ8(col("qv")))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col(idCol))
    // Adaptive prune window (r15, found by the sf1 skew gate): the
    // fixed overfetch·k cut assumes q8 ordering roughly agrees with
    // exact ordering near the top — true for spread-out corpora, FALSE
    // inside a near-duplicate blob, where true separations (~1e-4) sit
    // far below q8 quantization noise (per-element error ≤ 1/254; ~3e-3
    // RMS on cosines at 64–384 dims). There the q8 ranks are noise and
    // the true top-k lands outside any fixed window — measured recall
    // collapse at 20k rows under a 50 % duplicated-text cluster. So in
    // addition to the fixed window, keep EVERY candidate whose q8 score
    // is within `q8Margin` of the k-th best: candidates the quantizer
    // cannot distinguish from the boundary must survive to the exact
    // re-rank. Uniform data keeps ~overfetch·k rows (the margin ball is
    // sparse); degenerate blobs promote the whole blob — the exact cost
    // of answering "nearest among indistinguishables", distributed, and
    // exactly the mass the dedup operators upstream exist to collapse.
    val wk = Window.partitionBy(col("query_id"))
    val candidates = lists.select(col(idCol), col("centroid_id"), col("q8"))
      .join(broadcast(probeDf), col("centroid_id") === col("p_cid"))
      .join(broadcast(queryDf.select(col("query_id"), col("qq8"))), "query_id")
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("qscore", cosineQ8(col("q8"), col("qq8")))
      .withColumn("crank", row_number().over(wq))
      .withColumn("kth_q", max(when(col("crank") === k, col("qscore"))).over(wk))
      .filter(col("crank") <= overfetch * k ||
        (col("kth_q").isNotNull && col("qscore") >= col("kth_q") - lit(q8Margin)))
      .select(col("query_id"), col(idCol))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    lists.select(col(idCol), col(vecCol))
      .join(candidates, idCol)
      .join(broadcast(queryDf.select(col("query_id"), col("qv"))), "query_id")
      .withColumn("score", cosine(col(vecCol), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank"))
  }
}
