package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table. These are the batch
  * twins of the Structured Streaming pipeline in [[graft.streaming]]: the
  * same tumbling-window / sessionization / latest-state semantics, written
  * so a DuckDB oracle can verify them. The streaming versions share the
  * column logic (see `graft.streaming.EventStream`).
  *
  * Scale notes: windowed aggregation groups on (bucket, type) — low
  * cardinality → near-total map-side combine. Sessionization partitions by
  * user_id; at 100 TB user_id is the shuffle key and skewed users are the
  * risk — AQE skew-join/salting applies; the window itself is per-user
  * sequential which is the semantic, not an artifact.
  */
object EventQueries {

  /** Tumbling 1-hour window: count/sum per (window, event_type). */
  def qHourlyRollup(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  val qHourlyRollupSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, count(*) AS n, round(sum(value),2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Latest event per user (argmax by ts): the "current state" table a
    * streaming dedup-by-key would maintain. */
  def qLatestPerUser(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy(col("user_id"))
  }

  val qLatestPerUserSql: String =
    """SELECT user_id, event_id, event_type,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      |      FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Sessionization with a 30-minute inactivity gap: assign session ids via
    * lag + cumulative sum, then aggregate per session. Batch twin of
    * `flatMapGroupsWithState` session windows. */
  def qSessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  val qSessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT *, (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_seq
      |  FROM flagged)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
      |  round(sum(value),2) AS sum_value
      |FROM sessions GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin

  /** JSON prop extraction (the `props` column is a JSON blob, like the
    * notebook/json handling in the reference: SURVEY §2 S4/P2). */
  def qJsonProps(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(round(avg(col("k")), 2).as("avg_k"), max(col("k")).as("max_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  val qJsonPropsSql: String =
    """SELECT event_type, round(avg(k),2) AS avg_k, max(k) AS max_k, count(*) AS n
      |FROM (SELECT event_type, json_extract(props, '$.k')::INT AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Sliding deltas: hour-over-hour event-count change per type (lag window). */
  def qHourlyDelta(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    hourly
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"),
        (col("n") - coalesce(col("prev_n"), lit(0))).as("delta"))
      .orderBy(col("hour"), col("event_type"))
  }

  val qHourlyDeltaSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type, n,
      |  n - coalesce(lag(n) OVER (PARTITION BY event_type ORDER BY h), 0) AS delta
      |FROM hourly ORDER BY hour, event_type""".stripMargin

  /** Cohort retention — the day-N matrix every event warehouse reports:
    * users grouped by first-seen day (their cohort), counted distinct on
    * each later activity day, with the share of the cohort still active.
    *
    * Two shuffles total and both mergeable: (1) per-user min(day) — a
    * map-side-combinable agg keyed by user; (2) distinct (cohort, offset,
    * user) → counts. The cohort assignment joins back on user_id, the
    * same key as the first agg, so AQE reuses the exchange; nothing wider
    * than (user, day) ever moves. At 100 TB the matrix is |days|² rows —
    * report-sized — while the heavy stages stay linear scans. */
  def qRetention(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val activity = e.join(cohorts, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"),
        col("user_id"))
      .distinct()
    val sizes = cohorts.groupBy(col("cohort_day"))
      .agg(countDistinct(col("user_id")).as("cohort_n"))
    activity
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_n"))
      .join(broadcast(sizes), "cohort_day")
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("cohort_n"), col("active_n"),
        round(col("active_n").cast("double") / col("cohort_n"), 4)
          .as("retained_frac"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val qRetentionSql: String =
    """WITH e AS (SELECT user_id, ts::DATE AS day FROM events),
      |cohorts AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
      |sizes AS (SELECT cohort_day, count(*) AS cohort_n FROM cohorts GROUP BY 1),
      |activity AS (
      |  SELECT DISTINCT c.cohort_day, e.day - c.cohort_day AS day_offset,
      |    e.user_id
      |  FROM e JOIN cohorts c USING (user_id))
      |SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
      |  a.day_offset::INTEGER AS day_offset,
      |  s.cohort_n::BIGINT AS cohort_n,
      |  count(*)::BIGINT AS active_n,
      |  round(count(*) / s.cohort_n::DOUBLE, 4) AS retained_frac
      |FROM activity a JOIN sizes s USING (cohort_day)
      |GROUP BY a.cohort_day, a.day_offset, s.cohort_n
      |ORDER BY 1, 2""".stripMargin

  /** Sessionization via Spark's native `session_window` (the dedicated
    * merging-session physical operator — one shuffle on user_id, no sort
    * window needed for session assignment). Same 30-minute-gap semantics
    * and oracle as qSessionize; only the session-sequence numbering needs
    * a follow-up window over the (tiny) per-user session list. */
  def qSessionWindow(s: SparkSession, d: String): DataFrame = {
    val sessions = Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        round(sum(col("value")), 2).as("sum_value"))
    val seq = Window.partitionBy(col("user_id")).orderBy(col("w.start"))
    sessions
      .withColumn("session_seq", row_number().over(seq).cast("long"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("session_start"), col("session_end"), col("sum_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Exact interpolated percentiles per event type (Spark `percentile` ≡
    * DuckDB `quantile_cont` — both linear interpolation, so the check is
    * value-exact, unlike the sketch-based approx_percentile). */
  def qValueQuantiles(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  val qValueQuantilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.9), 4) AS p90,
      |  round(quantile_cont(value, 0.99), 4) AS p99,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** RANGE-frame window: per-user trailing 1-hour sum/count at each
    * event — the time-based frame (rows frames are covered by the lag/
    * row_number queries). RANGE frames include peer rows (equal ts) in
    * both engines, so the check is exact. */
  /** As-of enrichment: each purchase carries the user's most recent click
    * value at-or-before the purchase (the attribution join every event
    * pipeline runs). Drives [[graft.operators.AsofJoin]]; the oracle is
    * DuckDB's native ASOF LEFT JOIN, so the operator's semantics are
    * pinned against an independent implementation. */
  def qAsofClick(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    graft.operators.AsofJoin
      .asofBackward(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("value"))
      .select(col("event_id"), col("user_id"),
        col("value").as("purchase_value"),
        col("asof_value").as("click_value"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"))
      .orderBy(col("event_id"))
  }

  /** The same attribution query planned through the dedicated Catalyst
    * operator ([[graft.plans.AsofJoinPlan]] → AsofMergeJoinExec) instead
    * of the union+window composition — the hash gate proves the custom
    * physical plan against DuckDB's native ASOF LEFT JOIN. */
  def qAsofClickMerge(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    graft.operators.AsofJoin
      .asofMerge(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("value"))
      .select(col("event_id"), col("user_id"),
        col("value").as("purchase_value"),
        col("asof_value").as("click_value"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"))
      .orderBy(col("event_id"))
  }

  val qAsofClickSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, ts, max(value) AS cv
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id,
      |  p.value AS purchase_value,
      |  c.cv AS click_value,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  /** Interval join: EVERY click within 30 minutes at-or-after each view
    * by the same user (the all-pairs companion to [[qAsofClick]]'s
    * nearest-one semantics — the exposure×response relation an ads or
    * recommendation pipeline materializes before attribution modeling).
    * Plans as a shuffled equi-join on user_id with the time range as a
    * join-level filter — never a cross join; per-user activity bounds
    * the pair fan-out. The streaming twin
    * ([[graft.streaming.EventStream.intervalPairs]]) runs the SAME
    * relation through Spark's native watermarked stream-stream join and
    * is proven stream ≡ batch in EventStreamSpec. */
  def qIntervalPairs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    views.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        round((unix_micros(col("click_ts")) - unix_micros(col("view_ts"))) /
          lit(1000000.0), 6).as("delay_s"))
      .orderBy(col("user_id"), col("view_id"), col("click_id"))
  }

  val qIntervalPairsSql: String =
    """WITH v AS (
      |  SELECT user_id, event_id view_id, ts view_ts
      |  FROM events WHERE event_type = 'view'),
      |c AS (
      |  SELECT user_id, event_id click_id, ts click_ts
      |  FROM events WHERE event_type = 'click')
      |SELECT v.user_id, v.view_id, c.click_id,
      |  round((epoch_us(c.click_ts) - epoch_us(v.view_ts)) / 1000000.0, 6)
      |    AS delay_s
      |FROM v JOIN c ON v.user_id = c.user_id
      |  AND c.click_ts >= v.view_ts
      |  AND c.click_ts <= v.view_ts + INTERVAL 30 MINUTE
      |ORDER BY v.user_id, view_id, click_id""".stripMargin

  /** Range join: per-incident activity counts — every event falling in a
    * 10-minute window opened by selected error events, joined WITHOUT an
    * equality key via [[graft.operators.RangeJoin]] interval binning (a
    * naive BETWEEN join would plan as broadcast nested-loop). */
  def qRangeIncidents(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val windows = e
      .filter(col("event_type") === "error" && col("event_id") % 500 === 0)
      .select(col("event_id").as("incident_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    graft.operators.RangeJoin
      .pointInInterval(e.select(col("ts"), col("event_type")), "ts",
        windows, "w_start", "w_end", binWidthMs = 10L * 60 * 1000)
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_errors"))
      .orderBy(col("incident_id"))
  }

  val qRangeIncidentsSql: String =
    """WITH w AS (
      |  SELECT event_id AS incident_id, ts AS w_start,
      |    ts + INTERVAL 10 MINUTE AS w_end
      |  FROM events WHERE event_type = 'error' AND event_id % 500 = 0)
      |SELECT w.incident_id, count(*)::BIGINT AS n_events,
      |  sum(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_errors
      |FROM w JOIN events e ON e.ts >= w.w_start AND e.ts <= w.w_end
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def qTrailingHour(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, 0)
    Tables.events(s, d)
      .withColumn("trail_sum", round(sum(col("value")).over(w), 2))
      .withColumn("trail_n", count(lit(1)).over(w))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("trail_sum"), col("trail_n"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val qTrailingHourSql: String =
    """SELECT user_id, event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
      |  round(sum(value) OVER w, 2) AS trail_sum,
      |  count(*) OVER w AS trail_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** HLL sketch reporting: approx distinct users per event type next to
    * the exact count and the observed error. Sketch values differ across
    * engines by construction → rows-only driver check; the exact column
    * is covered by the other oracles. At 100 TB approx_count_distinct is
    * the only affordable form (fixed-size sketch, map-side combinable). */
  def qUserReachApprox(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .withColumn("rel_err",
        round(abs(col("approx_users") - col("exact_users")).cast("double") /
          col("exact_users").cast("double"), 4))
      .orderBy(col("event_type"))
  }

  /** Mergeable distinct-count rollup: per-(day, event_type) HLL sketches
    * built ONCE from raw events, then re-aggregated to per-type totals by
    * sketch UNION — no second pass over raw data. This is the 100 TB
    * distinct-counting pattern: the expensive scan materializes compact
    * mergeable state (a few KB per group), and every coarser granularity
    * (daily→weekly→all-time) derives from sketch merges whose cost is
    * proportional to the number of GROUPS, not events. The spec asserts
    * the merged estimate tracks the exact distinct count; rows-only for
    * the driver (estimates are sketch-seeded, not SQL-reproducible). */
  def qReachSketchRollup(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"))
    daily
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_users"))
      .orderBy(col("event_type"))
  }

  /** Count-min-sketch parameters shared by build, merge, and gate: eps →
    * width 2/eps counters, confidence → depth ln(1/(1-conf)) rows; the
    * fixed seed makes estimates reproducible given the data. */
  val CmsEps = 0.001
  val CmsConf = 0.99
  val CmsSeed = 42

  /** The 10 globally most active users — the deterministic probe set for
    * the CMS point-frequency queries (ties broken by user_id so Spark and
    * DuckDB pick the same rows). */
  private def topUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(10)
      .select(col("user_id"))

  /** Mergeable FREQUENCY rollup — the count-min-sketch twin of the HLL
    * reach rollup: per-(day, event_type) sketches of user activity built
    * ONCE from raw events with Spark's built-in `count_min_sketch`, then
    * re-aggregated to per-type sketches by [[graft.functions.CmsMergeAgg]]
    * (the engine's one genuine UDAF: mergeable binary state no built-in
    * can combine). Point estimates for the top-10 probe users run on the
    * k-row merged rollup via `cms_estimate` — raw events are scanned once,
    * every coarser granularity and every probe derives from sketch state
    * proportional to GROUPS, not events.
    *
    * Rows-only for the driver (estimates are sketch-seeded);
    * `ev_cms_topk_gate` carries the hash-checked accuracy contract. */
  def qCmsTopUsers(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(expr(
        s"count_min_sketch(user_id, ${CmsEps}d, ${CmsConf}d, $CmsSeed)").as("sk"))
    val merged = daily
      .groupBy(col("event_type"))
      .agg(graft.functions.SketchFunctions.cmsMerge(col("sk")).as("sk"))
    merged.crossJoin(broadcast(topUsers(s, d)))
      .select(col("event_type"), col("user_id"),
        graft.functions.SketchFunctions.cmsEstimate(col("sk"), col("user_id"))
          .as("est_n"))
      .orderBy(col("event_type"), col("user_id"))
  }

  /** Accuracy gate for [[qCmsTopUsers]] (the recall-gate pattern): per
    * (event_type, probe user), the merged-sketch estimate must satisfy the
    * CMS contract — never below the exact count (structural: counters only
    * over-count), and at most exact + 3·eps·N(type) (3× the one-sided
    * eps·N bound at confidence 0.99; the margin absorbs the residual
    * probability mass, and estimates are deterministic given data+seed).
    * The oracle recomputes exact_n and budget from the events table and
    * expects est_ok TRUE everywhere, so the DuckDB hash gate pins the
    * whole build→merge→estimate pipeline. */
  def qCmsTopkGate(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val probes = topUsers(s, d)
    val exact = e.join(broadcast(probes), "user_id")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("exact_n"))
    val totals = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_tot"))
    val ex = coalesce(col("exact_n"), lit(0L))
    val budget = ceil(lit(3 * CmsEps) * col("n_tot"))
    qCmsTopUsers(s, d)
      .join(exact, Seq("event_type", "user_id"), "left")
      .join(broadcast(totals), "event_type")
      .select(col("event_type"), col("user_id"),
        ex.as("exact_n"), budget.as("budget"),
        (col("est_n") >= ex && col("est_n") <= ex + budget).as("est_ok"))
      .orderBy(col("event_type"), col("user_id"))
  }

  val qCmsTopkGateSql: String =
    """WITH top AS (
      |  SELECT user_id FROM events GROUP BY 1
      |  ORDER BY count(*) DESC, user_id LIMIT 10),
      |tot AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
      |ex AS (
      |  SELECT event_type, user_id, count(*) AS c
      |  FROM events JOIN top USING (user_id) GROUP BY 1, 2)
      |SELECT t.event_type, top.user_id,
      |  coalesce(ex.c, 0)::BIGINT AS exact_n,
      |  CAST(ceil(3 * 0.001 * t.n) AS BIGINT) AS budget,
      |  TRUE AS est_ok
      |FROM tot t CROSS JOIN top
      |LEFT JOIN ex ON ex.event_type = t.event_type AND ex.user_id = top.user_id
      |ORDER BY 1, 2""".stripMargin

  /** Sequential conversion funnel — view → click → purchase in event
    * order (the match_recognize-style pattern op, expressed
    * relationally): per user, walk the ordered event sequence advancing
    * a stage counter on the first view, the first click after it, and
    * the first purchase after that; report per-step user counts and
    * conversion fractions.
    *
    * ONE shuffle: per-user ordered arrays via collect_list +
    * array_sort (ties broken by event_id — deterministic and identical
    * under DuckDB's nanos vs Spark's micros timestamps), walked with an
    * aggregate HOF. Equivalent to the oracle's min-chain (first view
    * pos → min click pos after it → min purchase pos after that): the
    * walk advances on exactly those events. Per-user arrays are
    * session-scale (same skew class as sessionize — salting/AQE apply
    * if a user is pathological). */
  def qEventFunnel(s: SparkSession, d: String): DataFrame = {
    // WINDOWED funnel: each step must land within 24 hours of the
    // previous one, or the user stalls at their current stage — the
    // unbounded variant saturates on dense event streams (every user
    // eventually does everything) and checks nothing. Time math runs on
    // integer micros so the oracle (nanos parquet, epoch_ns // 1000)
    // and Spark (micros timestamps) compare identical values.
    val byUser = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(
        col("ts"), col("event_id"), col("event_type")))).as("evs"))
    val stage = expr(
      """aggregate(evs,
        |  named_struct('st', 0, 'dl', CAST(0 AS BIGINT)),
        |  (acc, x) ->
        |    CASE WHEN acc.st = 0 AND x.event_type = 'view'
        |           THEN named_struct('st', 1, 'dl', unix_micros(x.ts) + 86400000000L)
        |         WHEN acc.st = 1 AND x.event_type = 'click'
        |              AND unix_micros(x.ts) <= acc.dl
        |           THEN named_struct('st', 2, 'dl', unix_micros(x.ts) + 86400000000L)
        |         WHEN acc.st = 2 AND x.event_type = 'purchase'
        |              AND unix_micros(x.ts) <= acc.dl
        |           THEN named_struct('st', 3, 'dl', acc.dl)
        |         ELSE acc END,
        |  acc -> acc.st)""".stripMargin)
    byUser.withColumn("stage", stage)
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("stage") >= 1, 1L).otherwise(0L)).as("s1"),
        sum(when(col("stage") >= 2, 1L).otherwise(0L)).as("s2"),
        sum(when(col("stage") >= 3, 1L).otherwise(0L)).as("s3"))
      .select(expr(
        "stack(3, '1_view', s1, '2_click', s2, '3_purchase', s3) as (step, n_users)"),
        col("n_total"))
      .select(col("step"), col("n_users"),
        round(col("n_users").cast("double") / col("n_total"), 4).as("frac"))
      .orderBy(col("step"))
  }

  val qEventFunnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) pos
      |  FROM events),
      |v AS (SELECT user_id, min(pos) p1, arg_min(us, pos) t1
      |      FROM e WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(pos) p2, arg_min(us, pos) t2
      |      FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND pos > p1
      |        AND us <= t1 + 86400000000 GROUP BY 1),
      |p AS (SELECT e.user_id, min(pos) p3 FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND pos > p2
      |        AND us <= t2 + 86400000000 GROUP BY 1),
      |t AS (SELECT count(DISTINCT user_id) n FROM events)
      |SELECT step, n_users::BIGINT AS n_users,
      |  round(n_users / n::DOUBLE, 4) AS frac
      |FROM (
      |  SELECT '1_view' AS step, (SELECT count(*) FROM v) AS n_users
      |  UNION ALL SELECT '2_click', (SELECT count(*) FROM c)
      |  UNION ALL SELECT '3_purchase', (SELECT count(*) FROM p)), t
      |ORDER BY step""".stripMargin

  /** Driver-checkable accuracy gates for the two sketch reports (the
    * recall-gate pattern, VERDICT r3 item 3): per event type, the
    * estimate must sit within the error budget of the exact distinct
    * count. The oracle derives the expected all-true rows from the
    * events table alone, so the DuckDB hash gate turns red if any
    * estimate drifts outside the budget — converting the two sketch
    * entries from rows-only to checked. Budget 5% ≫ the configured
    * sketch error (2% / lgK-12 HLL), and sketches are deterministic
    * given the data, so the booleans are stable. */
  def qUserReachGate(s: SparkSession, d: String): DataFrame =
    qUserReachApprox(s, d)
      .select(col("event_type"), round(lit(0.05), 2).as("budget"),
        (col("rel_err") <= 0.05).as("est_ok"))
      .orderBy(col("event_type"))

  def qReachSketchGate(s: SparkSession, d: String): DataFrame = {
    val exact = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    qReachSketchRollup(s, d)
      .join(exact, "event_type")
      .select(col("event_type"), round(lit(0.05), 2).as("budget"),
        (abs(col("est_users") - col("exact_users")).cast("double") /
          col("exact_users").cast("double") <= 0.05).as("est_ok"))
      .orderBy(col("event_type"))
  }

  private val reachGateSql: String =
    """SELECT event_type, 0.05::DOUBLE AS budget, TRUE AS est_ok
      |FROM (SELECT DISTINCT event_type FROM events)
      |ORDER BY event_type""".stripMargin

  /** Day × event-type count matrix via `pivot` with an EXPLICIT value
    * list — at scale the two-arg pivot matters: without the list Spark
    * runs a values-discovery job over the full input before it can even
    * plan. The explicit form plans two mergeable hash-aggs (a partial
    * count on (day, type), then pivotfirst on day) — both map-side
    * combinable, so the shuffled volume is |days×types| rows, not
    * events. Missing cells coalesce to 0 so the matrix is dense and
    * engine-comparable. */
  def qEventPivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("day") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy(col("day"))
  }

  val qEventPivotSql: String =
    """SELECT ts::DATE AS day,
      |  count(*) FILTER (event_type = 'click')::BIGINT AS n_click,
      |  count(*) FILTER (event_type = 'error')::BIGINT AS n_error,
      |  count(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase,
      |  count(*) FILTER (event_type = 'signup')::BIGINT AS n_signup,
      |  count(*) FILTER (event_type = 'view')::BIGINT AS n_view
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Accuracy gate for the SKETCH-based quantiles (`approx_percentile`,
    * the operator a 100 TB pipeline actually runs — exact `percentile`
    * materializes every group's values; the GK sketch is mergeable and
    * map-side combinable). accuracy=50 keeps the sketch genuinely
    * approximate at the test SFs (exact below ~50 rows/group), and the
    * published contract — rank error ≤ N/accuracy — is checked per
    * (event_type, q) against the exact data: the count of values below
    * the estimate must sit within budget of the target rank. The oracle
    * is the all-true relation, so any budget violation hash-fails. */
  def qQuantileGate(s: SparkSession, d: String): DataFrame = {
    val qs = Seq(0.5, 0.9, 0.99)
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val est = ev.groupBy(col("event_type"))
      .agg(
        expr(s"approx_percentile(value, array(${qs.mkString(", ")}), 50)").as("est"),
        count(lit(1)).as("n"))
    val probes = est.select(col("event_type"), col("n"),
      posexplode(col("est")).as(Seq("qi", "e")))
      .withColumn("q", element_at(
        array(qs.map(q => lit(q)): _*), col("qi").cast("int") + 1))
    ev.join(broadcast(probes), "event_type")
      .groupBy(col("event_type"), col("q"), col("n"))
      .agg(
        sum(when(col("value") < col("e"), 1L).otherwise(0L)).as("rank_lo"),
        sum(when(col("value") <= col("e"), 1L).otherwise(0L)).as("rank_hi"))
      .select(col("event_type"), col("q"),
        (col("rank_hi") >= floor(col("q") * col("n")) - ceil(col("n") / 50.0) - 1 &&
          col("rank_lo") <= ceil(col("q") * col("n")) + ceil(col("n") / 50.0) + 1)
          .as("within_budget"))
      .orderBy(col("event_type"), col("q"))
  }

  val qQuantileGateSql: String =
    """SELECT event_type, q, true AS within_budget
      |FROM events, (VALUES (0.5::DOUBLE), (0.9::DOUBLE), (0.99::DOUBLE)) t(q)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Equi-width 10-bin histogram of `value` per event type — the
    * distribution-profiling pass behind dashboards and outlier triage.
    * Two scans: a 5-row min/max agg broadcast back onto the stream, then
    * one map-side-combinable (type, bin) count — no corpus shuffle
    * beyond the k×10-row aggregate. Bin arithmetic is written with the
    * identical expression structure in both engines so boundary values
    * land in the same bin. */
  def qValueHistogram(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val rng = ev.groupBy(col("event_type"))
      .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
    ev.join(broadcast(rng), "event_type")
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L)).otherwise(
          least(floor((col("value") - col("mn")) * 10.0 / (col("mx") - col("mn"))),
            lit(9L))).cast("long"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(rng), "event_type")
      .select(col("event_type"), col("bin"),
        round(col("mn") + col("bin") * (col("mx") - col("mn")) / 10.0, 4).as("bin_lo"),
        col("n"))
      .orderBy(col("event_type"), col("bin"))
  }

  val qValueHistogramSql: String =
    """WITH rng AS (
      |  SELECT event_type, min(value) mn, max(value) mx
      |  FROM events GROUP BY 1),
      |binned AS (
      |  SELECT e.event_type,
      |    CASE WHEN mx = mn THEN 0
      |         ELSE least(floor((value - mn) * 10.0::DOUBLE / (mx - mn)), 9) END::BIGINT bin
      |  FROM events e JOIN rng USING (event_type))
      |SELECT event_type, bin,
      |  round(mn + bin * (mx - mn) / 10.0::DOUBLE, 4) AS bin_lo,
      |  count(*) AS n
      |FROM binned JOIN rng USING (event_type)
      |GROUP BY 1, 2, mn, mx ORDER BY 1, 2""".stripMargin

  /** Event-type transition matrix (per-user Markov chain): counts and
    * row-normalized probabilities of consecutive (prev → next) pairs in
    * each user's event-time order. One window pass (partitioned by user,
    * total-ordered by (ts, event_id) so ties are deterministic) + one
    * map-side-combinable pair count; the row normalization runs on the
    * ≤ types² aggregate. The session-path diagnostic behind funnel
    * design — and the same shape computes n-gram transition stats on any
    * sequence corpus. */
  def qEventTransitions(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("prev_type"))
    pairs
      .withColumn("p", round(col("n").cast("double") / sum(col("n")).over(wp), 6))
      .orderBy(col("prev_type"), col("event_type"))
  }

  val qEventTransitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) prev_type
      |  FROM events),
      |pairs AS (
      |  SELECT prev_type, event_type, count(*) n
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, event_type, n,
      |  round(n::DOUBLE / sum(n) OVER (PARTITION BY prev_type), 6) AS p
      |FROM pairs ORDER BY prev_type, event_type""".stripMargin

  /** Z-score outlier report per event type: mean/population-stddev on a
    * 5-row broadcast agg, then one codegen pass flags |z| > 3. The
    * anomaly-triage pre-filter: at 100 TB the flag column prunes the
    * stream before any expensive downstream stage, and the two-pass
    * (tiny agg + broadcast) shape never shuffles event rows. */
  def qValueAnomalies(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val stats = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mean"),
        stddev_pop(col("value")).as("sd"),
        count(lit(1)).as("n"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mean")) / col("sd"))
      .groupBy(col("event_type"), col("n"))
      .agg(
        sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L)).as("n_outliers"),
        round(max(abs(col("z"))), 4).as("max_abs_z"))
      .select(col("event_type"), col("n"), col("n_outliers"), col("max_abs_z"))
      .orderBy(col("event_type"))
  }

  val qValueAnomaliesSql: String =
    """WITH stats AS (
      |  SELECT event_type, avg(value) mean, stddev_pop(value) sd, count(*) n
      |  FROM events GROUP BY 1)
      |SELECT event_type, n,
      |  sum(CASE WHEN abs((value - mean) / sd) > 3.0::DOUBLE THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
      |  round(max(abs((value - mean) / sd)), 4) AS max_abs_z
      |FROM events JOIN stats USING (event_type)
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** Per-user EWMA of `value` over the event-time order — the recursive
    * time-series smoother (EWMA_i = α·v_i + (1−α)·EWMA_{i−1}) that plain
    * window frames cannot express (each row depends on the previous
    * RESULT, not the previous rows). Expressed as an ordered fold: one
    * hash-agg collects each user's (ts-ordered) values, then a
    * HOF `aggregate` folds them inside codegen — one shuffle of (user,
    * value) pairs, no iterative jobs, no UDF. Both engines fold the
    * identical IEEE sequence (same order, same arithmetic), so the
    * result is bit-equal before rounding. At 100 TB the per-user arrays
    * are session-scale; a year-long hot user would move this to the
    * same mapGroups shape as sessionization. */
  def qEventEwma(s: SparkSession, d: String, alpha: Double = 0.25): DataFrame = {
    val vals = transform(
      array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))),
      x => x.getField("value"))
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), vals.as("vals"))
      .select(col("user_id"), col("n_events"),
        round(aggregate(
          // NB: slice length must be computed, not Int.MaxValue — Slice
          // adds start+length in Int space and overflow empties the array
          slice(col("vals"), lit(2), greatest(size(col("vals")) - 1, lit(0))),
          element_at(col("vals"), 1),
          (acc, x) => acc * lit(1 - alpha) + x * lit(alpha)), 6).as("ewma"))
      .orderBy(col("user_id"))
  }

  val qEventEwmaSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  round(list_reduce(list(value ORDER BY ts, event_id),
      |    (acc, x) -> acc * 0.75::DOUBLE + x * 0.25::DOUBLE), 6) AS ewma
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin

  /** Batch Holt double exponential smoothing (Holt 1957; the trend-aware
    * second-order sibling of [[qEventEwma]]) — the COUPLED two-variable
    * recurrence l_i = α·v_i + (1−α)(l+b), b_i = β(l_i−l) + (1−β)b as an
    * ordered fold whose accumulator is a STRUCT: Spark's aggregate() and
    * DuckDB's list_reduce both thread a (level, trend) pair through the
    * per-user value list in identical IEEE order, so the rounded outputs
    * hash-match. Init per the standard convention (l₁ = v₁, b₁ = 0),
    * which is also the streaming twin's state seed
    * ([[graft.streaming.EventStream.holt]] — parity spec'd). Same scale
    * shape as EWMA: one (user)-keyed shuffle, session-scale arrays. */
  def qEventHolt(s: SparkSession, d: String,
      alpha: Double = 0.25, beta: Double = 0.1): DataFrame = {
    val vals = transform(
      array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))),
      x => x.getField("value"))
    val a = alpha; val om = 1 - alpha; val bt = beta; val obt = 1 - beta
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), vals.as("vals"))
      .select(col("user_id"), col("n_events"),
        expr(
          s"""aggregate(
             |  slice(vals, 2, greatest(size(vals) - 1, 0)),
             |  named_struct('l', element_at(vals, 1), 'b', cast(0.0 as double)),
             |  (acc, x) -> named_struct(
             |    'l', cast($a as double) * x + cast($om as double) * (acc.l + acc.b),
             |    'b', cast($bt as double) * ((cast($a as double) * x + cast($om as double) * (acc.l + acc.b)) - acc.l)
             |         + cast($obt as double) * acc.b))""".stripMargin).as("h"))
      .select(col("user_id"), col("n_events"),
        round(col("h.l"), 6).as("level"),
        round(col("h.b"), 6).as("trend"),
        round(col("h.l") + col("h.b"), 6).as("forecast_1"))
      .orderBy(col("user_id"))
  }

  // NB: a list_reduce STRUCT accumulator would be the natural oracle
  // form, but DuckDB (1.0) updates the accumulator's fields in place
  // field-by-field, so the 'b' lambda would read the already-updated
  // 'l' — a silent semantics divergence. The recursive-CTE fold below
  // threads the pair explicitly with the same arithmetic the Spark
  // aggregate() runs, in the same order, so the outputs are bit-equal.
  val qEventHoltSql: String =
    """WITH RECURSIVE v AS (
      |  SELECT user_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) i
      |  FROM events),
      |n AS (SELECT user_id, count(*) n_events FROM v GROUP BY 1),
      |r AS (
      |  SELECT user_id, 1::BIGINT AS i, value::DOUBLE AS l, 0.0::DOUBLE AS b
      |  FROM v WHERE i = 1
      |  UNION ALL
      |  SELECT r.user_id, r.i + 1,
      |    0.25::DOUBLE * v.value + 0.75::DOUBLE * (r.l + r.b),
      |    0.1::DOUBLE * ((0.25::DOUBLE * v.value + 0.75::DOUBLE * (r.l + r.b)) - r.l)
      |      + 0.9::DOUBLE * r.b
      |  FROM r JOIN v ON v.user_id = r.user_id AND v.i = r.i + 1)
      |SELECT r.user_id, n.n_events, round(r.l, 6) AS level,
      |  round(r.b, 6) AS trend, round(r.l + r.b, 6) AS forecast_1
      |FROM r JOIN n ON n.user_id = r.user_id AND r.i = n.n_events
      |ORDER BY r.user_id""".stripMargin

  /** Holt-Winters parameters: smoothing (level, trend, season) and the
    * season length (hours per day — the synthetic series' true period). */
  private val HwAlpha = 0.25
  private val HwBeta = 0.05
  private val HwGamma = 0.2
  private val HwM = 24

  /** Additive Holt-Winters triple exponential smoothing (Winters 1960,
    * Management Science — public paper) over each event type's hourly
    * count series: level, trend AND a rotating 24-slot season vector
    *   ŝ = s.head;  l' = α(v−ŝ) + (1−α)(l+b);  b' = β(l'−l) + (1−β)b
    *   s ← s.tail :+ (γ(v−l') + (1−γ)ŝ)
    * — the third-order sibling of [[qEventEwma]]/[[qEventHolt]], again
    * expressed as an ordered fold whose accumulator (a struct carrying
    * the season QUEUE as an array) no window can produce. Standard
    * init: l₀ = mean of season 1, b₀ = (mean₂ − mean₁)/m, s₀ = the
    * SECOND season's deviations from mean₁ (the most recent seasonal
    * estimate when the fold starts); the fold consumes points 2m+1…n. The series is the
    * DENSIFIED hour axis (missing (type, hour) cells are true zeros —
    * a count series' absence IS its value), so the fold length is
    * time-bounded: 720 points per type at EVERY scale factor, which is
    * why the corpus-sized work here is exactly one (type, hour) count
    * and nothing else grows with data volume.
    *
    * Output: per (event_type, slot 0–23) the final seasonal, plus the
    * shared level/trend/one-step forecast (l + b + s.head). Oracle:
    * recursive-CTE fold with a LIST state column — identical arithmetic
    * in identical order, the [[qEventHolt]] contract (and the same
    * reason: DuckDB's struct list_reduce mutates fields in place). */
  /** The ONE densification contract ("absence IS zero" on a contiguous
    * hour axis) shared by [[qHoltWinters]], [[qHwBacktest]] and
    * [[qStlSeasonal]]: the dense (event_type, idx, h, n) hourly grid
    * plus the axis length. The bounds row is collected once so the
    * axis is literal — the events scan runs exactly TWICE (bounds agg
    * + counts agg); the counts relation is types×hours-bounded and
    * localCheckpointed so the types derivation costs no third scan. */
  private def denseHourlyCounts(s: SparkSession, d: String): (DataFrame, Long) =
    denseGridFromCounts(s, Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt")))

  /** The grid half of the contract over an explicit sparse counts cube
    * (event_type, h, cnt) — bounds derive from the cube itself (every
    * event lands in a truncated bucket, so cube min/max == event
    * min/max), which makes the events scan count exactly ONE for the
    * batch path and lets the streaming hourly ledger reuse the same
    * densification verbatim. */
  private[graft] def denseGridFromCounts(s: SparkSession, counts0: DataFrame)
      : (DataFrame, Long) = {
    val counts = counts0.localCheckpoint()
    val b = counts.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .collect()(0)
    if (b.isNullAt(0))
      return (s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_type STRING, idx INT, h TIMESTAMP, n BIGINT")), 0L)
    val (h0, h1) = (b.getTimestamp(0), b.getTimestamp(1))
    // The axis is generated with calendar-interval `sequence`, so
    // axisLen MUST come from the generated rows themselves: deriving it
    // from raw epoch-ms ((h1-h0)/3600000+1) silently disagrees with the
    // calendar axis in a non-UTC session spanning a DST transition,
    // desyncing idx/axisLen from the >= 696-hour guards downstream
    // (ADVICE r10). The axis is time-bounded (one row per hour), so the
    // checkpoint + count cost nothing corpus-sized. Oracle comparisons
    // (DuckDB generate_series) additionally assume the session tz is
    // UTC — the entry points pin spark.sql.session.timeZone=UTC.
    val axis = s.range(1).select(
      posexplode(sequence(lit(h0), lit(h1), expr("interval 1 hour")))
        .as(Seq("idx", "h")))
      .localCheckpoint()
    val axisLen = axis.count()
    val types = counts.select(col("event_type")).distinct()
    val grid = types.crossJoin(axis)
      .join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("idx"), col("h"),
        coalesce(col("cnt"), lit(0L)).as("n"))
    (grid, axisLen)
  }

  /** The densified (event_type, n, vals) hourly count series — shared
    * by [[qHoltWinters]] and [[qHwBacktest]]; rides
    * [[denseHourlyCounts]]. */
  private def hourlySeries(s: SparkSession, d: String): DataFrame = {
    val series = denseHourlyCounts(s, d)._1
      .select(col("event_type"), col("h"), col("n").cast("double").as("v"))
    val vals = transform(
      array_sort(collect_list(struct(col("h"), col("v")))),
      x => x.getField("v"))
    series.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), vals.as("vals"))
  }

  /** The Holt-Winters init+fold over `vals[1..upto]` as a SQL-expression
    * string (shared verbatim by the full fit and the backtest's
    * truncated fit — `upto` is a SQL expression for the fold's end). */
  private def hwFoldExpr(upto: String): String = {
    val a = HwAlpha; val oa = 1 - HwAlpha
    val bt = HwBeta; val obt = 1 - HwBeta
    val g = HwGamma; val og = 1 - HwGamma
    val m = HwM
    s"""aggregate(
       |  slice(vals, ${2 * m + 1}, greatest(($upto) - ${2 * m}, 0)),
       |  named_struct(
       |    'l', aggregate(slice(vals, 1, $m), cast(0.0 as double), (p, q) -> p + q) / cast($m as double),
       |    'b', (aggregate(slice(vals, ${m + 1}, $m), cast(0.0 as double), (p, q) -> p + q) / cast($m as double)
       |          - aggregate(slice(vals, 1, $m), cast(0.0 as double), (p, q) -> p + q) / cast($m as double)) / cast($m as double),
       |    's', transform(slice(vals, ${m + 1}, $m),
       |           q -> q - aggregate(slice(vals, 1, $m), cast(0.0 as double), (p, q) -> p + q) / cast($m as double))),
       |  (acc, x) -> named_struct(
       |    'l', cast($a as double) * (x - element_at(acc.s, 1)) + cast($oa as double) * (acc.l + acc.b),
       |    'b', cast($bt as double) * ((cast($a as double) * (x - element_at(acc.s, 1)) + cast($oa as double) * (acc.l + acc.b)) - acc.l) + cast($obt as double) * acc.b,
       |    's', concat(slice(acc.s, 2, ${m - 1}), array(
       |      cast($g as double) * (x - (cast($a as double) * (x - element_at(acc.s, 1)) + cast($oa as double) * (acc.l + acc.b))) + cast($og as double) * element_at(acc.s, 1)))))""".stripMargin
  }

  def qHoltWinters(s: SparkSession, d: String): DataFrame = {
    val m = HwM
    val folded = hourlySeries(s, d)
      // explicit precondition: the init needs two full seasons and the
      // fold at least one more point — a shorter series yields zero
      // rows on BOTH engines (the oracle guards identically) instead of
      // a silent empty-slice divergence
      .filter(col("n") >= 2 * m + 1)
      .withColumn("hw", expr(hwFoldExpr("size(vals)")))
    folded
      .select(col("event_type"), col("n"),
        col("hw.l").as("l"), col("hw.b").as("b"),
        element_at(col("hw.s"), 1).as("s_head"),
        posexplode(col("hw.s")).as(Seq("j0", "seasonal")))
      .select(col("event_type"),
        ((col("n") + col("j0")) % m).as("slot"),
        round(col("seasonal"), 6).as("seasonal"),
        round(col("l"), 6).as("level"),
        round(col("b"), 6).as("trend"),
        round(col("l") + col("b") + col("s_head"), 6).as("forecast_next"))
      .orderBy(col("event_type"), col("slot"))
  }

  /** Holt-Winters backtest: hold out the final season (24 hours), fit
    * on the rest, and score the h-step-ahead forecasts
    * (ŷ_h = l + h·b + s[h]) against the held-out actuals — the
    * walk-away backtest every forecasting deployment runs before
    * trusting a model. Reported per event type: forecast MAE and the
    * seasonal-naive baseline's MAE (ŷ_h = the same hour yesterday),
    * both over the 24 holdout points. The report does NOT assert the
    * model beats the baseline — that's data-dependent; it measures.
    * Same time-bounded cost shape as [[qHoltWinters]]. */
  def qHwBacktest(s: SparkSession, d: String): DataFrame = {
    val m = HwM
    hourlySeries(s, d)
      // train needs 2 seasons + >= 1 fold point, plus the holdout season
      .filter(col("n") >= 3 * m + 1)
      .withColumn("hw", expr(hwFoldExpr(s"size(vals) - $m")))
      .withColumn("mae_hw", expr(
        s"""aggregate(
           |  transform(sequence(1, $m), h ->
           |    abs(hw.l + cast(h as double) * hw.b + element_at(hw.s, h)
           |        - element_at(vals, size(vals) - $m + h))),
           |  cast(0.0 as double), (p, q) -> p + q) / cast($m as double)""".stripMargin))
      .withColumn("mae_snaive", expr(
        s"""aggregate(
           |  transform(sequence(1, $m), h ->
           |    abs(element_at(vals, size(vals) - ${2 * m} + h)
           |        - element_at(vals, size(vals) - $m + h))),
           |  cast(0.0 as double), (p, q) -> p + q) / cast($m as double)""".stripMargin))
      .select(col("event_type"), col("n"),
        round(col("mae_hw"), 4).as("mae_hw"),
        round(col("mae_snaive"), 4).as("mae_snaive"))
      .orderBy(col("event_type"))
  }

  val qHwBacktestSql: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT date_trunc('hour', min(ts)) h0, date_trunc('hour', max(ts)) h1
      |  FROM events),
      |axis AS (
      |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) h FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM events),
      |cnt AS (
      |  SELECT event_type, date_trunc('hour', ts) h, count(*) c
      |  FROM events GROUP BY 1, 2),
      |series AS (
      |  SELECT t.event_type, a.h, coalesce(c.c, 0)::DOUBLE v
      |  FROM types t CROSS JOIN axis a
      |  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.h = a.h),
      |vl AS (
      |  SELECT event_type, count(*)::BIGINT n, list(v ORDER BY h) vals
      |  FROM series GROUP BY 1),
      |ini AS (
      |  SELECT event_type, n, vals,
      |    list_reduce(vals[1:24], (p, q) -> p + q) / 24.0::DOUBLE mean1,
      |    list_reduce(vals[25:48], (p, q) -> p + q) / 24.0::DOUBLE mean2
      |  FROM vl WHERE n >= 73),
      |r AS (
      |  SELECT event_type, n, vals, 48::BIGINT i,
      |    mean1 l, (mean2 - mean1) / 24.0::DOUBLE b,
      |    list_transform(vals[25:48], q -> q - mean1) s
      |  FROM ini
      |  UNION ALL
      |  SELECT event_type, n, vals, i + 1,
      |    0.25::DOUBLE * (vals[i + 1] - s[1]) + 0.75::DOUBLE * (l + b),
      |    0.05::DOUBLE * ((0.25::DOUBLE * (vals[i + 1] - s[1]) + 0.75::DOUBLE * (l + b)) - l)
      |      + 0.95::DOUBLE * b,
      |    s[2:24] || [0.2::DOUBLE * (vals[i + 1]
      |        - (0.25::DOUBLE * (vals[i + 1] - s[1]) + 0.75::DOUBLE * (l + b)))
      |      + 0.8::DOUBLE * s[1]]
      |  FROM r WHERE i < n - 24),
      |fin AS (SELECT * FROM r WHERE i = n - 24),
      |err AS (
      |  SELECT f.event_type, f.n,
      |    list_reduce(list_transform(generate_series(1, 24), h ->
      |      abs(f.l + h::DOUBLE * f.b + f.s[h] - f.vals[f.n - 24 + h])),
      |      (p, q) -> p + q) / 24.0::DOUBLE mae_hw,
      |    list_reduce(list_transform(generate_series(1, 24), h ->
      |      abs(f.vals[f.n - 48 + h] - f.vals[f.n - 24 + h])),
      |      (p, q) -> p + q) / 24.0::DOUBLE mae_snaive
      |  FROM fin f)
      |SELECT event_type, n, round(mae_hw, 4) AS mae_hw,
      |  round(mae_snaive, 4) AS mae_snaive
      |FROM err ORDER BY event_type""".stripMargin

  val qHoltWintersSql: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT date_trunc('hour', min(ts)) h0, date_trunc('hour', max(ts)) h1
      |  FROM events),
      |axis AS (
      |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) h FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM events),
      |cnt AS (
      |  SELECT event_type, date_trunc('hour', ts) h, count(*) c
      |  FROM events GROUP BY 1, 2),
      |series AS (
      |  SELECT t.event_type, a.h, coalesce(c.c, 0)::DOUBLE v
      |  FROM types t CROSS JOIN axis a
      |  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.h = a.h),
      |vl AS (
      |  SELECT event_type, count(*)::BIGINT n, list(v ORDER BY h) vals
      |  FROM series GROUP BY 1),
      |ini AS (
      |  SELECT event_type, n, vals,
      |    list_reduce(vals[1:24], (p, q) -> p + q) / 24.0::DOUBLE mean1,
      |    list_reduce(vals[25:48], (p, q) -> p + q) / 24.0::DOUBLE mean2
      |  FROM vl WHERE n >= 49),
      |r AS (
      |  SELECT event_type, n, vals, 48::BIGINT i,
      |    mean1 l, (mean2 - mean1) / 24.0::DOUBLE b,
      |    list_transform(vals[25:48], q -> q - mean1) s
      |  FROM ini
      |  UNION ALL
      |  SELECT event_type, n, vals, i + 1,
      |    0.25::DOUBLE * (vals[i + 1] - s[1]) + 0.75::DOUBLE * (l + b),
      |    0.05::DOUBLE * ((0.25::DOUBLE * (vals[i + 1] - s[1]) + 0.75::DOUBLE * (l + b)) - l)
      |      + 0.95::DOUBLE * b,
      |    s[2:24] || [0.2::DOUBLE * (vals[i + 1]
      |        - (0.25::DOUBLE * (vals[i + 1] - s[1]) + 0.75::DOUBLE * (l + b)))
      |      + 0.8::DOUBLE * s[1]]
      |  FROM r WHERE i < n),
      |fin AS (SELECT * FROM r WHERE i = n),
      |expl AS (
      |  SELECT event_type, n, l, b, s[1] s_head,
      |    unnest(s) sv, generate_subscripts(s, 1) j
      |  FROM fin)
      |SELECT event_type, (n + j - 1) % 24 AS slot,
      |  round(sv, 6) AS seasonal, round(l, 6) AS level,
      |  round(b, 6) AS trend, round(l + b + s_head, 6) AS forecast_next
      |FROM expl ORDER BY event_type, slot""".stripMargin

  /** RFM segmentation (Hughes 1994's recency/frequency/monetary scoring
    * — the standard public marketing-analytics segmentation; quintile
    * scoring per the common formulation): per user over purchase
    * events — hours since last purchase (vs the corpus's latest
    * purchase), purchase count, and summed value — each scored into
    * quintiles (5 = best; ties broken on user_id so both engines cut
    * identically), plus the conventional segment labels from the (r, f)
    * cell. The windows rank the AGGREGATED per-user relation (one row
    * per user — never corpus-sized); at true scale the quintile cut
    * becomes two-pass percentile thresholds, same outputs. */
  def qEventRfm(s: SparkSession, d: String): DataFrame = {
    val p = Tables.events(s, d).filter(col("event_type") === "purchase")
    val agg = p.groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("freq"),
        round(sum(col("value")), 4).as("monetary"))
    val maxTs = p.agg(max(unix_micros(col("ts"))).as("max_us"))
    val base = agg.crossJoin(broadcast(maxTs))
      .select(col("user_id"),
        // integer division (Spark `div`), matching DuckDB `//` exactly —
        // float `/`+cast can truncate differently at exact-hour bounds
        expr("(max_us - last_us) div 3600000000").as("recency_hours"),
        col("freq"), col("monetary"))
    val rW = Window.orderBy(col("recency_hours").desc, col("user_id"))
    val fW = Window.orderBy(col("freq").asc, col("user_id"))
    val mW = Window.orderBy(col("monetary").asc, col("user_id"))
    base
      .withColumn("r_score", ntile(5).over(rW))
      .withColumn("f_score", ntile(5).over(fW))
      .withColumn("m_score", ntile(5).over(mW))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("r_score") >= 4, "recent")
          .when(col("f_score") >= 4, "at_risk")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
          .otherwise("regular"))
      .select(col("user_id"), col("recency_hours"), col("freq"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        col("segment"))
      .orderBy(col("user_id"))
  }

  val qEventRfmSql: String =
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |agg AS (
      |  SELECT user_id, max(epoch_us(ts)) last_us, count(*) freq,
      |    round(sum(value), 4) monetary
      |  FROM p GROUP BY 1),
      |mx AS (SELECT max(epoch_us(ts)) max_us FROM p),
      |base AS (
      |  SELECT user_id,
      |    ((max_us - last_us) // 3600000000)::BIGINT recency_hours,
      |    freq, monetary
      |  FROM agg, mx),
      |sc AS (
      |  SELECT user_id, recency_hours, freq, monetary,
      |    ntile(5) OVER (ORDER BY recency_hours DESC, user_id) r_score,
      |    ntile(5) OVER (ORDER BY freq ASC, user_id) f_score,
      |    ntile(5) OVER (ORDER BY monetary ASC, user_id) m_score
      |  FROM base)
      |SELECT user_id, recency_hours, freq, monetary,
      |  r_score::INTEGER AS r_score, f_score::INTEGER AS f_score,
      |  m_score::INTEGER AS m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
      |       WHEN r_score >= 4 THEN 'recent'
      |       WHEN f_score >= 4 THEN 'at_risk'
      |       WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
      |       ELSE 'regular' END AS segment
      |FROM sc ORDER BY user_id""".stripMargin

  /** CUSUM slack and alarm threshold, in standard-deviation units. */
  private val CusumK = 0.5
  private val CusumH = 4.0

  /** CUSUM changepoint detection (Page 1954, "Continuous inspection
    * schemes", Biometrika — public paper) over each event type's
    * densified hourly count series: the two-sided tabular CUSUM
    *   S⁺_i = max(0, S⁺_{i−1} + z_i − κ),  S⁻_i = max(0, S⁻_{i−1} − z_i − κ)
    * with z_i the standardized count, slack κ = [[CusumK]]·σ and alarm
    * threshold h = [[CusumH]]·σ — the sequential drift detector that
    * catches sustained small shifts a pointwise z-score test
    * ([[qEventAnomalies]]) misses. Reported per type: final S⁺/S⁻, how
    * many points sat above the alarm line, and the first alarm index
    * (0 = never; the state is NOT reset at alarms — this is the
    * monitoring report, not the restart protocol).
    *
    * Cross-engine determinism: mean and σ are computed by an ordered
    * fold over the same series array BOTH engines hold (0-seeded sum ≡
    * first-element-seeded sum in IEEE — 0+x is exact) and ROUNDED to
    * 6dp before standardization, so the fold consumes bit-identical
    * inputs and the recurrence ([[qEventHolt]] pattern) is bit-equal.
    * Same scale shape as [[qHoltWinters]]: the only corpus-sized work
    * is one (type, hour) count; the fold is time-bounded (720 points
    * per type at every SF). */
  def qEventCusum(s: SparkSession, d: String): DataFrame = {
    val k = CusumK; val h = CusumH
    val z = s"""(CASE WHEN sd = cast(0.0 as double) THEN cast(0.0 as double)
               | ELSE (x - mean) / sd END)""".stripMargin
    val spNext = s"greatest(cast(0.0 as double), acc.sp + $z - cast($k as double))"
    val snNext = s"greatest(cast(0.0 as double), acc.sn - $z - cast($k as double))"
    val alarm = s"($spNext > cast($h as double) OR $snNext > cast($h as double))"
    hourlySeries(s, d)
      .withColumn("mean", expr(
        "round(aggregate(vals, cast(0.0 as double), (p, q) -> p + q) / cast(n as double), 6)"))
      .withColumn("sd", expr(
        """round(sqrt(aggregate(vals, cast(0.0 as double),
          |  (p, q) -> p + (q - mean) * (q - mean)) / cast(n as double)), 6)""".stripMargin))
      .withColumn("c", expr(
        s"""aggregate(vals,
           |  named_struct('sp', cast(0.0 as double), 'sn', cast(0.0 as double),
           |    'na', 0L, 'fi', 0L, 'i', 0L),
           |  (acc, x) -> named_struct(
           |    'sp', $spNext,
           |    'sn', $snNext,
           |    'na', acc.na + (CASE WHEN $alarm THEN 1L ELSE 0L END),
           |    'fi', CASE WHEN acc.fi > 0L THEN acc.fi
           |               WHEN $alarm THEN acc.i + 1L ELSE 0L END,
           |    'i', acc.i + 1L))""".stripMargin))
      .select(col("event_type"), col("n"),
        round(col("c.sp"), 6).as("cusum_pos"),
        round(col("c.sn"), 6).as("cusum_neg"),
        col("c.na").as("n_alarm_points"),
        col("c.fi").as("first_alarm_i"))
      .orderBy(col("event_type"))
  }

  val qEventCusumSql: String = {
    val z = """(CASE WHEN sd = 0.0::DOUBLE THEN 0.0::DOUBLE
              | ELSE (vals[i + 1] - mean) / sd END)""".stripMargin
    val spNext = s"greatest(0.0::DOUBLE, sp + $z - 0.5::DOUBLE)"
    val snNext = s"greatest(0.0::DOUBLE, sn - $z - 0.5::DOUBLE)"
    val alarm = s"($spNext > 4.0::DOUBLE OR $snNext > 4.0::DOUBLE)"
    s"""WITH RECURSIVE bounds AS (
       |  SELECT date_trunc('hour', min(ts)) h0, date_trunc('hour', max(ts)) h1
       |  FROM events),
       |axis AS (
       |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) h FROM bounds),
       |types AS (SELECT DISTINCT event_type FROM events),
       |cnt AS (
       |  SELECT event_type, date_trunc('hour', ts) h, count(*) c
       |  FROM events GROUP BY 1, 2),
       |series AS (
       |  SELECT t.event_type, a.h, coalesce(c.c, 0)::DOUBLE v
       |  FROM types t CROSS JOIN axis a
       |  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.h = a.h),
       |vl AS (
       |  SELECT event_type, count(*)::BIGINT n, list(v ORDER BY h) vals
       |  FROM series GROUP BY 1),
       |st AS (
       |  SELECT event_type, n, vals,
       |    round(list_reduce(vals, (p, q) -> p + q) / n::DOUBLE, 6) mean
       |  FROM vl),
       |sd AS (
       |  SELECT event_type, n, vals, mean,
       |    round(sqrt(list_reduce(list_transform(vals, q -> (q - mean) * (q - mean)),
       |      (p, q) -> p + q) / n::DOUBLE), 6) sd
       |  FROM st),
       |r AS (
       |  SELECT event_type, n, vals, mean, sd, 0::BIGINT i,
       |    0.0::DOUBLE sp, 0.0::DOUBLE sn, 0::BIGINT na, 0::BIGINT fi
       |  FROM sd
       |  UNION ALL
       |  SELECT event_type, n, vals, mean, sd, i + 1,
       |    $spNext,
       |    $snNext,
       |    na + CASE WHEN $alarm THEN 1 ELSE 0 END,
       |    CASE WHEN fi > 0 THEN fi
       |         WHEN $alarm THEN i + 1 ELSE 0 END
       |  FROM r WHERE i < n)
       |SELECT event_type, n, round(sp, 6) AS cusum_pos,
       |  round(sn, 6) AS cusum_neg, na::BIGINT AS n_alarm_points,
       |  fi::BIGINT AS first_alarm_i
       |FROM r WHERE i = n ORDER BY event_type""".stripMargin
  }

  /** Association-rule support floor and report width. */
  private val AssocMinSupport = 3
  private val AssocTopK = 50

  /** Association rules over per-user purchase baskets (Agrawal &
    * Srikant 1994, "Fast algorithms for mining association rules",
    * VLDB — public paper): basket = the distinct purchased item ids
    * (the `k` prop) per user; for every ordered item pair with joint
    * support ≥ [[AssocMinSupport]] baskets, report
    * support = P(a,b), confidence = P(b|a), lift = conf / P(b) — the
    * market-basket report every commerce analytics stack ships. Top
    * [[AssocTopK]] rules by (rounded lift, antecedent, consequent).
    *
    * Scale shape: the basket self-join is keyed by user (pair volume
    * Σ |basket|² — bounded by catalog × basket density, never corpus²),
    * the pair counts map-side combine into ≤ |catalog|² groups, and the
    * per-item counts + basket total are broadcast back. Giant-basket
    * corpora would cap |basket| or move to SON/FP-growth partitioning;
    * the relational shape here is the exact-count baseline those
    * approximate. Determinism: metrics rounded to 4 dp BEFORE ranking,
    * (a, b) total tiebreak. */
  def qAssocRules(s: SparkSession, d: String): DataFrame = {
    val items = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .distinct()
    val nBaskets = items.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemN = items.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = items.select(col("user_id"), col("item").as("a"))
      .join(items.select(col("user_id"), col("item").as("b")), "user_id")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= AssocMinSupport)
    // both rule directions from the one canonical pair relation
    val directed = pairs.unionAll(pairs.select(
      col("b").as("a"), col("a").as("b"), col("n_ab")))
    val scored = directed
      .join(broadcast(itemN.withColumnRenamed("item", "a")
        .withColumnRenamed("n_item", "n_a")), "a")
      .join(broadcast(itemN.withColumnRenamed("item", "b")
        .withColumnRenamed("n_item", "n_b")), "b")
      .crossJoin(broadcast(nBaskets))
      .select(col("a"), col("b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_baskets"), 4).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 4).as("confidence"),
        round(col("n_ab").cast("double") * col("n_baskets") /
          (col("n_a") * col("n_b")), 4).as("lift"))
    // total order (lift, a, b) is unique → orderBy+limit plans
    // TakeOrderedAndProject (per-partition partial top-k, no global
    // sort or single-partition window)
    scored
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(AssocTopK)
  }

  val qAssocRulesSql: String =
    s"""WITH items AS (
       |  SELECT DISTINCT user_id, json_extract(props, '$$.k')::INT item
       |  FROM events WHERE event_type = 'purchase'),
       |nb AS (SELECT count(DISTINCT user_id) n_baskets FROM items),
       |itemn AS (SELECT item, count(*) n_item FROM items GROUP BY 1),
       |pairs AS (
       |  SELECT x.item a, y.item b, count(*) n_ab
       |  FROM items x JOIN items y
       |    ON x.user_id = y.user_id AND x.item < y.item
       |  GROUP BY 1, 2 HAVING count(*) >= $AssocMinSupport),
       |directed AS (
       |  SELECT a, b, n_ab FROM pairs
       |  UNION ALL SELECT b, a, n_ab FROM pairs),
       |scored AS (
       |  SELECT d.a, d.b, d.n_ab,
       |    round(d.n_ab::DOUBLE / nb.n_baskets, 4) support,
       |    round(d.n_ab::DOUBLE / na.n_item, 4) confidence,
       |    round(d.n_ab::DOUBLE * nb.n_baskets / (na.n_item * nbi.n_item), 4) lift
       |  FROM directed d
       |  JOIN itemn na ON na.item = d.a
       |  JOIN itemn nbi ON nbi.item = d.b
       |  CROSS JOIN nb)
       |SELECT a, b, n_ab, support, confidence, lift
       |FROM (SELECT *, row_number() OVER (ORDER BY lift DESC, a, b) rn
       |      FROM scored)
       |WHERE rn <= $AssocTopK
       |ORDER BY lift DESC, a, b""".stripMargin

  /** Markov next-event model, trained and EVALUATED in one relational
    * program — the mini ML pipeline (hash split → fit → score → metric)
    * that composes the engine's own pieces: users hash-split 80/20
    * (same md5 idiom as [[graft.queries.PipelineQueries.qSplitAssign]]),
    * the model is the per-prev-type argmax of training transition counts
    * (ties broken lexicographically so the fit is deterministic), and
    * accuracy is measured on the held-out users' transitions via one
    * broadcast join of the ≤types² model. Every stage is a shuffle on
    * (user) or a broadcast — nothing materializes on the driver. */
  def qMarkovEval(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val isTrain =
      conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100 < 80
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        isTrain.as("train"))
      .filter(col("prev_type").isNotNull)
    // fit: argmax next-type per prev over TRAIN pairs; deterministic
    // tiebreak (max count, then lexicographically first type)
    val wm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prev_type"))
      .orderBy(col("n").desc, col("event_type"))
    val model = pairs.filter(col("train"))
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wm))
      .filter(col("rn") === 1)
      .select(col("prev_type"), col("event_type").as("predicted"))
    pairs.filter(!col("train"))
      .join(broadcast(model), Seq("prev_type"), "left")
      .agg(
        count(lit(1)).as("n_test_pairs"),
        sum(when(col("event_type") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("n_test_pairs"), col("n_correct"),
        round(col("n_correct").cast("double") /
          nullif(col("n_test_pairs").cast("double"), lit(0.0)), 6).as("accuracy"))
  }

  val qMarkovEvalSql: String =
    """WITH pairs AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_type,
      |    ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::INTEGER % 100 < 80 train
      |  FROM events),
      |p2 AS (SELECT * FROM pairs WHERE prev_type IS NOT NULL),
      |model AS (
      |  SELECT prev_type, event_type predicted FROM (
      |    SELECT prev_type, event_type, row_number() OVER (
      |      PARTITION BY prev_type ORDER BY count(*) DESC, event_type) rn
      |    FROM p2 WHERE train GROUP BY 1, 2) WHERE rn = 1)
      |SELECT count(*) AS n_test_pairs,
      |  sum(CASE WHEN event_type = predicted THEN 1 ELSE 0 END)::BIGINT AS n_correct,
      |  round(sum(CASE WHEN event_type = predicted THEN 1 ELSE 0 END)::DOUBLE
      |    / nullif(count(*), 0), 6) AS accuracy
      |FROM p2 LEFT JOIN model USING (prev_type) WHERE NOT train""".stripMargin

  /** Top 3-step event paths — the sequence-n-gram report behind funnel
    * discovery (which journeys actually happen, before you pick which
    * to measure with [[qEventFunnel]]). Two lag windows over the same
    * per-user total order (ONE shuffle: same partition key and order →
    * one Window exec evaluates both), a mergeable path count, and a
    * global top-10 that plans as TakeOrderedAndProject — per-partition
    * heaps, no global sort. */
  def qTopPaths(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("t3"),
        lag(col("event_type"), 1).over(w).as("t2"),
        lag(col("event_type"), 2).over(w).as("t1"))
      .filter(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(10)
  }

  val qTopPathsSql: String =
    """WITH seq AS (
      |  SELECT event_type t3,
      |    lag(event_type, 1) OVER w t2,
      |    lag(event_type, 2) OVER w t1
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT t1, t2, t3, count(*) n FROM seq WHERE t1 IS NOT NULL
      |GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 10""".stripMargin

  /** A/B experiment readout — the product-analytics closer: users
    * hash-assigned to variants (same md5-bucket idiom as the split
    * assigner: reproducible, reorder-stable, no coordination),
    * conversion = ≥1 purchase event, then the two-proportion pooled
    * z-statistic for the lift. One distinct-agg shuffle keyed by user;
    * the variant stats collapse to 2 rows before any float math, so the
    * z arithmetic is a scalar program both engines evaluate identically.
    */
  def qAbLift(s: SparkSession, d: String): DataFrame = {
    val variant = when(
      conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 2 === 0, "A").otherwise("B")
    val perUser = Tables.events(s, d)
      .select(col("user_id"), variant.as("variant"),
        (col("event_type") === "purchase").cast("int").as("purchased"))
      .groupBy(col("variant"), col("user_id"))
      .agg(max(col("purchased")).as("converted"))
    val stats = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).cast("long").as("conv"))
    val a = stats.filter(col("variant") === "A")
      .select(col("n").as("n_a"), col("conv").as("conv_a"))
    val b = stats.filter(col("variant") === "B")
      .select(col("n").as("n_b"), col("conv").as("conv_b"))
    a.crossJoin(b)
      .withColumn("rate_a", col("conv_a").cast("double") / col("n_a"))
      .withColumn("rate_b", col("conv_b").cast("double") / col("n_b"))
      .withColumn("pooled",
        (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b")))
      .select(
        col("n_a"), col("conv_a"), round(col("rate_a"), 6).as("rate_a"),
        col("n_b"), col("conv_b"), round(col("rate_b"), 6).as("rate_b"),
        // nullif guards the degenerate experiments (zero conversions /
        // one-sided assignment): ANSI mode makes 0-division an ERROR,
        // and NULL is the honest readout for an undefined lift/z
        round(col("rate_b") / nullif(col("rate_a"), lit(0.0)) - 1.0, 6).as("lift"),
        round((col("rate_b") - col("rate_a")) /
          nullif(sqrt(col("pooled") * (lit(1.0) - col("pooled")) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), lit(0.0)), 4).as("z"))
  }

  val qAbLiftSql: String =
    """WITH pu AS (
      |  SELECT CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::INTEGER % 2 = 0
      |              THEN 'A' ELSE 'B' END variant,
      |    user_id, max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) converted
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT variant, count(*) n, sum(converted)::BIGINT conv FROM pu GROUP BY 1),
      |a AS (SELECT n n_a, conv conv_a FROM s WHERE variant = 'A'),
      |b AS (SELECT n n_b, conv conv_b FROM s WHERE variant = 'B'),
      |j AS (
      |  SELECT *, conv_a::DOUBLE / n_a rate_a, conv_b::DOUBLE / n_b rate_b,
      |    (conv_a + conv_b)::DOUBLE / (n_a + n_b) pooled
      |  FROM a CROSS JOIN b)
      |SELECT n_a, conv_a, round(rate_a, 6) AS rate_a,
      |  n_b, conv_b, round(rate_b, 6) AS rate_b,
      |  round(rate_b / nullif(rate_a, 0.0::DOUBLE) - 1.0::DOUBLE, 6) AS lift,
      |  round((rate_b - rate_a) /
      |    nullif(sqrt(pooled * (1.0::DOUBLE - pooled) *
      |      (1.0::DOUBLE / n_a + 1.0::DOUBLE / n_b)), 0.0::DOUBLE), 4) AS z
      |FROM j""".stripMargin

  /** SCD2-style change history (Kimball's type-2 slowly-changing
    * dimension, the standard warehouse pattern): collapse each user's
    * event stream into maximal runs of an unchanged attribute
    * (event_type here) and emit one versioned validity interval per run —
    * valid_from = run start, valid_to = next run's start (open interval,
    * 'current' on the live row), the exact layout a dimension-table merge
    * writes.
    *
    * Scale shape: the run flag is a lag + running sum over ONE
    * user_id-keyed sort (the qSessionize idiom — deliberately not the
    * rn-minus-rn gaps-and-islands form, whose second window would key on
    * (user_id, attr) and force a second corpus exchange); the run rollup
    * and the lead() stitching both re-use the same user_id clustering, so
    * the whole history build is one shuffle of the event stream plus
    * per-user window passes — no self-join of events against events,
    * which is the naive SCD2 formulation that dies at 100 TB. */
  def qScd2(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = Tables.events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("chg",
        when(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"), 1).otherwise(0))
      .withColumn("version", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = flagged
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("event_type"), // constant within a run
        min(col("ts")).as("from_ts"), count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy(col("user_id")).orderBy(col("version"))
    runs
      .withColumn("to_ts", lead(col("from_ts"), 1).over(byVersion))
      .select(col("user_id"), col("version"), col("event_type"),
        date_format(col("from_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        coalesce(date_format(col("to_ts"), "yyyy-MM-dd HH:mm:ss"),
          lit("current")).as("valid_to"),
        col("n_events"), col("to_ts").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val qScd2Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END chg
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |versioned AS (
      |  SELECT *, (sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT ver
      |  FROM flagged),
      |runs AS (
      |  SELECT user_id, ver, min(event_type) event_type,
      |    min(ts) from_ts, count(*)::BIGINT n_events
      |  FROM versioned GROUP BY 1, 2),
      |stitched AS (
      |  SELECT *, lead(from_ts) OVER (PARTITION BY user_id ORDER BY ver) to_ts
      |  FROM runs)
      |SELECT user_id, ver AS "version", event_type,
      |  strftime(from_ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  coalesce(strftime(to_ts, '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to,
      |  n_events, to_ts IS NULL AS is_current
      |FROM stitched ORDER BY user_id, ver""".stripMargin

  /** Sliding-reach window width (hours) and estimator error budget. */
  private val SlidingReachHours = 24
  private val SlidingReachBudget = 0.05

  /** The sliding-window merge over an (h, sk) hourly-sketch relation —
    * the ONE kernel behind [[qSlidingReach]] and the streamed ledger
    * ([[graft.streaming.ReachStream]]): replicate each sketch row onto
    * the ≤ [[SlidingReachHours]] target hours it serves and union per
    * target. Targets = hours present in the relation. */
  private[graft] def slidingReachEst(hourly: DataFrame): DataFrame = {
    val targets = hourly.select(col("h").as("t"))
    hourly.select(col("h"), col("sk"),
        explode(sequence(lit(0), lit(SlidingReachHours - 1))).as("off"))
      .withColumn("t", expr("h + make_interval(0, 0, 0, 0, off, 0, 0)"))
      .join(targets, "t")
      .groupBy(col("t"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"),
        count(lit(1)).as("n_hours_merged"))
  }

  /** Trailing-24h distinct users per hour from MERGED hourly HLL
    * sketches — the pre-aggregated sketch-cube pattern (Heule et al.
    * 2013, "HyperLogLog in Practice", EDBT — public paper: HLL unions
    * are lossless, so any window is the merge of its buckets' sketches).
    * Raw events are touched ONCE to build |hours| sketch rows; every
    * sliding window after that merges ≤ 24 sketches, so a dashboard
    * serving hundreds of windows never re-scans the corpus — the shape
    * that matters at 100 TB, where per-window countDistinct over raw
    * events would re-shuffle user ids once per window.
    *
    * The window join replicates the SKETCH rows 24× (hours × 24 rows
    * total, corpus-independent), not the events. Output is a
    * hash-checked gate: per target hour, the merged-sketch estimate must
    * sit within [[SlidingReachBudget]] of the exact trailing distinct
    * (computed from deduped (hour, user) pairs — also corpus-bounded),
    * and `n_hours_merged` re-derives the window bucketing in the oracle
    * so the bucket logic itself is hash-checked, not just the booleans. */
  def qSlidingReach(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val hourly = e.groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val targets = hourly.select(col("h").as("t"))
    val est = slidingReachEst(hourly)
    // Exact twin via sweep-line interval union (the gate's ground truth,
    // and itself scale-shaped): a user active at hour h is IN the count
    // for targets [h, h+23], so per user the covered targets are a union
    // of intervals. Merge each user's active hours into coverage runs
    // (one user-keyed window over deduped (hour, user) rows — no 24×
    // replication), emit ±1 deltas at run boundaries, and prefix-sum the
    // deltas along the HOUR AXIS — whose row count is bounded by the
    // time span, not the corpus, so its global window is axis-bounded
    // (≤ |hours| + W rows at any data size). Replacing the exploded
    // per-window countDistinct cut the sf1 wall 21 s → ~2 s.
    val hu = e.select(date_trunc("hour", col("ts")).as("h"),
      col("user_id")).distinct()
    val wu = Window.partitionBy(col("user_id")).orderBy(col("h"))
    val runs = hu
      .withColumn("prev", lag(col("h"), 1).over(wu))
      .withColumn("new_run", when(col("prev").isNull ||
        col("h") > col("prev") +
          expr(s"INTERVAL ${SlidingReachHours - 1} HOURS"), 1).otherwise(0))
      .withColumn("run_id",
        sum(col("new_run")).over(wu.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("h")).as("rs"),
        (max(col("h")) +
          expr(s"INTERVAL ${SlidingReachHours - 1} HOURS")).as("re"))
    val deltas = runs.select(col("rs").as("t"), lit(1L).as("delta"))
      .unionAll(runs.select(
        (col("re") + expr("INTERVAL 1 HOURS")).as("t"), lit(-1L).as("delta")))
      // target hours enter the axis as 0-deltas so every target row
      // carries the cumulative count as of that hour (a target between
      // two run boundaries has no delta row of its own)
      .unionAll(targets.select(col("t"), lit(0L).as("delta")))
      .groupBy(col("t")).agg(sum(col("delta")).as("d"))
    val wAxis = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val exact = deltas
      .withColumn("exact_users", sum(col("d")).over(wAxis))
      .join(targets, "t")
      .select(col("t"), col("exact_users"))
    est.join(exact, "t")
      .select(date_format(col("t"), "yyyy-MM-dd HH:mm:ss").as("hour_s"),
        col("n_hours_merged"),
        round(lit(SlidingReachBudget), 2).as("budget"),
        (abs(col("est_users") - col("exact_users")).cast("double") /
          col("exact_users").cast("double") <= SlidingReachBudget)
          .as("est_ok"))
      .orderBy(col("hour_s"))
  }

  val qSlidingReachSql: String =
    s"""WITH hu AS (
       |  SELECT DISTINCT date_trunc('hour', ts) h, user_id FROM events),
       |hours AS (SELECT DISTINCT h FROM hu),
       |win AS (
       |  SELECT t.h t, s.h src FROM hours t JOIN hours s
       |  ON s.h <= t.h AND s.h > t.h - INTERVAL $SlidingReachHours HOUR)
       |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS hour_s,
       |  count(DISTINCT src) AS n_hours_merged,
       |  $SlidingReachBudget::DOUBLE AS budget, TRUE AS est_ok
       |FROM win GROUP BY 1 ORDER BY 1""".stripMargin

  /** Attribution lookback window, in days. */
  private val AttribWindowDays = 3

  /** Multi-touch marketing attribution (the standard model set every
    * analytics product ships — last-touch, first-touch, linear, and
    * position-based/U-shaped per e.g. the public Google Analytics
    * attribution-model documentation): each purchase distributes one
    * unit of conversion credit over the click/view touches the same user
    * made in the preceding [[AttribWindowDays]]-day window, and the
    * report totals credit per (model, touch type).
    *
    * U-shaped splits 40/40 between first and last touch and 20 across
    * the middle (degenerating to 100% at n=1 and 50/50 at n=2).
    *
    * Scale shape: the conversion×touch pair-up is ONE user_id-keyed
    * shuffle (both sides partition by user; the time-window filter runs
    * inside the join), the three rank/count windows share that
    * partitioning so no further exchange, and the model stack explodes
    * 4× before a tiny (model, type)-keyed final aggregation. Pair volume
    * is bounded by per-user activity × the lookback window, not corpus
    * size; a skew-heavy deployment would band the join on (user_id,
    * day(ts)) like the range-incidents operator. Determinism: first/last
    * ranks tiebreak on touch event_id; credits are exact rationals
    * summed then rounded to 4 dp. */
  def qAttribution(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val conv = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("cts"))
    val touch = e.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts").as("tts"), col("event_type"))
    val pairs = conv.join(touch, "user_id")
      .filter(col("tts") < col("cts") &&
        col("tts") >= col("cts") - expr(s"INTERVAL $AttribWindowDays DAYS"))
    val wAsc = Window.partitionBy(col("conv_id"))
      .orderBy(col("tts").asc, col("touch_id").asc)
    val wDesc = Window.partitionBy(col("conv_id"))
      .orderBy(col("tts").desc, col("touch_id").desc)
    val wN = Window.partitionBy(col("conv_id"))
    val credited = pairs
      .withColumn("rn_asc", row_number().over(wAsc))
      .withColumn("rn_desc", row_number().over(wDesc))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("last_touch",
        when(col("rn_desc") === 1, lit(1.0)).otherwise(lit(0.0)))
      .withColumn("first_touch",
        when(col("rn_asc") === 1, lit(1.0)).otherwise(lit(0.0)))
      .withColumn("linear", lit(1.0) / col("n"))
      .withColumn("position_based",
        when(col("n") === 1, lit(1.0))
          .when(col("n") === 2, lit(0.5))
          .when(col("rn_asc") === 1 || col("rn_desc") === 1, lit(0.4))
          .otherwise(lit(0.2) / (col("n") - 2)))
    credited
      .select(col("event_type"), expr(
        """stack(4,
          |  'last_touch', last_touch,
          |  'first_touch', first_touch,
          |  'linear', linear,
          |  'position_based', position_based) AS (model, credit)""".stripMargin))
      .groupBy(col("model"), col("event_type"))
      .agg(round(sum(col("credit")), 4).as("credit"),
        count(when(col("credit") > 0, lit(1))).as("n_touches"))
      .orderBy(col("model"), col("event_type"))
  }

  val qAttributionSql: String =
    s"""WITH conv AS (
       |  SELECT user_id, event_id conv_id, ts cts
       |  FROM events WHERE event_type = 'purchase'),
       |touch AS (
       |  SELECT user_id, event_id touch_id, ts tts, event_type
       |  FROM events WHERE event_type IN ('click', 'view')),
       |pairs AS (
       |  SELECT conv_id, touch_id, tts, event_type
       |  FROM conv JOIN touch USING (user_id)
       |  WHERE tts < cts AND tts >= cts - INTERVAL $AttribWindowDays DAY),
       |ranked AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY tts, touch_id) rn_asc,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY tts DESC, touch_id DESC) rn_desc,
       |    count(*) OVER (PARTITION BY conv_id) n
       |  FROM pairs),
       |credited AS (
       |  SELECT event_type,
       |    CASE WHEN rn_desc = 1 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END last_touch,
       |    CASE WHEN rn_asc = 1 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END first_touch,
       |    1.0::DOUBLE / n AS linear,
       |    CASE WHEN n = 1 THEN 1.0::DOUBLE
       |         WHEN n = 2 THEN 0.5::DOUBLE
       |         WHEN rn_asc = 1 OR rn_desc = 1 THEN 0.4::DOUBLE
       |         ELSE 0.2::DOUBLE / (n - 2) END position_based
       |  FROM ranked),
       |stacked AS (
       |  SELECT event_type, 'last_touch' model, last_touch credit FROM credited
       |  UNION ALL
       |  SELECT event_type, 'first_touch', first_touch FROM credited
       |  UNION ALL
       |  SELECT event_type, 'linear', linear FROM credited
       |  UNION ALL
       |  SELECT event_type, 'position_based', position_based FROM credited)
       |SELECT model, event_type, round(sum(credit), 4) AS credit,
       |  count(*) FILTER (WHERE credit > 0) AS n_touches
       |FROM stacked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Funnel step-latency percentiles — the "HOW LONG do users take
    * between steps" companion to [[qEventFunnel]]'s "how many make it":
    * per user, the first view, the first click at-or-after it, the
    * first purchase at-or-after that (pure timestamp semantics — no
    * event-file-order dependence, so both engines derive identical
    * anchors), then p50/p90/mean of the two transition latencies in
    * seconds. The conversion-speed report every growth/ops dashboard
    * carries next to the funnel counts.
    *
    * Scale shape: three conditional-min aggregations keyed by user_id
    * (map-side combinable) stitched by user-keyed equi-joins — the
    * event stream shuffles once per stage and only (user_id, ts) pairs
    * move; the percentile agg sees ≤ one row per converting user. */
  def qFunnelLatency(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
    val tv = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("tv"))
    val tc = ev.filter(col("event_type") === "click")
      .join(tv, "user_id").filter(col("us") >= col("tv"))
      .groupBy(col("user_id"), col("tv")).agg(min(col("us")).as("tc"))
    val tp = ev.filter(col("event_type") === "purchase")
      .join(tc, "user_id").filter(col("us") >= col("tc"))
      .groupBy(col("user_id"), col("tc")).agg(min(col("us")).as("tp"))
    val vc = tc.select(
      round((col("tc") - col("tv")) / 1000000.0, 6).as("lat_s"))
      .withColumn("step", lit("1_view_to_click"))
    val cp = tp.select(
      round((col("tp") - col("tc")) / 1000000.0, 6).as("lat_s"))
      .withColumn("step", lit("2_click_to_purchase"))
    funnelLatencyRollup(vc.unionByName(cp))
  }

  /** Shared percentile rollup over (step, lat_s) transition latencies —
    * one kernel serving both the batch report above and the streaming
    * anchor ledger ([[graft.streaming.EventStream.funnelLatencyReport]]),
    * so stream and batch can only disagree on the anchors themselves. */
  private[graft] def funnelLatencyRollup(lat: DataFrame): DataFrame =
    lat.groupBy(col("step"))
      .agg(count(lit(1)).as("n_users"),
        round(expr("percentile(lat_s, 0.5)"), 4).as("p50_s"),
        round(expr("percentile(lat_s, 0.9)"), 4).as("p90_s"),
        round(avg(col("lat_s")), 4).as("mean_s"))
      .orderBy(col("step"))

  val qFunnelLatencySql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type FROM events),
      |tv AS (SELECT user_id, min(us) tv FROM ev
      |  WHERE event_type = 'view' GROUP BY 1),
      |tc AS (SELECT ev.user_id, tv.tv, min(us) tc FROM ev
      |  JOIN tv ON ev.user_id = tv.user_id
      |  WHERE event_type = 'click' AND us >= tv.tv GROUP BY 1, 2),
      |tp AS (SELECT ev.user_id, tc.tc, min(us) tp FROM ev
      |  JOIN tc ON ev.user_id = tc.user_id
      |  WHERE event_type = 'purchase' AND us >= tc.tc GROUP BY 1, 2),
      |lat AS (
      |  SELECT '1_view_to_click' step, round((tc - tv) / 1000000.0, 6) lat_s
      |  FROM tc
      |  UNION ALL
      |  SELECT '2_click_to_purchase' step, round((tp - tc) / 1000000.0, 6) lat_s
      |  FROM tp)
      |SELECT step, count(*)::BIGINT n_users,
      |  round(quantile_cont(lat_s, 0.5), 4) p50_s,
      |  round(quantile_cont(lat_s, 0.9), 4) p90_s,
      |  round(avg(lat_s), 4) mean_s
      |FROM lat GROUP BY 1 ORDER BY step""".stripMargin

  /** Audience-overlap gate (ev_reach_intersect_gate) — the set-algebra
    * report the HLL reach family cannot produce: how many users did BOTH
    * of (view, click), (click, purchase), (view, purchase), estimated
    * from per-type KMV sketches ([[graft.functions.KmvAgg]] — k smallest
    * distinct user-id hashes; the k-min SAMPLE supports intersection and
    * Jaccard, where HLL registers only union). One pass over the events
    * builds |types| 8·k-byte sketches; every overlap estimate is
    * k-bounded driver arithmetic on that rollup. The gate computes the
    * exact overlap too (distinct-user semi-joins — the diagnostic twin,
    * same pattern as the recall gates' brute-force truth) and checks the
    * estimate within rel_budget: |D̂∩ − D∩| ≤ max(budget·D∩, 75).
    * Budget = 0.15 vs a measured ~1/√k ≈ 3% σ per component at k=1024
    * (≥3x headroom; the absolute floor covers small true overlaps where
    * relative bounds are meaningless). */
  private[graft] def reachIntersectMeasured(s: SparkSession,
      d: String): Seq[(String, Long, Double, Double, Boolean)] = {
    import graft.functions.{Kmv, SketchFunctions}
    val k = 1024
    val budget = 0.15
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("user_id"))
    val sketches = ev
      .groupBy(col("event_type"))
      .agg(SketchFunctions.kmvSketch(col("user_id"), k).as("sk"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    val users = ev.distinct().localCheckpoint()
    def uset(t: String) = users.filter(col("event_type") === t)
      .select(col("user_id"))
    Seq(("view", "click"), ("click", "purchase"), ("view", "purchase"))
      .map { case (a, b) =>
        val exact = uset(a).join(uset(b), Seq("user_id"), "left_semi").count()
        val est = Kmv.intersection(
          sketches.getOrElse(a, Array.empty), sketches.getOrElse(b, Array.empty), k)
        val ok = math.abs(est - exact) <= math.max(budget * exact, 75.0)
        (s"${a}_$b", exact, budget, est, ok)
      }
  }

  def qReachIntersectGate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    reachIntersectMeasured(s, d)
      .map { case (pair, exact, budget, _, ok) => (pair, exact, budget, ok) }
      .toDF("pair", "n_exact", "rel_budget", "est_ok")
      .orderBy(col("pair"))
  }

  val qReachIntersectGateSql: String =
    """WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
      |x AS (
      |  SELECT 'view_click' AS pair, count(*)::BIGINT AS n_exact FROM (
      |    SELECT user_id FROM u WHERE event_type = 'view'
      |    INTERSECT SELECT user_id FROM u WHERE event_type = 'click')
      |  UNION ALL
      |  SELECT 'click_purchase', count(*)::BIGINT FROM (
      |    SELECT user_id FROM u WHERE event_type = 'click'
      |    INTERSECT SELECT user_id FROM u WHERE event_type = 'purchase')
      |  UNION ALL
      |  SELECT 'view_purchase', count(*)::BIGINT FROM (
      |    SELECT user_id FROM u WHERE event_type = 'view'
      |    INTERSECT SELECT user_id FROM u WHERE event_type = 'purchase'))
      |SELECT pair, n_exact, 0.15::DOUBLE AS rel_budget, TRUE AS est_ok
      |FROM x ORDER BY pair""".stripMargin

  /** Sample-ratio-mismatch check (Fabijan et al. 2019, "Diagnosing
    * Sample Ratio Mismatch in Online Controlled Experiments", KDD —
    * public paper): the FIRST validity gate every experimentation
    * platform runs before reading ev_ab_lift — is the 50/50 hash
    * assignment actually delivering 50/50 among the users observed, per
    * event type and overall? A skewed ratio means logging or triggering
    * bias, and every downstream lift number is suspect. χ² for two
    * equal-expectation cells reduces to (n_a − n_b)²/(n_a + n_b);
    * threshold 10.83 = χ²₁ at α = 0.001 (the deliberately-strict SRM
    * convention — an experimenter investigates, not shrugs). Exact
    * integer counts + one closed-form division → fully hash-checkable.
    * One distinct + one agg; only (type, user, variant) rows shuffle. */
  def qSrmCheck(s: SparkSession, d: String): DataFrame = {
    val variant = when(
      conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 2 === 0, "A").otherwise("B")
    val byType = Tables.events(s, d)
      .select(col("event_type"), col("user_id"), variant.as("variant"))
      .distinct()
    val overall = byType
      .select(lit("_overall").as("event_type"), col("user_id"), col("variant"))
      .distinct()
    byType.unionByName(overall)
      .groupBy(col("event_type"))
      .agg(
        count(when(col("variant") === "A", 1)).as("n_a"),
        count(when(col("variant") === "B", 1)).as("n_b"))
      .withColumn("chi2", round(
        (col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) /
          (col("n_a") + col("n_b")).cast("double"), 6))
      .select(col("event_type"), col("n_a"), col("n_b"), col("chi2"),
        lit(10.83).as("threshold"), (col("chi2") <= 10.83).as("srm_ok"))
      .orderBy(col("event_type"))
  }

  val qSrmCheckSql: String =
    """WITH bt AS (
      |  SELECT DISTINCT event_type, user_id,
      |    CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::INTEGER % 2 = 0
      |         THEN 'A' ELSE 'B' END variant
      |  FROM events),
      |u AS (SELECT event_type, user_id, variant FROM bt
      |  UNION SELECT DISTINCT '_overall', user_id, variant FROM bt),
      |c AS (SELECT event_type,
      |    count(CASE WHEN variant = 'A' THEN 1 END) n_a,
      |    count(CASE WHEN variant = 'B' THEN 1 END) n_b
      |  FROM u GROUP BY 1)
      |SELECT event_type, n_a, n_b,
      |  round((n_a - n_b) * (n_a - n_b) / (n_a + n_b)::DOUBLE, 6) AS chi2,
      |  10.83::DOUBLE AS threshold,
      |  round((n_a - n_b) * (n_a - n_b) / (n_a + n_b)::DOUBLE, 6) <= 10.83::DOUBLE
      |    AS srm_ok
      |FROM c ORDER BY event_type""".stripMargin

  /** CUPED variance reduction (Deng et al. 2013, "Improving the
    * Sensitivity of Online Controlled Experiments by Utilizing
    * Pre-Experiment Data", WSDM — public paper): the third leg of the
    * experimentation toolkit next to ev_ab_lift and ev_srm_check.
    * Covariate x = each user's PRE-period purchase count (Jan 1–15),
    * outcome y = converted in the experiment period (Jan 16–30);
    * θ = cov(x,y)/var(x), adjusted outcome y′ = y − θ(x − x̄), giving
    * var(y′) = var(y) − cov²/var(x) — the same treatment-effect
    * estimate with strictly less variance, i.e. the same experiment
    * decided in fewer days. Reported: θ, both variances, the reduction
    * share, and the raw vs adjusted B−A effect.
    *
    * Every statistic derives from ONE corpus scan's integer moment sums
    * (x, y are counts/indicators, so Σx, Σy, Σxy, Σx² are exact and the
    * closed-form doubles are engine-identical); the moment row is
    * 1-row, the rest is driver arithmetic. */
  def qCupedLift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val variant = when(
      conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 2 === 0, "A").otherwise("B")
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_type"), variant.as("v"))
    val perUser = ev
      .groupBy(col("user_id"), col("v"))
      .agg(
        sum(when(col("ts") < cutoff && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("x"),
        max(when(col("ts") >= cutoff && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("y"),
        max(when(col("ts") >= cutoff, 1L).otherwise(0L)).as("in_exp"))
      .filter(col("in_exp") === 1L)
    val m = perUser.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
      count(when(col("v") === "A", 1)).as("na"),
      sum(when(col("v") === "A", col("x")).otherwise(0L)).as("sxa"),
      sum(when(col("v") === "A", col("y")).otherwise(0L)).as("sya"),
      count(when(col("v") === "B", 1)).as("nb"),
      sum(when(col("v") === "B", col("x")).otherwise(0L)).as("sxb"),
      sum(when(col("v") === "B", col("y")).otherwise(0L)).as("syb")).head()
    val (n, sx, sy, sxy, sxx) = (m.getLong(0).toDouble, m.getLong(1).toDouble,
      m.getLong(2).toDouble, m.getLong(3).toDouble, m.getLong(4).toDouble)
    val (na, sxa, sya) = (m.getLong(5).toDouble, m.getLong(6).toDouble,
      m.getLong(7).toDouble)
    val (nb, sxb, syb) = (m.getLong(8).toDouble, m.getLong(9).toDouble,
      m.getLong(10).toDouble)
    val xbar = sx / n
    val varX = sxx / n - xbar * xbar
    val cov = sxy / n - xbar * (sy / n)
    val theta = if (varX <= 0) 0.0 else cov / varX
    val varY = sy / n - (sy / n) * (sy / n) // y² = y for a 0/1 outcome
    val varCuped = varY - theta * cov
    val reduction = if (varY <= 0) 0.0 else 1.0 - varCuped / varY
    // an empty variant arm (every observed user hashed to one side —
    // possible at tiny SF) has no defined lift: emit 0.0 instead of
    // NaN, which BigDecimal would reject; mirrors the varX<=0 θ guard
    // and the oracle's one-arm CASE
    val oneArm = na == 0 || nb == 0
    val rawDiff = if (oneArm) 0.0 else syb / nb - sya / na
    val adjDiff = if (oneArm) 0.0
      else (syb / nb - theta * (sxb / nb - xbar)) -
        (sya / na - theta * (sxa / na - xbar))
    // HALF_UP (= away from zero on both signs) matches DuckDB's round
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((m.getLong(0), r6(theta), r6(varY), r6(varCuped), r6(reduction),
      r6(rawDiff), r6(adjDiff)))
      .toDF("n_users", "theta", "var_y", "var_cuped", "var_reduction",
        "raw_diff", "adj_diff")
  }

  val qCupedLiftSql: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_type,
      |    CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::INTEGER % 2 = 0
      |         THEN 'A' ELSE 'B' END v
      |  FROM events),
      |pu AS (
      |  SELECT user_id, v,
      |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
      |             AND event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT x,
      |    max(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
      |             AND event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT y,
      |    max(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
      |             THEN 1 ELSE 0 END) in_exp
      |  FROM ev GROUP BY 1, 2),
      |m AS (
      |  SELECT count(*)::BIGINT n, sum(x)::BIGINT sx, sum(y)::BIGINT sy,
      |    sum(x*y)::BIGINT sxy, sum(x*x)::BIGINT sxx,
      |    count(CASE WHEN v = 'A' THEN 1 END)::BIGINT na,
      |    sum(CASE WHEN v = 'A' THEN x ELSE 0 END)::BIGINT sxa,
      |    sum(CASE WHEN v = 'A' THEN y ELSE 0 END)::BIGINT sya,
      |    count(CASE WHEN v = 'B' THEN 1 END)::BIGINT nb,
      |    sum(CASE WHEN v = 'B' THEN x ELSE 0 END)::BIGINT sxb,
      |    sum(CASE WHEN v = 'B' THEN y ELSE 0 END)::BIGINT syb
      |  FROM pu WHERE in_exp = 1),
      |c AS (
      |  SELECT n, sx::DOUBLE / n xbar,
      |    sxx::DOUBLE / n - (sx::DOUBLE / n) * (sx::DOUBLE / n) var_x,
      |    sxy::DOUBLE / n - (sx::DOUBLE / n) * (sy::DOUBLE / n) cov,
      |    sy::DOUBLE / n - (sy::DOUBLE / n) * (sy::DOUBLE / n) var_y,
      |    sya::DOUBLE / na mya, sxa::DOUBLE / na mxa,
      |    syb::DOUBLE / nb myb, sxb::DOUBLE / nb mxb
      |  FROM m),
      |t AS (SELECT *, CASE WHEN var_x <= 0 THEN 0.0::DOUBLE
      |    ELSE cov / var_x END theta FROM c)
      |SELECT n AS n_users, round(theta, 6) AS theta,
      |  round(var_y, 6) AS var_y,
      |  round(var_y - theta * cov, 6) AS var_cuped,
      |  CASE WHEN var_y <= 0 THEN 0.0::DOUBLE
      |       ELSE round(1.0::DOUBLE - (var_y - theta * cov) / var_y, 6)
      |  END AS var_reduction,
      |  CASE WHEN mya IS NULL OR myb IS NULL THEN 0.0::DOUBLE
      |       ELSE round(myb - mya, 6) END AS raw_diff,
      |  CASE WHEN mya IS NULL OR myb IS NULL THEN 0.0::DOUBLE
      |       ELSE round((myb - theta * (mxb - xbar))
      |                  - (mya - theta * (mxa - xbar)), 6)
      |  END AS adj_diff
      |FROM t""".stripMargin

  /** Difference-in-differences lift (Ashenfelter 1978 / Card & Krueger
    * 1994's design, the textbook panel-data estimator — public
    * methodology): the fourth experimentation leg next to
    * [[qAbLift]]/[[qSrmCheck]]/[[qCupedLift]], for the case where the
    * treatment went out at a KNOWN time rather than behind a hash gate —
    * compare each arm's post-vs-pre change so any shared time trend
    * cancels: DiD = (ȳ_B,post − ȳ_B,pre) − (ȳ_A,post − ȳ_A,pre).
    * Reuses ev_cuped's period boundary and ev_ab_lift's hash arms.
    *
    * Scale shape: one events scan → per-(user, period) conversion (a
    * map-side-combinable max), cell moments per (variant, period) —
    * a 4-row relation — then scalar double math on the collapsed frame.
    * SE is the independent-cell pooled form √(Σ s²ᵢ/nᵢ) from the same
    * exact integer moments (binary outcome: s² = p(1−p)·n/(n−1)). */
  def qDidLift(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val variant = when(
      conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 2 === 0, "A").otherwise("B")
    val perUser = Tables.events(s, d)
      .select(col("user_id"), variant.as("v"),
        when(col("ts") < cutoff, "pre").otherwise("post").as("period"),
        (col("event_type") === "purchase").cast("int").as("p"))
      .groupBy(col("v"), col("period"), col("user_id"))
      .agg(max(col("p")).as("y"))
    val cells = perUser.groupBy(col("v"), col("period"))
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("c"))
      .withColumn("m", col("c").cast("double") / col("n"))
      // binary outcome: unbiased cell variance from the same counts.
      // A single-user cell makes n/(n−1) a 0/0 — Spark (non-ANSI)
      // returns NULL where DuckDB's IEEE float division gives NaN, so
      // both engines pin the degenerate cell to 0.0 explicitly (the
      // qCupedLift one-arm guard pattern).
      .withColumn("s2", when(col("n") <= 1, lit(0.0))
        .otherwise(col("m") * (lit(1.0) - col("m")) *
          col("n") / (col("n") - lit(1.0))))
    def cell(v: String, p: String, suffix: String): DataFrame =
      cells.filter(col("v") === v && col("period") === p)
        .select(col("n").as(s"n_$suffix"), col("m").as(s"m_$suffix"),
          col("s2").as(s"s2_$suffix"))
    cell("A", "pre", "a0").crossJoin(cell("A", "post", "a1"))
      .crossJoin(cell("B", "pre", "b0")).crossJoin(cell("B", "post", "b1"))
      .withColumn("did", (col("m_b1") - col("m_b0")) - (col("m_a1") - col("m_a0")))
      .withColumn("se", sqrt(
        col("s2_a0") / col("n_a0") + col("s2_a1") / col("n_a1") +
          col("s2_b0") / col("n_b0") + col("s2_b1") / col("n_b1")))
      .select(
        round(col("m_a0"), 6).as("mean_a_pre"),
        round(col("m_a1"), 6).as("mean_a_post"),
        round(col("m_b0"), 6).as("mean_b_pre"),
        round(col("m_b1"), 6).as("mean_b_post"),
        round(col("did"), 6).as("did"),
        round(col("se"), 6).as("se"),
        round(col("did") / nullif(col("se"), lit(0.0)), 4).as("t_stat"))
  }

  val qDidLiftSql: String =
    """WITH pu AS (
      |  SELECT CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::INTEGER % 2 = 0
      |              THEN 'A' ELSE 'B' END v,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'pre' ELSE 'post' END period,
      |    user_id, max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) y
      |  FROM events GROUP BY 1, 2, 3),
      |cells AS (
      |  SELECT v, period, count(*) n, sum(y)::BIGINT c,
      |    sum(y)::DOUBLE / count(*) m,
      |    CASE WHEN count(*) <= 1 THEN 0.0::DOUBLE
      |         ELSE (sum(y)::DOUBLE / count(*)) * (1 - sum(y)::DOUBLE / count(*))
      |           * count(*) / (count(*) - 1.0) END s2
      |  FROM pu GROUP BY 1, 2),
      |j AS (
      |  SELECT
      |    a0.n n_a0, a0.m m_a0, a0.s2 s2_a0, a1.n n_a1, a1.m m_a1, a1.s2 s2_a1,
      |    b0.n n_b0, b0.m m_b0, b0.s2 s2_b0, b1.n n_b1, b1.m m_b1, b1.s2 s2_b1
      |  FROM (SELECT * FROM cells WHERE v = 'A' AND period = 'pre') a0
      |  CROSS JOIN (SELECT * FROM cells WHERE v = 'A' AND period = 'post') a1
      |  CROSS JOIN (SELECT * FROM cells WHERE v = 'B' AND period = 'pre') b0
      |  CROSS JOIN (SELECT * FROM cells WHERE v = 'B' AND period = 'post') b1)
      |SELECT round(m_a0, 6) AS mean_a_pre, round(m_a1, 6) AS mean_a_post,
      |  round(m_b0, 6) AS mean_b_pre, round(m_b1, 6) AS mean_b_post,
      |  round((m_b1 - m_b0) - (m_a1 - m_a0), 6) AS did,
      |  round(sqrt(s2_a0/n_a0 + s2_a1/n_a1 + s2_b0/n_b0 + s2_b1/n_b1), 6) AS se,
      |  round(((m_b1 - m_b0) - (m_a1 - m_a0))
      |    / nullif(sqrt(s2_a0/n_a0 + s2_a1/n_a1 + s2_b0/n_b0 + s2_b1/n_b1), 0.0), 4)
      |    AS t_stat
      |FROM j""".stripMargin

  /** Two-sided α and power the sizing readout targets: the fixed
    * Φ⁻¹(0.975) and Φ⁻¹(0.8) constants (both engines use the same
    * literals — no normal-quantile function dependency). */
  private val PowerZAlpha = 1.959963984540054
  private val PowerZBeta = 0.8416212335729143
  private val PowerMdeRel = 0.1

  /** A/B sample-size / duration readout (the standard two-proportion
    * power calculation, Fleiss et al., "Statistical Methods for Rates
    * and Proportions" — public textbook formula): measure the corpus's
    * baseline user conversion rate, target a [[PowerMdeRel]] relative
    * lift at α=0.05 two-sided and 80% power, and report the required
    * per-arm/total sample plus how many days the observed daily unique
    * user volume takes to reach it — the pre-experiment feasibility
    * check a platform runs BEFORE assigning anyone.
    *
    * Scale shape: two map-side-combinable aggregations over one events
    * table (per-user conversion; per-day distinct users) collapsing to
    * one row each; the quantile constants are literals, so the whole
    * formula is exact double arithmetic on the 1-row frame. */
  def qPowerAnalysis(s: SparkSession, d: String): DataFrame = {
    // unit of analysis: (user, day) — the per-exposure-day conversion a
    // daily-assignment experiment powers on (lifetime per-user
    // conversion saturates at 1.0 on a long-window corpus, which would
    // make any relative MDE degenerate)
    val perUser = Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max((col("event_type") === "purchase").cast("int")).as("converted"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("converted")).cast("long").as("n_conv"))
    val daily = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("du"))
      .agg(avg(col("du")).as("daily_users"))
    perUser.crossJoin(daily)
      .withColumn("p1", col("n_conv").cast("double") / col("n_units"))
      .withColumn("p2", col("p1") * (1.0 + PowerMdeRel))
      .withColumn("pbar", (col("p1") + col("p2")) / 2.0)
      .withColumn("n_arm", ceil(
        pow(lit(PowerZAlpha) * sqrt(lit(2.0) * col("pbar") * (lit(1.0) - col("pbar"))) +
          lit(PowerZBeta) * sqrt(col("p1") * (lit(1.0) - col("p1")) +
            col("p2") * (lit(1.0) - col("p2"))), 2.0) /
          pow(col("p2") - col("p1"), 2.0)))
      .select(
        col("n_units"), round(col("p1"), 6).as("base_rate"),
        lit(PowerMdeRel).as("mde_rel"),
        round(col("p2") - col("p1"), 6).as("mde_abs"),
        col("n_arm").cast("long").as("n_per_arm"),
        (col("n_arm") * 2).cast("long").as("n_total"),
        round(col("daily_users"), 2).as("daily_users"),
        ceil(col("n_arm") * 2 / col("daily_users")).cast("long").as("days_to_run"))
  }

  val qPowerAnalysisSql: String =
    s"""WITH pu AS (
       |  SELECT user_id, ts::DATE dy,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) converted
       |  FROM events GROUP BY 1, 2),
       |base AS (SELECT count(*) n_units, sum(converted)::BIGINT n_conv FROM pu),
       |daily AS (
       |  SELECT avg(du) daily_users FROM (
       |    SELECT count(DISTINCT user_id) du FROM events GROUP BY ts::DATE)),
       |f AS (
       |  SELECT n_units, n_conv, daily_users,
       |    n_conv::DOUBLE / n_units p1,
       |    n_conv::DOUBLE / n_units * ${1.0 + PowerMdeRel} p2
       |  FROM base CROSS JOIN daily),
       |g AS (
       |  SELECT *, (p1 + p2) / 2.0 pbar,
       |    ceil(power($PowerZAlpha * sqrt(2.0 * (p1 + p2) / 2.0 * (1.0 - (p1 + p2) / 2.0))
       |         + $PowerZBeta * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2.0)
       |      / power(p2 - p1, 2.0)) n_arm
       |  FROM f)
       |SELECT n_units, round(p1, 6) AS base_rate,
       |  $PowerMdeRel::DOUBLE AS mde_rel,
       |  round(p2 - p1, 6) AS mde_abs,
       |  n_arm::BIGINT AS n_per_arm, (n_arm * 2)::BIGINT AS n_total,
       |  round(daily_users, 2) AS daily_users,
       |  ceil(n_arm * 2 / daily_users)::BIGINT AS days_to_run
       |FROM g""".stripMargin

  /** Cohort LTV triangle — the VALUE companion to [[qRetention]]'s
    * count triangle (the standard cumulative-revenue-per-user-by-age
    * artifact finance reads growth off; e.g. Fader & Hardie's CLV
    * curriculum — public). Users cohort by first-seen day; each
    * cohort-age cell carries that day's purchase revenue and the
    * cumulative revenue per cohort member — the curve whose plateau IS
    * the cohort's realized LTV. The grid is DENSE (every age from 0 to
    * the cohort's observable horizon), so cells with no purchases
    * report 0 revenue and a flat cumulative — the shape a triangle
    * chart needs.
    *
    * Scale shape: one user-keyed agg (cohort assignment), one
    * (cohort, age) revenue agg — both map-side combinable over the
    * events scan; the dense grid and the cumulative window live on the
    * calendar²-bounded triangle frame, never on events. */
  def qCohortLtv(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      to_date(col("ts")).as("obs_day"), col("event_type"), col("value"))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("obs_day")).as("cohort_day"))
    val sizes = cohorts.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_users"))
    val endDay = ev.agg(max(col("obs_day")).as("end_day"))
    val rev = ev.filter(col("event_type") === "purchase")
      .join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("obs_day"), col("cohort_day")).as("age"))
      .agg(sum(col("value")).as("rev"))
    val grid = sizes.crossJoin(broadcast(endDay))
      .select(col("cohort_day"), col("n_users"),
        explode(sequence(lit(0),
          datediff(col("end_day"), col("cohort_day")))).as("age"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(rev, Seq("cohort_day", "age"), "left")
      .select(col("cohort_day"), col("age"), col("n_users"),
        round(coalesce(col("rev"), lit(0.0)), 2).as("rev"),
        round(sum(coalesce(col("rev"), lit(0.0))).over(w) / col("n_users"), 4)
          .as("cum_rev_per_user"))
      .orderBy(col("cohort_day"), col("age"))
  }

  val qCohortLtvSql: String =
    """WITH ev AS (
      |  SELECT user_id, ts::DATE obs_day, event_type, value FROM events),
      |cohorts AS (SELECT user_id, min(obs_day) cohort_day FROM ev GROUP BY 1),
      |sizes AS (SELECT cohort_day, count(*) n_users FROM cohorts GROUP BY 1),
      |endd AS (SELECT max(obs_day) end_day FROM ev),
      |rev AS (
      |  SELECT cohort_day, datediff('day', cohort_day, obs_day) age,
      |    sum(value) rv
      |  FROM ev JOIN cohorts USING (user_id)
      |  WHERE event_type = 'purchase' GROUP BY 1, 2),
      |grid AS (
      |  SELECT cohort_day, n_users, unnest(range(
      |    datediff('day', cohort_day, (SELECT end_day FROM endd)) + 1)) age
      |  FROM sizes)
      |SELECT cohort_day, age::INT AS age, n_users::BIGINT AS n_users,
      |  round(coalesce(rv, 0.0), 2) AS rev,
      |  round(sum(coalesce(rv, 0.0)) OVER (PARTITION BY cohort_day
      |    ORDER BY age ROWS UNBOUNDED PRECEDING) / n_users, 4)
      |    AS cum_rev_per_user
      |FROM grid LEFT JOIN rev USING (cohort_day, age)
      |ORDER BY cohort_day, age""".stripMargin

  /** Kaplan–Meier time-to-conversion curve (Kaplan & Meier 1958,
    * "Nonparametric estimation from incomplete observations", JASA —
    * public; THE time-to-event estimator). Retention tables
    * ([[qRetention]]) bin by calendar cohort; the KM curve answers the
    * duration question — "what fraction of users have NOT yet converted
    * after t days?" — while handling the observation window correctly:
    * a user who hasn't purchased by their last observed day hasn't
    * "not converted", they're RIGHT-CENSORED at their observed span,
    * and dropping or failure-marking them both bias the curve (the
    * mistake KM exists to fix). Event time = days from first event to
    * FIRST purchase; censor time = days from first to last event.
    * S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over conversion times, nᵢ counting
    * BOTH converters and censored users still at risk. Output: one row
    * per conversion duration with the risk set, events, same-duration
    * censorings, and the survival estimate.
    *
    * Scale shape: ONE user-keyed agg (three conditional day mins —
    * map-side combinable) over the events scan; the curve lives on the
    * duration-bounded frame (≤ observation-window days). The product
    * runs as exp(Σ ln) under a window, with the min-term guard emitting
    * an exact 0 if a duration exhausts the risk set (ln(0) never
    * evaluates). */
  def qKaplanMeier(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("obs_day"),
        col("event_type"))
    val spans = ev.groupBy(col("user_id"))
      .agg(min(col("obs_day")).as("first_day"),
        max(col("obs_day")).as("last_day"),
        min(when(col("event_type") === "purchase", col("obs_day")))
          .as("conv_day"))
      .select(
        when(col("conv_day").isNotNull,
          datediff(col("conv_day"), col("first_day")))
          .otherwise(datediff(col("last_day"), col("first_day")))
          .as("t_days"),
        col("conv_day").isNotNull.cast("int").as("churned"))
    val byT = spans.groupBy(col("t_days"))
      .agg(sum(col("churned")).as("d"),
        (count(lit(1)) - sum(col("churned"))).as("c"))
    // risk set at t = users whose span is >= t (descending suffix sum)
    val wRisk = Window.orderBy(col("t_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", sum(col("d") + col("c")).over(wRisk))
      .filter(col("d") > 0)
      .withColumn("term",
        lit(1.0) - col("d").cast("double") / col("n_risk"))
      .select(col("t_days"), col("n_risk"), col("d").as("n_events"),
        col("c").as("n_censored"),
        when(min(col("term")).over(wCum) === 0.0, lit(0.0))
          .otherwise(round(exp(sum(log(col("term"))).over(wCum)), 6))
          .as("survival"))
      .orderBy(col("t_days"))
  }

  val qKaplanMeierSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, ts::DATE obs_day, event_type FROM events),
       |pu AS (
       |  SELECT user_id, min(obs_day) first_day, max(obs_day) last_day,
       |    min(CASE WHEN event_type = 'purchase' THEN obs_day END) conv_day
       |  FROM ev GROUP BY 1),
       |spans AS (
       |  SELECT CASE WHEN conv_day IS NOT NULL
       |              THEN datediff('day', first_day, conv_day)
       |              ELSE datediff('day', first_day, last_day) END t_days,
       |    CASE WHEN conv_day IS NOT NULL THEN 1 ELSE 0 END churned
       |  FROM pu),
       |byt AS (
       |  SELECT t_days, sum(churned) d, count(*) - sum(churned) c
       |  FROM spans GROUP BY 1),
       |risk AS (
       |  SELECT *, sum(d + c) OVER (ORDER BY t_days DESC
       |    ROWS UNBOUNDED PRECEDING) n_risk
       |  FROM byt),
       |ev_t AS (
       |  SELECT t_days, n_risk, d, c, 1.0 - d / n_risk::DOUBLE term
       |  FROM risk WHERE d > 0)
       |SELECT t_days, n_risk::BIGINT AS n_risk, d::BIGINT AS n_events,
       |  c::BIGINT AS n_censored,
       |  -- nullif keeps ln off the exhausted-risk-set row: DuckDB
       |  -- evaluates window args eagerly even under the CASE guard
       |  CASE WHEN min(term) OVER w = 0.0 THEN 0.0
       |       ELSE round(exp(sum(ln(nullif(term, 0.0))) OVER w), 6)
       |       END AS survival
       |FROM ev_t
       |WINDOW w AS (ORDER BY t_days ROWS UNBOUNDED PRECEDING)
       |ORDER BY t_days""".stripMargin

  /** mSPRT mixture scale (on the rate-difference scale) and test level. */
  private val MsprtTau = 0.05
  private val MsprtAlpha = 0.05

  /** Always-valid sequential A/B readout — the mixture SPRT (Johari,
    * Koomen, Pekelis & Walsh 2017, "Peeking at A/B Tests: Why it
    * matters, and what to do about it", KDD; Robbins 1970 mixture
    * martingale — public). [[qAbLift]] is the fixed-horizon readout; in
    * practice analysts PEEK daily and stop on the first significant
    * day, which inflates the fixed-horizon false-positive rate several
    * fold. The mSPRT's always-valid p-value is the running minimum of
    * 1/Λ_t where Λ_t is the normal mixture likelihood ratio
    *   ln Λ_t = ½·ln(V_t/(V_t+τ²)) + θ̂_t²·τ²/(2·V_t·(V_t+τ²)),
    * θ̂_t = cumulative rate difference, V_t = pooled binomial variance
    * of the difference — valid at EVERY day simultaneously, so stopping
    * on first significance keeps level α. Output: one row per calendar
    * day with cumulative arm counts, θ̂, the always-valid p, and the
    * significance flag (on a null-effect hash assignment the flag
    * staying false IS the method working).
    *
    * Scale shape: ONE user-keyed agg over the events scan (first-seen
    * and first-conversion days per user — map-side combinable mins);
    * everything after lives on the days×variants frame, which is
    * calendar-bounded, not corpus-bounded. The windows (cumsums, the
    * running min) order by day over that tiny frame. V_t = 0 days
    * (no users, or p̂ ∈ {0,1}) emit ln Λ = 0 → p = 1 by the explicit
    * guard, so ANSI division never fires. */
  def qMsprt(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      to_date(col("ts")).as("obs_day"), col("event_type"))
    val variant = when(
      conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 2 === 0, "A").otherwise("B")
    val perUser = ev.groupBy(col("user_id"))
      .agg(min(col("obs_day")).as("first_day"),
        min(when(col("event_type") === "purchase", col("obs_day"))).as("conv_day"))
      .withColumn("variant", variant)
    val spine = ev.select(col("obs_day")).distinct()
    val newu = perUser.groupBy(col("variant"), col("first_day").as("obs_day"))
      .agg(count(lit(1)).as("nu"))
    val newc = perUser.filter(col("conv_day").isNotNull)
      .groupBy(col("variant"), col("conv_day").as("obs_day"))
      .agg(count(lit(1)).as("nc"))
    msprtCurve(newu, newc, spine)
  }

  /** The mSPRT curve from DELTA relations — newu/newc carry per-(arm,
    * day) first-seen and first-conversion counts, spine the observation
    * days. Factored so the batch query and the streaming monitor
    * ([[graft.streaming.EventStream.msprtReport]], whose marks relation
    * aggregates to exactly these deltas) score through one code path. */
  private[graft] def msprtCurve(newu: DataFrame, newc: DataFrame,
      spine: DataFrame): DataFrame = {
    val tau2 = MsprtTau * MsprtTau
    val grid = spine.crossJoin(
      spine.sparkSession.range(0, 2).select(
        when(col("id") === 0, "A").otherwise("B").as("variant")))
    val w = Window.partitionBy(col("variant")).orderBy(col("obs_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .join(newu, Seq("variant", "obs_day"), "left")
      .join(newc, Seq("variant", "obs_day"), "left")
      .select(col("variant"), col("obs_day"),
        sum(coalesce(col("nu"), lit(0L))).over(w).as("n"),
        sum(coalesce(col("nc"), lit(0L))).over(w).as("conv"))
    val byDay = cum.filter(col("variant") === "A")
      .select(col("obs_day"), col("n").as("n_a"), col("conv").as("conv_a"))
      .join(cum.filter(col("variant") === "B")
        .select(col("obs_day"), col("n").as("n_b"), col("conv").as("conv_b")),
        Seq("obs_day"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val scored = byDay
      .withColumn("theta",
        when(col("n_a") > 0 && col("n_b") > 0, pb - pa).otherwise(lit(0.0)))
      .withColumn("v",
        when(col("n_a") > 0 && col("n_b") > 0,
          pooled * (lit(1.0) - pooled) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
          .otherwise(lit(0.0)))
      .withColumn("lnlam",
        when(col("v") > 0,
          lit(0.5) * log(col("v") / (col("v") + lit(tau2))) +
            col("theta") * col("theta") * lit(tau2) /
              (lit(2.0) * col("v") * (col("v") + lit(tau2))))
          .otherwise(lit(0.0)))
      .withColumn("p_day", least(lit(1.0), exp(-col("lnlam"))))
    val wMin = Window.orderBy(col("obs_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .select(col("obs_day"), col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(col("theta"), 6).as("theta"),
        round(min(col("p_day")).over(wMin), 6).as("p_always"))
      .withColumn("significant", col("p_always") <= MsprtAlpha)
      .orderBy(col("obs_day"))
  }

  val qMsprtSql: String = {
    val tau2 = MsprtTau * MsprtTau
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::INTEGER % 2 = 0
       |         THEN 'A' ELSE 'B' END variant,
       |    min(ts::DATE) first_day,
       |    min(CASE WHEN event_type = 'purchase' THEN ts::DATE END) conv_day
       |  FROM events GROUP BY 1, 2),
       |spine AS (SELECT DISTINCT ts::DATE obs_day FROM events),
       |grid AS (SELECT obs_day, variant FROM spine
       |  CROSS JOIN (SELECT 'A' variant UNION ALL SELECT 'B')),
       |newu AS (SELECT variant, first_day obs_day, count(*) nu FROM pu GROUP BY 1, 2),
       |newc AS (SELECT variant, conv_day obs_day, count(*) nc FROM pu
       |  WHERE conv_day IS NOT NULL GROUP BY 1, 2),
       |cum AS (
       |  SELECT g.variant, g.obs_day,
       |    sum(coalesce(nu, 0)) OVER w n, sum(coalesce(nc, 0)) OVER w conv
       |  FROM grid g
       |  LEFT JOIN newu ON g.variant = newu.variant AND g.obs_day = newu.obs_day
       |  LEFT JOIN newc ON g.variant = newc.variant AND g.obs_day = newc.obs_day
       |  WINDOW w AS (PARTITION BY g.variant ORDER BY g.obs_day
       |    ROWS UNBOUNDED PRECEDING)),
       |byday AS (
       |  SELECT a.obs_day, a.n n_a, a.conv conv_a, b.n n_b, b.conv conv_b
       |  FROM (SELECT * FROM cum WHERE variant = 'A') a
       |  JOIN (SELECT * FROM cum WHERE variant = 'B') b USING (obs_day)),
       |sc AS (
       |  SELECT *,
       |    CASE WHEN n_a > 0 AND n_b > 0
       |         THEN conv_b / n_b::DOUBLE - conv_a / n_a::DOUBLE
       |         ELSE 0.0 END theta,
       |    CASE WHEN n_a > 0 AND n_b > 0
       |         THEN (conv_a + conv_b) / (n_a + n_b)::DOUBLE
       |           * (1.0 - (conv_a + conv_b) / (n_a + n_b)::DOUBLE)
       |           * (1.0 / n_a + 1.0 / n_b)
       |         ELSE 0.0 END v
       |  FROM byday),
       |lam AS (
       |  SELECT *, CASE WHEN v > 0
       |    THEN 0.5 * ln(v / (v + $tau2))
       |       + theta * theta * $tau2 / (2.0 * v * (v + $tau2))
       |    ELSE 0.0 END lnlam
       |  FROM sc)
       |SELECT obs_day, n_a::BIGINT AS n_a, conv_a::BIGINT AS conv_a,
       |  n_b::BIGINT AS n_b, conv_b::BIGINT AS conv_b,
       |  round(theta, 6) AS theta,
       |  round(min(least(1.0, exp(-lnlam))) OVER
       |    (ORDER BY obs_day ROWS UNBOUNDED PRECEDING), 6) AS p_always,
       |  round(min(least(1.0, exp(-lnlam))) OVER
       |    (ORDER BY obs_day ROWS UNBOUNDED PRECEDING), 6) <= $MsprtAlpha AS significant
       |FROM lam ORDER BY obs_day""".stripMargin
  }

  /** GSP max-gap window (hours) and the minimum user-support fraction. */
  private val GspGapHours = 4
  private val GspMinSup = 0.1

  /** Sequential pattern mining with a max-gap constraint (Srikant &
    * Agrawal 1996, "Mining Sequential Patterns: Generalizations and
    * Performance Improvements", EDBT — GSP; public). [[qTopPaths]]
    * counts CONTIGUOUS trigrams and [[qAssocRules]] ignores order
    * entirely; GSP mines the middle ground a journey analyst actually
    * asks for: "which ordered behaviors recur across users, allowing
    * other events in between but within a time budget?" A pattern
    * a→b→c is supported by a user iff events of those types occur in
    * order with EACH consecutive gap ≤ 4 h (the paper's max-gap
    * constraint — without it, on long event streams every pattern's
    * support saturates at 100% and the mining is vacuous; measured on
    * this corpus: unconstrained support ≈ 1.0 everywhere, gapped L3
    * support spreads 0.03–0.11). Support = DISTINCT users (exists
    * semantics), levels 1–3, one minsup across levels, Apriori
    * candidate pruning between levels (level k only extends surviving
    * level k−1 prefixes).
    *
    * Scale shape: the only corpus-sized exchange is ONE repartition of
    * events by user_id — both self-joins are user-keyed equi-joins, so
    * they co-locate on that single shuffle; per-user fan-out is bounded
    * by events-per-user × events-within-gap (a session-bounded
    * constant, not a corpus dimension). Surviving prefixes join back
    * as BROADCAST semi-joins (pattern space ≤ |types|^3, tiny by
    * construction); the distinct-user counts are map-side combinable.
    * Completion end-points dedup to (user, prefix, end-event) BEFORE
    * the next extension so a user's k occurrences of a prefix don't
    * multiply the next level's probe k-fold. */
  def qGsp(s: SparkSession, d: String): DataFrame = {
    // NOT spread (r16, measured negative): hashing events by user_id to
    // parallelize the single-split self-join looked like the §2.5 kernel
    // spread, but min-of-5 idle benches read 3.06 s against the 2.19 s
    // baseline — 26 → 338 tasks of scheduling for sub-second compute.
    // At real scale the events scan is many splits and the join
    // parallelizes by itself.
    val e = Tables.events(s, d)
      .select(col("user_id").as("u"), col("event_type").as("t"),
        col("ts"), col("event_id").as("eid"))
    val nUsers = e.agg(countDistinct(col("u")).as("n_users"))
    def afterWithinGap(aTs: Column, aEid: Column, bTs: Column, bEid: Column)
        : Column =
      (bTs > aTs || (bTs === aTs && bEid > aEid)) &&
        bTs <= aTs + expr(s"INTERVAL $GspGapHours HOURS")
    def frequent(sup: DataFrame): DataFrame = sup
      .crossJoin(broadcast(nUsers))
      .filter(col("sup") >= col("n_users") * lit(GspMinSup))
    val l1 = frequent(
      e.groupBy(col("t")).agg(countDistinct(col("u")).as("sup")))
      .select(col("t").as("p1"), col("sup"), col("n_users"))
    // level-2 completions: every (user, p1, p2, end-event) with the pair
    // in order within the gap, p1 restricted to surviving level-1 types
    val a = e.select(col("u"), col("t").as("p1"),
      col("ts").as("ts1"), col("eid").as("eid1"))
      .join(broadcast(l1.select(col("p1"))), Seq("p1"), "left_semi")
    val ab = a.join(
      e.select(col("u"), col("t").as("p2"),
        col("ts").as("ts2"), col("eid").as("eid2")), Seq("u"))
      .filter(afterWithinGap(col("ts1"), col("eid1"), col("ts2"), col("eid2")))
      .select(col("u"), col("p1"), col("p2"), col("ts2"), col("eid2"))
      .distinct()
      // materialized once (r15): the level-2 support agg, the level-3
      // extension AND the output union all consume this self-join —
      // column pruning made their subtrees differ, so exchange reuse
      // never fired and the plan re-ran the user-pair join per consumer
      // (36 parquet scans / 0 ReusedExchange in the before plan)
      .localCheckpoint()
    val l2 = frequent(ab.groupBy(col("p1"), col("p2"))
      .agg(countDistinct(col("u")).as("sup")))
    val l3 = frequent(
      ab.join(broadcast(l2.select(col("p1"), col("p2"))),
          Seq("p1", "p2"), "left_semi")
        .join(e.select(col("u"), col("t").as("p3"),
          col("ts").as("ts3"), col("eid").as("eid3")), Seq("u"))
        .filter(afterWithinGap(col("ts2"), col("eid2"), col("ts3"), col("eid3")))
        .groupBy(col("p1"), col("p2"), col("p3"))
        .agg(countDistinct(col("u")).as("sup")))
    def shape(df: DataFrame, level: Int, cols: Column*): DataFrame = {
      val ps: Seq[Column] =
        cols ++ Seq.fill(3 - cols.length)(lit(null).cast("string"))
      val named = ps.zipWithIndex.map { case (c, i) => c.as(s"p${i + 1}") }
      df.select((lit(level).as("level") +: named) ++ Seq(
        col("sup").as("n_users_sup"),
        round(col("sup") / col("n_users"), 4).as("support")): _*)
    }
    shape(l1, 1, col("p1"))
      .unionAll(shape(l2, 2, col("p1"), col("p2")))
      .unionAll(shape(l3, 3, col("p1"), col("p2"), col("p3")))
      .orderBy(col("level"), col("p1"), col("p2"), col("p3"))
  }

  val qGspSql: String =
    s"""WITH e AS (
       |  SELECT user_id u, event_type t, ts, event_id eid FROM events),
       |nu AS (SELECT count(DISTINCT u) n_users FROM e),
       |l1 AS (
       |  SELECT t p1, count(DISTINCT u) sup FROM e GROUP BY 1
       |  HAVING count(DISTINCT u) >= (SELECT n_users FROM nu) * $GspMinSup),
       |ab AS (
       |  SELECT DISTINCT a.u, a.t p1, b.t p2, b.ts ts2, b.eid eid2
       |  FROM e a JOIN e b ON a.u = b.u
       |    AND (b.ts > a.ts OR (b.ts = a.ts AND b.eid > a.eid))
       |    AND b.ts <= a.ts + INTERVAL $GspGapHours HOUR
       |  WHERE a.t IN (SELECT p1 FROM l1)),
       |l2 AS (
       |  SELECT p1, p2, count(DISTINCT u) sup FROM ab GROUP BY 1, 2
       |  HAVING count(DISTINCT u) >= (SELECT n_users FROM nu) * $GspMinSup),
       |l3 AS (
       |  SELECT ab.p1, ab.p2, c.t p3, count(DISTINCT ab.u) sup
       |  FROM ab
       |  JOIN l2 ON ab.p1 = l2.p1 AND ab.p2 = l2.p2
       |  JOIN e c ON ab.u = c.u
       |    AND (c.ts > ab.ts2 OR (c.ts = ab.ts2 AND c.eid > ab.eid2))
       |    AND c.ts <= ab.ts2 + INTERVAL $GspGapHours HOUR
       |  GROUP BY 1, 2, 3
       |  HAVING count(DISTINCT ab.u) >= (SELECT n_users FROM nu) * $GspMinSup)
       |SELECT 1 AS level, p1, NULL AS p2, NULL AS p3, sup::BIGINT AS n_users_sup,
       |  round(sup / (SELECT n_users FROM nu)::DOUBLE, 4) AS support FROM l1
       |UNION ALL
       |SELECT 2, p1, p2, NULL, sup::BIGINT,
       |  round(sup / (SELECT n_users FROM nu)::DOUBLE, 4) FROM l2
       |UNION ALL
       |SELECT 3, p1, p2, p3, sup::BIGINT,
       |  round(sup / (SELECT n_users FROM nu)::DOUBLE, 4) FROM l3
       |ORDER BY level, p1, p2, p3""".stripMargin

  /** Bandit replay: arms, contexts, and the synthetic logged-reward
    * model. The events table is recast as a uniformly-logged
    * contextual-bandit log: arm = md5(event_id) mod [[BanditArms]]
    * (uniform logging — the condition the replay estimator needs),
    * context = 4-hour bucket, and the logged reward is a deterministic
    * Bernoulli whose rate depends on (context, arm) through md5
    * uniforms — so a real best arm exists per context and both engines
    * derive the identical log. */
  private val BanditArms = 4

  /** The shared synthetic-log reward model + split: given a frame with
    * (event_id, ctx, arm), stamp the (ctx, arm)-dependent Bernoulli
    * reward and the 80/20 split — ONE definition so the replay and IPS
    * estimators can never disagree about the log they both read. */
  private def banditAnnotate(base: DataFrame): DataFrame = base
    .withColumn("rate_pct", lit(3) +
      when((col("arm") + col("ctx")) % BanditArms === 0, lit(7))
        .otherwise(lit(0)))
    .withColumn("r", (conv(substring(md5(
      concat(col("event_id").cast("string"), lit(":"),
        col("arm").cast("string"))), 1, 6), 16, 10)
      .cast("int") % 100 < col("rate_pct")).cast("int"))
    .withColumn("is_train", pmod(col("event_id"), lit(5)) < 4)

  /** The shared train-split policy fit: per-context best arm by
    * rounded empirical CTR, arm-ascending tiebreak. */
  private def banditFit(log: DataFrame): DataFrame = log
    .filter(col("is_train"))
    .groupBy(col("ctx"), col("arm"))
    .agg((sum(col("r")).cast("double") / count(lit(1))).as("ctr"))
    .withColumn("rk", row_number().over(Window.partitionBy(col("ctx"))
      .orderBy(round(col("ctr"), 6).desc, col("arm"))))
    .filter(col("rk") === 1)
    .select(col("ctx"), col("arm").as("chosen_arm"))

  /** The SQL twin of [[banditAnnotate]]+[[banditFit]]: the reward /
    * split / fit CTE chain appended after a `log1` CTE that provides
    * (event_id, ctx, arm[, p_log]). */
  private def banditSqlCommon: String =
    """log2 AS (
      |  SELECT *, 3 + CASE WHEN (arm + ctx) % 4 = 0 THEN 7 ELSE 0 END AS rate_pct,
      |    event_id % 5 < 4 AS is_train
      |  FROM log1),
      |log3 AS (
      |  SELECT *, CASE WHEN ('0x' || substr(md5(event_id::VARCHAR || ':' ||
      |      arm::VARCHAR), 1, 6))::INT % 100 < rate_pct
      |    THEN 1 ELSE 0 END AS r
      |  FROM log2),
      |fit AS (
      |  SELECT ctx, arm AS chosen_arm FROM (
      |    SELECT ctx, arm,
      |      row_number() OVER (PARTITION BY ctx
      |        ORDER BY round(sum(r)::DOUBLE / count(*), 6) DESC, arm) rk
      |    FROM log3 WHERE is_train GROUP BY ctx, arm)
      |  WHERE rk = 1)""".stripMargin
  // NB banditSqlCommon interpolates into outer stripMargin templates —
  // no line may BEGIN with whitespace + '||' (the double-strip gotcha)

  /** Offline bandit policy evaluation by replay (Li, Chu, Langford &
    * Wang, WSDM 2011, "Unbiased Offline Evaluation of
    * Contextual-bandit-based News Article Recommendation Algorithms" —
    * the replay estimator, public paper): learn the per-context best
    * arm on the 80% train split's click-through rates, then score the
    * held-out 20% by keeping ONLY the events where the uniformly-logged
    * arm happens to match the policy's choice — the mean reward over
    * those matches is an unbiased estimate of the policy's online CTR,
    * the readout that lets a platform rank policies WITHOUT serving
    * them. Output per context: the chosen arm, match counts, the
    * replay estimate, and the logging baseline it must beat.
    *
    * Scale shape: two events scans (train fit, eval replay), each one
    * map-side-combinable aggregate; the policy table is contexts×arms
    * = 24 rows, broadcast; no shuffle wider than the (ctx, arm) cells.
    */
  def qBanditReplay(s: SparkSession, d: String): DataFrame = {
    val K = BanditArms
    val log = banditAnnotate(Tables.events(s, d).select(
      col("event_id"),
      (hour(col("ts")).cast("int") / lit(4)).cast("int").as("ctx"),
      (conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % K).as("arm")))
    log.filter(!col("is_train"))
      .join(broadcast(banditFit(log)), "ctx")
      .groupBy(col("ctx"), col("chosen_arm"))
      .agg(
        count(lit(1)).as("n_eval"),
        sum((col("arm") === col("chosen_arm")).cast("int")).cast("long")
          .as("n_matched"),
        round(sum(when(col("arm") === col("chosen_arm"), col("r"))
          .otherwise(lit(0))).cast("double") /
          nullif(sum((col("arm") === col("chosen_arm")).cast("int"))
            .cast("double"), lit(0.0)), 6).as("est_ctr"),
        round(avg(col("r")), 6).as("baseline_ctr"))
      .orderBy(col("ctx"))
  }

  val qBanditReplaySql: String =
    s"""WITH log1 AS (
      |  SELECT event_id, (hour(ts)::INT // 4)::INT AS ctx,
      |    (('0x' || substr(md5(event_id::VARCHAR), 1, 4))::INT % 4) AS arm
      |  FROM events),
      |$banditSqlCommon
      |SELECT ctx, chosen_arm, count(*)::BIGINT AS n_eval,
      |  sum(CASE WHEN arm = chosen_arm THEN 1 ELSE 0 END)::BIGINT
      |    AS n_matched,
      |  round(sum(CASE WHEN arm = chosen_arm THEN r ELSE 0 END)::DOUBLE
      |    / nullif(sum(CASE WHEN arm = chosen_arm THEN 1 ELSE 0 END), 0),
      |    6) AS est_ctr,
      |  round(avg(r), 6) AS baseline_ctr
      |FROM log3 JOIN fit USING (ctx)
      |WHERE NOT is_train
      |GROUP BY ctx, chosen_arm
      |ORDER BY ctx""".stripMargin

  /** Off-policy evaluation under NON-uniform logging — the regime
    * [[qBanditReplay]]'s estimator cannot handle (replay needs uniform
    * logging; production logs come from whatever policy ran last).
    * Importance-weighted estimators (Horvitz & Thompson 1952; SNIPS:
    * Swaminathan & Joachims, NeurIPS 2015, "The Self-Normalized
    * Estimator for Counterfactual Learning" — public papers): the
    * logged arm is drawn from a SKEWED distribution (10/20/30/40%) via
    * md5 uniforms, the target policy is fit on the train split, and
    * each matched eval event carries weight 1/p(logged arm):
    *
    *  - IPS = mean(w·r·match) — unbiased, high variance where the
    *    target disagrees with the logger;
    *  - SNIPS = Σ(w·r·match)/Σ(w·match) — the self-normalized form
    *    that trades a vanishing bias for much lower variance;
    *  - ESS = (Σw)²/Σw² over matched events — the effective-sample
    *    diagnostic a platform checks before trusting either number.
    *
    * Scale shape: identical to [[qBanditReplay]] — two scans, one
    * 24-row broadcast policy, every aggregate map-side combinable. */
  def qOffpolicyIps(s: SparkSession, d: String): DataFrame = {
    // skewed logging: P(arm 0..3) = .1/.2/.3/.4 via one md5 uniform
    val u = conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
      .cast("int") % 100
    val arm = when(u < 10, 0).when(u < 30, 1).when(u < 60, 2).otherwise(3)
    val prop = when(col("arm") === 0, 0.10).when(col("arm") === 1, 0.20)
      .when(col("arm") === 2, 0.30).otherwise(0.40)
    val log = banditAnnotate(Tables.events(s, d).select(
      col("event_id"),
      (hour(col("ts")).cast("int") / lit(4)).cast("int").as("ctx"),
      arm.as("arm"))
      .withColumn("p_log", prop))
    log.filter(!col("is_train"))
      .join(broadcast(banditFit(log)), "ctx")
      .withColumn("m", (col("arm") === col("chosen_arm")).cast("int"))
      .withColumn("w", col("m") / col("p_log"))
      .groupBy(col("ctx"), col("chosen_arm"))
      .agg(
        count(lit(1)).as("n_eval"),
        sum(col("m")).cast("long").as("n_matched"),
        round(sum(col("w") * col("r")) / count(lit(1)), 6).as("ips"),
        round(sum(col("w") * col("r")) /
          nullif(sum(col("w")), lit(0.0)), 6).as("snips"),
        round(pow(sum(col("w")), 2) /
          nullif(sum(col("w") * col("w")), lit(0.0)), 2).as("ess"))
      .orderBy(col("ctx"))
  }

  val qOffpolicyIpsSql: String =
    s"""WITH log0 AS (
      |  SELECT event_id, (hour(ts)::INT // 4)::INT AS ctx,
      |    ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::INT % 100 AS u
      |  FROM events),
      |log1 AS (
      |  SELECT event_id, ctx,
      |    CASE WHEN u < 10 THEN 0 WHEN u < 30 THEN 1
      |         WHEN u < 60 THEN 2 ELSE 3 END AS arm,
      |    CASE WHEN u < 10 THEN 0.10::DOUBLE WHEN u < 30 THEN 0.20::DOUBLE
      |         WHEN u < 60 THEN 0.30::DOUBLE ELSE 0.40::DOUBLE END AS p_log
      |  FROM log0),
      |$banditSqlCommon,
      |ev AS (
      |  SELECT ctx, chosen_arm, r,
      |    CASE WHEN arm = chosen_arm THEN 1 ELSE 0 END AS m,
      |    CASE WHEN arm = chosen_arm THEN 1.0::DOUBLE / p_log
      |         ELSE 0.0::DOUBLE END AS w
      |  FROM log3 JOIN fit USING (ctx) WHERE NOT is_train)
      |SELECT ctx, chosen_arm, count(*)::BIGINT AS n_eval,
      |  sum(m)::BIGINT AS n_matched,
      |  round(sum(w * r) / count(*), 6) AS ips,
      |  round(sum(w * r) / nullif(sum(w), 0.0), 6) AS snips,
      |  round(pow(sum(w), 2) / nullif(sum(w * w), 0.0), 2) AS ess
      |FROM ev GROUP BY ctx, chosen_arm ORDER BY ctx""".stripMargin

  /** Uplift-by-decile with the Qini curve (Radcliffe 2007, "Using
    * control groups to target on predicted lift" — the standard
    * uplift-model readout, public methodology): rank users by a
    * pre-period activity score, cut into ten tie-aware deciles, and
    * report per decile the treated/control conversion gap plus the
    * cumulative incremental-conversions (Qini) coordinate — the curve
    * a targeting team reads to decide how deep to mail.
    *
    * Decile assignment is the SCALE-SAFE form: no global ntile window
    * (a single-partition sort at any size). The score is an integer, so
    * the full score distribution aggregates to one row per distinct
    * score (≤ max events per user), the running count over that tiny
    * relation broadcasts back, and a tie-block lands wholly in the
    * decile of its first position — floor(10·count_above/N)+1, exact
    * integer arithmetic on both engines. */
  def qQiniUplift(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val variant = when(
      conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 2 === 0, "A").otherwise("B")
    val perUser = Tables.events(s, d)
      .select(col("user_id"), variant.as("v"), col("ts"), col("event_type"))
      .groupBy(col("user_id"), col("v"))
      .agg(
        sum(when(col("ts") < cutoff, 1L).otherwise(0L)).as("score"),
        max(when(col("ts") >= cutoff && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("y"),
        max(when(col("ts") >= cutoff, 1L).otherwise(0L)).as("in_exp"))
      .filter(col("in_exp") === 1L)
    val n = perUser.agg(count(lit(1)).as("n_total"))
    // score-level distribution: one row per distinct integer score
    val dist = perUser.groupBy(col("score")).agg(count(lit(1)).as("cnt"))
      .withColumn("above", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(n))
      .select(col("score"),
        (col("above") * 10 / col("n_total")).cast("int").+(1).as("decile"))
    val byDecile = perUser
      .join(broadcast(dist), "score")
      .groupBy(col("decile"))
      .agg(
        sum(when(col("v") === "B", 1L).otherwise(0L)).as("n_t"),
        sum(when(col("v") === "A", 1L).otherwise(0L)).as("n_c"),
        sum(when(col("v") === "B", col("y")).otherwise(0L)).as("conv_t"),
        sum(when(col("v") === "A", col("y")).otherwise(0L)).as("conv_c"))
    val wc = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byDecile
      .withColumn("uplift", round(
        col("conv_t").cast("double") / nullif(col("n_t").cast("double"), lit(0.0)) -
          col("conv_c").cast("double") / nullif(col("n_c").cast("double"), lit(0.0)), 6))
      .withColumn("qini", round(
        sum(col("conv_t")).over(wc).cast("double") -
          sum(col("conv_c")).over(wc).cast("double") *
            sum(col("n_t")).over(wc) /
            nullif(sum(col("n_c")).over(wc).cast("double"), lit(0.0)), 4))
      .select(col("decile"), col("n_t"), col("n_c"), col("conv_t"),
        col("conv_c"), col("uplift"), col("qini"))
      .orderBy(col("decile"))
  }

  val qQiniUpliftSql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::INTEGER % 2 = 0
      |         THEN 'A' ELSE 'B' END v,
      |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) score,
      |    max(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
      |             AND event_type = 'purchase' THEN 1 ELSE 0 END) y,
      |    max(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) in_exp
      |  FROM events GROUP BY 1, 2),
      |pe AS (SELECT * FROM pu WHERE in_exp = 1),
      |n AS (SELECT count(*) n_total FROM pe),
      |dist AS (
      |  SELECT score,
      |    (coalesce(sum(cnt) OVER (ORDER BY score DESC
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |     * 10 // n_total + 1)::INT AS decile
      |  FROM (SELECT score, count(*) cnt FROM pe GROUP BY 1), n),
      |bd AS (
      |  SELECT decile,
      |    sum(CASE WHEN v = 'B' THEN 1 ELSE 0 END)::BIGINT n_t,
      |    sum(CASE WHEN v = 'A' THEN 1 ELSE 0 END)::BIGINT n_c,
      |    sum(CASE WHEN v = 'B' THEN y ELSE 0 END)::BIGINT conv_t,
      |    sum(CASE WHEN v = 'A' THEN y ELSE 0 END)::BIGINT conv_c
      |  FROM pe JOIN dist USING (score) GROUP BY 1)
      |SELECT decile, n_t, n_c, conv_t, conv_c,
      |  round(conv_t / nullif(n_t::DOUBLE, 0.0)
      |    - conv_c / nullif(n_c::DOUBLE, 0.0), 6) AS uplift,
      |  round(sum(conv_t) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW)::DOUBLE
      |    - sum(conv_c) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
      |        PRECEDING AND CURRENT ROW)::DOUBLE
      |      * sum(n_t) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
      |          PRECEDING AND CURRENT ROW)
      |      / nullif(sum(n_c) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
      |          PRECEDING AND CURRENT ROW)::DOUBLE, 0.0), 4) AS qini
      |FROM bd ORDER BY decile""".stripMargin

  /** DAU/WAU/MAU stickiness — the standard engagement dashboard
    * readout (public industry practice): per calendar day, the day's
    * distinct users next to the containing ISO week's and calendar
    * month's distinct users, plus the DAU/MAU stickiness ratio.
    * Calendar (not trailing) windows deliberately: the trailing-window
    * distinct lives in [[qSlidingReach]]'s sketch cube; calendar
    * windows are exact at three map-side-combinable distinct
    * aggregates of strictly coarser grain.
    *
    * Scale shape: three (period, user) distinct rollups off one scan
    * shape — each shuffles on its period key; the day→week/month joins
    * broadcast (periods are calendar-bounded regardless of volume). */
  def qStickiness(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      to_date(col("ts")).as("day"),
      date_trunc("week", col("ts")).as("wk"),
      date_trunc("month", col("ts")).as("mo"),
      col("user_id"))
    val dau = ev.select(col("day"), col("user_id")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ev.select(col("wk"), col("user_id")).distinct()
      .groupBy(col("wk")).agg(count(lit(1)).as("wau"))
    val mau = ev.select(col("mo"), col("user_id")).distinct()
      .groupBy(col("mo")).agg(count(lit(1)).as("mau"))
    dau
      .withColumn("wk", date_trunc("week", col("day").cast("timestamp")))
      .withColumn("mo", date_trunc("month", col("day").cast("timestamp")))
      .join(broadcast(wau), "wk")
      .join(broadcast(mau), "mo")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"), col("mau"),
        round(col("dau").cast("double") / col("mau"), 4).as("stickiness"))
      .orderBy(col("day"))
  }

  val qStickinessSql: String =
    """WITH ev AS (
      |  SELECT ts::DATE AS day, date_trunc('week', ts) wk,
      |    date_trunc('month', ts) mo, user_id
      |  FROM events),
      |dau AS (SELECT day, count(*) dau FROM (SELECT DISTINCT day, user_id FROM ev) GROUP BY 1),
      |wau AS (SELECT wk, count(*) wau FROM (SELECT DISTINCT wk, user_id FROM ev) GROUP BY 1),
      |mau AS (SELECT mo, count(*) mau FROM (SELECT DISTINCT mo, user_id FROM ev) GROUP BY 1)
      |SELECT strftime(day, '%Y-%m-%d') AS day, dau, wau, mau,
      |  round(dau / mau::DOUBLE, 4) AS stickiness
      |FROM dau
      |JOIN wau ON date_trunc('week', day) = wk
      |JOIN mau ON date_trunc('month', day) = mo
      |ORDER BY day""".stripMargin

  /** Doubly-robust off-policy evaluation (Dudík, Langford & Li, ICML
    * 2011, "Doubly Robust Policy Evaluation and Learning" — public
    * paper): the third leg after [[qBanditReplay]] (uniform logging)
    * and [[qOffpolicyIps]] (importance weighting) — combine the direct
    * model (the train split's per-(ctx, arm) CTR table q̂) with the
    * IPS correction on the model's residual:
    *
    *   DR(event) = q̂(ctx, π(ctx)) + 1[match]/p_log · (r − q̂(ctx, arm))
    *
    * Unbiased when EITHER the model or the propensities are right, and
    * the variance shrinks by the residual ratio — the estimator real
    * evaluation platforms default to. Reported per context next to
    * the pure-DM and pure-IPS numbers it interpolates.
    *
    * Scale shape: the same two scans as the IPS leg plus one 24-row
    * broadcast q̂ table joined twice (logged arm, policy arm). Both q̂
    * joins are LEFT joins with missing cells coalesced to q̂ = 0: an
    * eval event whose logged (ctx, arm) cell never appears in the train
    * split must not be DROPPED (an inner join would bias the eval subset
    * and desync n_eval from [[qOffpolicyIps]]) — with q̂ = 0 the DR
    * contribution degrades gracefully to its IPS term, which is exactly
    * the estimator's contract when the model abstains. Dense cells on
    * this corpus make the branch unreachable here; the guard is for
    * smaller SFs / more arms. */
  def qOffpolicyDr(s: SparkSession, d: String): DataFrame = {
    val u = conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
      .cast("int") % 100
    val arm = when(u < 10, 0).when(u < 30, 1).when(u < 60, 2).otherwise(3)
    val prop = when(col("arm") === 0, 0.10).when(col("arm") === 1, 0.20)
      .when(col("arm") === 2, 0.30).otherwise(0.40)
    val log = banditAnnotate(Tables.events(s, d).select(
      col("event_id"),
      (hour(col("ts")).cast("int") / lit(4)).cast("int").as("ctx"),
      arm.as("arm"))
      .withColumn("p_log", prop))
    val qhat = log.filter(col("is_train"))
      .groupBy(col("ctx"), col("arm"))
      .agg((sum(col("r")).cast("double") / count(lit(1))).as("q"))
    log.filter(!col("is_train"))
      .join(broadcast(banditFit(log)), "ctx")
      .join(broadcast(qhat.select(col("ctx"), col("arm"), col("q").as("q_log"))),
        Seq("ctx", "arm"), "left")
      .join(broadcast(qhat.select(col("ctx"), col("arm").as("chosen_arm"),
        col("q").as("q_pi"))), Seq("ctx", "chosen_arm"), "left")
      .withColumn("q_log", coalesce(col("q_log"), lit(0.0)))
      .withColumn("q_pi", coalesce(col("q_pi"), lit(0.0)))
      .withColumn("m", (col("arm") === col("chosen_arm")).cast("int"))
      .withColumn("w", col("m") / col("p_log"))
      .withColumn("contrib",
        col("q_pi") + col("w") * (col("r") - col("q_log")))
      .groupBy(col("ctx"), col("chosen_arm"))
      .agg(
        count(lit(1)).as("n_eval"),
        round(avg(col("q_pi")), 6).as("dm"),
        round(sum(col("w") * col("r")) / count(lit(1)), 6).as("ips"),
        round(avg(col("contrib")), 6).as("dr"))
      .orderBy(col("ctx"))
  }

  val qOffpolicyDrSql: String =
    s"""WITH log0 AS (
      |  SELECT event_id, (hour(ts)::INT // 4)::INT AS ctx,
      |    ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::INT % 100 AS u
      |  FROM events),
      |log1 AS (
      |  SELECT event_id, ctx,
      |    CASE WHEN u < 10 THEN 0 WHEN u < 30 THEN 1
      |         WHEN u < 60 THEN 2 ELSE 3 END AS arm,
      |    CASE WHEN u < 10 THEN 0.10::DOUBLE WHEN u < 30 THEN 0.20::DOUBLE
      |         WHEN u < 60 THEN 0.30::DOUBLE ELSE 0.40::DOUBLE END AS p_log
      |  FROM log0),
      |$banditSqlCommon,
      |qhat AS (
      |  SELECT ctx, arm, sum(r)::DOUBLE / count(*) q
      |  FROM log3 WHERE is_train GROUP BY 1, 2),
      |ev AS (
      |  SELECT l.ctx, f.chosen_arm, l.r,
      |    CASE WHEN l.arm = f.chosen_arm THEN 1 ELSE 0 END AS m,
      |    CASE WHEN l.arm = f.chosen_arm THEN 1.0::DOUBLE / l.p_log
      |         ELSE 0.0::DOUBLE END AS w,
      |    coalesce(ql.q, 0.0::DOUBLE) AS q_log,
      |    coalesce(qp.q, 0.0::DOUBLE) AS q_pi
      |  FROM log3 l
      |  JOIN fit f ON f.ctx = l.ctx
      |  LEFT JOIN qhat ql ON ql.ctx = l.ctx AND ql.arm = l.arm
      |  LEFT JOIN qhat qp ON qp.ctx = l.ctx AND qp.arm = f.chosen_arm
      |  WHERE NOT l.is_train)
      |SELECT ctx, chosen_arm, count(*)::BIGINT AS n_eval,
      |  round(avg(q_pi), 6) AS dm,
      |  round(sum(w * r) / count(*), 6) AS ips,
      |  round(avg(q_pi + w * (r - q_log)), 6) AS dr
      |FROM ev GROUP BY ctx, chosen_arm ORDER BY ctx""".stripMargin

  /** Classical additive seasonal decomposition (the moving-average
    * decomposition underlying STL — Cleveland et al. 1990's baseline,
    * Hyndman & Athanasopoulos, "Forecasting: Principles and Practice"
    * §3.4, public text): per event type, trend = centered 2×24 MA over
    * the dense hourly series, seasonal = hour-of-day mean of the
    * detrended series re-centered to sum 0, and Hyndman's seasonal
    * strength 1 − Var(resid)/Var(seasonal + resid). The DIAGNOSTIC
    * companion to [[qHoltWinters]] (which fits a forecaster): this
    * measures how much of the signal the daily cycle explains.
    *
    * Exactness contract (what makes a hash oracle possible): hourly
    * counts are integers, so the 2×24 MA numerator S₁+S₂ is an exact
    * long; the series is TRIMMED to hours [12, 684) — 28 whole days in
    * which every hour-of-day appears exactly 28 times and every MA
    * window is full — so detrended·48, the seasonal numerator
    * 24·Σdet − ΣΣdet (denominator 48·28·24 = 32256) and the residual
    * numerators stay integers end-to-end; squared sums ride
    * decimal/HUGEINT. Every double is produced by the same literal
    * expression over identical exact integers on both engines, so the
    * 6 dp rounds cannot straddle. A series shorter than 696 hours
    * yields ZERO rows on both engines (explicit precondition, the
    * [[qHoltWinters]] guard discipline).
    *
    * Scale shape: one counts aggregate (map-side combinable) over the
    * events scan; everything after is axis-bounded (types × 720 rows).
    */
  def qStlSeasonal(s: SparkSession, d: String): DataFrame = {
    val (grid, axisLen) = denseHourlyCounts(s, d)
    stlFromGrid(grid, axisLen)
  }

  /** [[qStlSeasonal]]'s decomposition over an explicit dense hourly
    * grid (event_type, idx, h, n) — the seam the streaming hourly
    * ledger ([[graft.streaming.EventStream.stlReport]]) shares, so
    * stream and batch cannot disagree about the decomposition.
    *
    * Window anchoring (ADVICE r10): the analyzed 672-hour slab is
    * anchored to the axis HEAD by default (`[12, 684)` — the batch
    * oracle's window, frozen once the series spans ≥696 hours, and
    * sensitive to late events arriving before the current min hour,
    * which shift idx and therefore which hours are analyzed).
    * `anchorTail = true` anchors the same-width slab to the axis TAIL
    * (`[axisLen-684, axisLen-12)`) instead — the serving-freshness
    * choice: the decomposition tracks the newest 28 whole days and
    * late-arriving EARLY events cannot move the window. Every
    * exactness property is anchor-independent: any contiguous 672-hour
    * slab contains each hour-of-day exactly 28 times, and both anchors
    * keep 12 hours of margin on each side so every 2×24 MA window is
    * full. */
  private[graft] def stlFromGrid(grid: DataFrame, axisLen: Long,
      anchorTail: Boolean = false): DataFrame = {
    val lo = if (anchorTail) axisLen - 684 else 12L
    val series = grid.select(col("event_type"), col("idx"),
      hour(col("h")).as("hod"), col("n"))
    val wA = Window.partitionBy(col("event_type")).orderBy(col("idx"))
      .rowsBetween(-12, 11)
    val wB = Window.partitionBy(col("event_type")).orderBy(col("idx"))
      .rowsBetween(-11, 12)
    val det = series
      .withColumn("s1", sum(col("n")).over(wA))
      .withColumn("s2", sum(col("n")).over(wB))
      .filter(lit(axisLen) >= 696 && col("idx") >= lo &&
        col("idx") < lo + 672)
      .select(col("event_type"), col("hod"),
        (lit(48L) * col("n") - col("s1") - col("s2")).as("det_num"))
      .localCheckpoint() // consumed by the seasonal agg AND the residual
    val perHod = det.groupBy(col("event_type"), col("hod"))
      .agg(sum(col("det_num")).as("s_sum"))
    val perType = perHod.groupBy(col("event_type"))
      .agg(sum(col("s_sum")).as("tot_sum"))
    val seasonalC = perHod.join(broadcast(perType), "event_type")
      .select(col("event_type"), col("hod"),
        (lit(24L) * col("s_sum") - col("tot_sum")).as("sc_num"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,0)")
    val strength = det
      .join(broadcast(seasonalC), Seq("event_type", "hod"))
      .select(col("event_type"),
        (lit(672L) * col("det_num") - col("sc_num")).as("nr"),
        (lit(672L) * col("det_num")).as("nsr"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("nr")).cast("double").as("srd"),
        sum(dec(col("nr")) * dec(col("nr"))).cast("double").as("s2r"),
        sum(col("nsr")).cast("double").as("ssrd"),
        sum(dec(col("nsr")) * dec(col("nsr"))).cast("double").as("s2sr"),
        count(lit(1)).cast("double").as("m"))
      .select(col("event_type"),
        (col("s2r") - col("srd") * col("srd") / col("m")).as("var_r"),
        (col("s2sr") - col("ssrd") * col("ssrd") / col("m")).as("var_sr"))
    seasonalC.join(broadcast(strength), "event_type")
      .select(col("event_type"), col("hod"),
        round(col("sc_num") / lit(32256.0), 6).as("seasonal"),
        when(col("var_sr") === 0.0, lit(null).cast("double"))
          .otherwise(round(greatest(lit(0.0),
            lit(1.0) - col("var_r") / col("var_sr")), 6))
          .as("seasonal_strength"))
      .orderBy(col("event_type"), col("hod"))
  }

  val qStlSeasonalSql: String =
    """WITH b AS (
      |  SELECT date_trunc('hour', min(ts)) h0, date_trunc('hour', max(ts)) h1
      |  FROM events),
      |ax AS (
      |  SELECT row_number() OVER (ORDER BY h) - 1 AS idx, h
      |  FROM (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) h FROM b)),
      |glen AS (SELECT count(*) al FROM ax),
      |ty AS (SELECT DISTINCT event_type FROM events),
      |cnt AS (
      |  SELECT event_type, date_trunc('hour', ts) h, count(*) c
      |  FROM events GROUP BY 1, 2),
      |se AS (
      |  SELECT t.event_type, a.idx, hour(a.h) hod, coalesce(c.c, 0)::BIGINT n
      |  FROM ty t CROSS JOIN ax a
      |  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.h = a.h),
      |w AS (
      |  SELECT event_type, idx, hod,
      |    48 * n
      |      - sum(n) OVER (PARTITION BY event_type ORDER BY idx
      |          ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)
      |      - sum(n) OVER (PARTITION BY event_type ORDER BY idx
      |          ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS det_num
      |  FROM se),
      |tr AS (
      |  SELECT w.* FROM w, glen
      |  WHERE al >= 696 AND idx >= 12 AND idx < 684),
      |ph AS (
      |  SELECT event_type, hod, sum(det_num)::BIGINT s_sum
      |  FROM tr GROUP BY 1, 2),
      |pt AS (SELECT event_type, sum(s_sum)::BIGINT tot FROM ph GROUP BY 1),
      |sc AS (
      |  SELECT ph.event_type, hod, 24 * s_sum - tot AS sc_num
      |  FROM ph JOIN pt USING (event_type)),
      |rs AS (
      |  SELECT tr.event_type,
      |    672 * det_num - sc_num AS nr, 672 * det_num AS nsr
      |  FROM tr JOIN sc ON sc.event_type = tr.event_type AND sc.hod = tr.hod),
      |st AS (
      |  SELECT event_type,
      |    sum(nr)::DOUBLE srd, sum(nr::HUGEINT * nr)::DOUBLE s2r,
      |    sum(nsr)::DOUBLE ssrd, sum(nsr::HUGEINT * nsr)::DOUBLE s2sr,
      |    count(*)::DOUBLE m
      |  FROM rs GROUP BY 1),
      |vv AS (
      |  SELECT event_type,
      |    s2r - srd * srd / m AS var_r, s2sr - ssrd * ssrd / m AS var_sr
      |  FROM st)
      |SELECT sc.event_type, hod, round(sc_num / 32256.0, 6) AS seasonal,
      |  CASE WHEN var_sr = 0.0 THEN NULL
      |       ELSE round(greatest(0.0::DOUBLE, 1.0 - var_r / var_sr), 6)
      |  END AS seasonal_strength
      |FROM sc JOIN vv USING (event_type)
      |ORDER BY event_type, hod""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_stl" -> (qStlSeasonal _),
    "ev_offpolicy_dr" -> (qOffpolicyDr _),
    "ev_stickiness" -> (qStickiness _),
    "ev_qini" -> (qQiniUplift _),
    "ev_offpolicy_ips" -> (qOffpolicyIps _),
    "ev_bandit_replay" -> (qBanditReplay _),
    "ev_gsp" -> (qGsp _),
    "ev_msprt" -> (qMsprt _),
    "ev_km" -> (qKaplanMeier _),
    "ev_cohort_ltv" -> (qCohortLtv _),
    "ev_did" -> (qDidLift _),
    "ev_power" -> (qPowerAnalysis _),
    "ev_funnel_latency" -> (qFunnelLatency _),
    "ev_reach_intersect_gate" -> (qReachIntersectGate _),
    "ev_srm_check" -> (qSrmCheck _),
    "ev_cuped" -> (qCupedLift _),
    "ev_reach_sketch" -> (qReachSketchRollup _),
    "ev_reach_sketch_gate" -> (qReachSketchGate _),
    "ev_user_reach_gate" -> (qUserReachGate _),
    "ev_hourly_rollup" -> (qHourlyRollup _),
    "ev_latest_per_user" -> (qLatestPerUser _),
    "ev_sessionize" -> (qSessionize _),
    "ev_json_props" -> (qJsonProps _),
    "ev_hourly_delta" -> (qHourlyDelta _),
    "ev_value_quantiles" -> (qValueQuantiles _),
    "ev_session_window" -> (qSessionWindow _),
    "ev_user_reach_approx" -> (qUserReachApprox _),
    "ev_trailing_hour" -> (qTrailingHour _),
    "ev_asof_click" -> (qAsofClick _),
    "ev_interval_pairs" -> (qIntervalPairs _),
    "ev_asof_click_merge" -> (qAsofClickMerge _),
    "ev_cms_topk" -> (qCmsTopUsers _),
    "ev_retention" -> (qRetention _),
    "ev_cms_topk_gate" -> (qCmsTopkGate _),
    "ev_range_incidents" -> (qRangeIncidents _),
    "ev_funnel" -> (qEventFunnel _),
    "ev_pivot" -> (qEventPivot _),
    "ev_quantile_gate" -> (qQuantileGate _),
    "ev_histogram" -> (qValueHistogram _),
    "ev_transitions" -> (qEventTransitions _),
    "ev_anomalies" -> (qValueAnomalies _),
    "ev_ewma" -> ((s: SparkSession, d: String) => qEventEwma(s, d)),
    "ev_holt" -> ((s: SparkSession, d: String) => qEventHolt(s, d)),
    "ev_holt_winters" -> (qHoltWinters _),
    "ev_hw_backtest" -> (qHwBacktest _),
    "ev_cusum" -> (qEventCusum _),
    "ev_rfm" -> (qEventRfm _),
    "ev_assoc_rules" -> (qAssocRules _),
    "ev_ab_lift" -> (qAbLift _),
    "ev_markov_eval" -> (qMarkovEval _),
    "ev_top_paths" -> (qTopPaths _),
    "ev_scd2" -> (qScd2 _),
    "ev_attribution" -> (qAttribution _),
    "ev_sliding_reach" -> (qSlidingReach _),
  )

  def oracles: Map[String, String] = Map(
    "ev_stl" -> qStlSeasonalSql,
    "ev_offpolicy_dr" -> qOffpolicyDrSql,
    "ev_stickiness" -> qStickinessSql,
    "ev_qini" -> qQiniUpliftSql,
    "ev_offpolicy_ips" -> qOffpolicyIpsSql,
    "ev_bandit_replay" -> qBanditReplaySql,
    "ev_gsp" -> qGspSql,
    "ev_msprt" -> qMsprtSql,
    "ev_km" -> qKaplanMeierSql,
    "ev_cohort_ltv" -> qCohortLtvSql,
    "ev_did" -> qDidLiftSql,
    "ev_power" -> qPowerAnalysisSql,
    // ev_reach_sketch / ev_user_reach_approx: sketch estimates aren't
    // SQL-reproducible → rows-only; their *_gate twins carry the
    // hash-checked accuracy contract
    "ev_reach_sketch_gate" -> reachGateSql,
    "ev_user_reach_gate" -> reachGateSql,
    "ev_hourly_rollup" -> qHourlyRollupSql,
    "ev_latest_per_user" -> qLatestPerUserSql,
    "ev_sessionize" -> qSessionizeSql,
    "ev_json_props" -> qJsonPropsSql,
    "ev_hourly_delta" -> qHourlyDeltaSql,
    "ev_value_quantiles" -> qValueQuantilesSql,
    "ev_session_window" -> qSessionizeSql, // same sessions, native operator
    "ev_trailing_hour" -> qTrailingHourSql,
    "ev_asof_click" -> qAsofClickSql,
    "ev_interval_pairs" -> qIntervalPairsSql,
    // same oracle, custom-operator plan (AsofJoinPlan → AsofMergeJoinExec)
    "ev_asof_click_merge" -> qAsofClickSql,
    // ev_cms_topk itself is rows-only (sketch-seeded estimates); the gate
    // hash-checks the CMS contract against exact counts
    "ev_cms_topk_gate" -> qCmsTopkGateSql,
    "ev_retention" -> qRetentionSql,
    "ev_range_incidents" -> qRangeIncidentsSql,
    "ev_funnel" -> qEventFunnelSql,
    "ev_funnel_latency" -> qFunnelLatencySql,
    "ev_reach_intersect_gate" -> qReachIntersectGateSql,
    "ev_srm_check" -> qSrmCheckSql,
    "ev_cuped" -> qCupedLiftSql,
    "ev_pivot" -> qEventPivotSql,
    // approx_percentile estimates aren't SQL-reproducible; the gate row
    // IS the check — any rank-budget violation flips a boolean and
    // hash-fails against the all-true oracle
    "ev_quantile_gate" -> qQuantileGateSql,
    "ev_histogram" -> qValueHistogramSql,
    "ev_transitions" -> qEventTransitionsSql,
    "ev_anomalies" -> qValueAnomaliesSql,
    "ev_ewma" -> qEventEwmaSql,
    "ev_holt" -> qEventHoltSql,
    "ev_holt_winters" -> qHoltWintersSql,
    "ev_hw_backtest" -> qHwBacktestSql,
    "ev_cusum" -> qEventCusumSql,
    "ev_rfm" -> qEventRfmSql,
    "ev_assoc_rules" -> qAssocRulesSql,
    "ev_ab_lift" -> qAbLiftSql,
    "ev_markov_eval" -> qMarkovEvalSql,
    "ev_top_paths" -> qTopPathsSql,
    "ev_scd2" -> qScd2Sql,
    "ev_attribution" -> qAttributionSql,
    "ev_sliding_reach" -> qSlidingReachSql,
  )
}
