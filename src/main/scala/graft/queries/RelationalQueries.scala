package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage over the TPC-H-ish driver tables: scans,
  * filters (pushed down), projections, hash aggregations, broadcast +
  * shuffle joins, semi/anti joins, windows, rollup, set ops, top-k.
  *
  * Scale notes (100 TB): every query here keeps its heavy side (lineitem /
  * orders) shuffling on the natural join key only once; dimension tables
  * (region, nation, supplier, part, customer at TPC-H ratios) are
  * broadcast-hinted so the fact table never shuffles for them. Aggregates
  * are all partial-agg friendly (sum/count/min/max/avg), so map-side
  * combine cuts shuffle volume by the group-count ratio. Top-k uses
  * orderBy+limit → TakeOrderedAndProject (no global sort).
  *
  * Doubles are rounded in BOTH the Spark query and the DuckDB oracle so the
  * driver's hash compare is immune to non-associative float summation.
  * Dates/timestamps are emitted as formatted strings for engine-neutral
  * hashing.
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary: filter → hash agg → sort. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        // money-shaped price sums reach 1e9 at sf1+, where double
        // accumulation drifts ±cent between engines (the q9 class) —
        // sum an exact DECIMAL image and round IN DECIMAL on both sides
        round(sum(col("l_extendedprice").cast("decimal(30,10)")), 2)
          .cast("double").as("sum_base_price"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,10)")), 2).cast("double").as("sum_disc_price"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .cast("decimal(30,10)")), 2).cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity),2) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,10))),2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,10))),2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(30,10))),2) AS DOUBLE) AS sum_charge,
      |  round(avg(l_quantity),2) AS avg_qty,
      |  round(avg(l_extendedprice),2) AS avg_price,
      |  round(avg(l_discount),4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-style: tight range filter fully pushed to the parquet scan. */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      // decimal-image the global money sum (the q9/q5 ±cent class)
      .agg(round(sum((col("l_extendedprice") * col("l_discount"))
        .cast("decimal(30,10)")), 2).cast("double").as("revenue"))
  }

  val q6Sql: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice*l_discount AS DECIMAL(30,10))),2) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q3-style shipping priority: 3-way join → agg → top-10.
    * customer is broadcast; orders⋈lineitem shuffles on orderkey once. */
  def q3TopOrders(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li   = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderpriority,
      |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1996-03-15'
      |GROUP BY l_orderkey, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style: multi-join with two broadcast dims → per-nation revenue. */
  def q5RegionRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val sup = Tables.supplier(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      // per-nation revenue is 1e9-magnitude at sf1: the caught ±cent
      // engine drift (sf1 gate, r15) — decimal-exact sum + decimal round
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(30,10)")), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name, CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,10))),2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q7-style volume shipping: revenue flowing between a nation
    * pair in either direction, by (supplier nation, customer nation,
    * ship year) — the 6-table join (lineitem ⋈ orders ⋈ customer ⋈
    * supplier ⋈ nation×2) whose plan quality rests entirely on the dim
    * chains broadcasting so the fact table shuffles at most once on the
    * orderkey. The pair filter lands on the two broadcast nation copies,
    * so it prunes before the fact join, not after. */
  def q7NationVolume(s: SparkSession, d: String): DataFrame = {
    val (na, nb) = ("NATION_1", "NATION_2")
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val natS = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      .filter(col("supp_nation").isin(na, nb))
    val natC = Tables.nation(s, d)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      .filter(col("cust_nation").isin(na, nb))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      // nation-pair-year revenue reaches 1e8 at sf1 (the q9/q5 class)
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(30,10)")), 2).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  year(l_shipdate)::INT AS l_year,
      |  CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,10))),2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      |  AND cn.n_name IN ('NATION_1', 'NATION_2')
      |  AND sn.n_name <> cn.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Left-semi join (EXISTS): orders having at least one late-shipped item. */
  def qSemiJoin(s: SparkSession, d: String): DataFrame = {
    val late = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("2001-01-01").cast("timestamp"))
      .select(col("l_orderkey"))
    Tables.orders(s, d)
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val qSemiJoinSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '2001-01-01')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def qAntiJoin(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d)
      .join(Tables.orders(s, d).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Window function: top-3 orders per customer by totalprice. */
  def qWindowTopOrders(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice_r"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val qWindowTopOrdersSql: String =
    """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS o_totalprice_r, rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** GROUPING SETS via ROLLUP over returnflag/linestatus. */
  def qRollup(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Distinct + count-distinct aggregates over part attributes. */
  def qDistinctAgg(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d)
      .groupBy(col("p_brand"))
      .agg(
        countDistinct(col("p_type")).as("n_types"),
        countDistinct(col("p_size")).as("n_sizes"),
        round(avg(col("p_retailprice")), 2).as("avg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("p_brand"))
  }

  val qDistinctAggSql: String =
    """SELECT p_brand, count(DISTINCT p_type) AS n_types,
      |  count(DISTINCT p_size) AS n_sizes,
      |  round(avg(p_retailprice),2) AS avg_price, count(*) AS n
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Set op: UNION ALL of two filtered projections, then dedup via DISTINCT. */
  def qUnionDistinct(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").cast("int").as("nationkey"))
    val b = Tables.supplier(s, d)
      .filter(col("s_acctbal") > 1000)
      .select(col("s_nationkey").cast("int").as("nationkey"))
    a.unionByName(b).distinct()
      .join(broadcast(Tables.nation(s, d)), col("nationkey") === col("n_nationkey"))
      .select(col("nationkey"), col("n_name"))
      .orderBy(col("nationkey"))
  }

  val qUnionDistinctSql: String =
    """SELECT nationkey, n_name FROM (
      |  SELECT DISTINCT nationkey FROM (
      |    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
      |    UNION ALL
      |    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 1000))
      |JOIN nation ON nationkey = n_nationkey ORDER BY nationkey""".stripMargin

  /** Correlated-scalar style: orders above their customer's average order value. */
  def qAboveCustomerAvg(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val avgPerCust = ord.groupBy(col("o_custkey").as("ck"))
      .agg(avg(col("o_totalprice")).as("avg_price"))
    ord.join(avgPerCust, col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > col("avg_price") * 1.5)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice_r"))
      .orderBy(col("o_orderkey"))
  }

  val qAboveCustomerAvgSql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS o_totalprice_r
      |FROM orders o JOIN (
      |  SELECT o_custkey AS ck, avg(o_totalprice) AS avg_price FROM orders GROUP BY 1) a
      |ON o.o_custkey = a.ck
      |WHERE o_totalprice > avg_price * 1.5 ORDER BY o_orderkey""".stripMargin

  /** INTERSECT: nations present among both high-balance customers and
    * high-balance suppliers (distinct set semantics). */
  def qIntersect(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_nationkey").cast("int").as("nationkey"))
    val b = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
      .select(col("s_nationkey").cast("int").as("nationkey"))
    a.intersect(b).orderBy(col("nationkey"))
  }

  val qIntersectSql: String =
    """SELECT c_nationkey::INT AS nationkey FROM customer WHERE c_acctbal > 5000
      |INTERSECT
      |SELECT s_nationkey::INT FROM supplier WHERE s_acctbal > 5000
      |ORDER BY nationkey""".stripMargin

  /** EXCEPT: nations with high-balance customers but no high-balance
    * supplier. */
  def qExcept(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_nationkey").cast("int").as("nationkey"))
    val b = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
      .select(col("s_nationkey").cast("int").as("nationkey"))
    a.except(b).orderBy(col("nationkey"))
  }

  val qExceptSql: String =
    """SELECT c_nationkey::INT AS nationkey FROM customer WHERE c_acctbal > 5000
      |EXCEPT
      |SELECT s_nationkey::INT FROM supplier WHERE s_acctbal > 5000
      |ORDER BY nationkey""".stripMargin

  /** Date-dimension projection: year/month buckets with date functions. */
  def qOrdersByMonth(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("yr"), col("mo"))
  }

  val qOrdersByMonthSql: String =
    """SELECT year(o_orderdate)::INT AS yr, month(o_orderdate)::INT AS mo,
      |  count(*) AS n_orders, round(sum(o_totalprice),2) AS total
      |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin

  /** FULL OUTER join with key-coalescing — the reconciliation-report
    * shape (two independently aggregated sides, keys present in either).
    * The mod-class predicates guarantee unmatched keys on BOTH sides at
    * every SF (customer side covers nationkey ≡ 0 mod 3, supplier side
    * ≡ 0 mod 2), so the null-padding paths are genuinely exercised.
    * Both inputs aggregate BEFORE the join — the outer join moves
    * ≤ |nations| rows, never base-table rows. */
  def qFullOuterNation(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .filter(col("c_nationkey") % 3 === 0)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        round(avg(col("c_acctbal")), 2).as("avg_cust_bal"))
    val sup = Tables.supplier(s, d)
      .filter(col("s_nationkey") % 2 === 0)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        col("avg_cust_bal"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        (col("n_cust").isNull || col("n_supp").isNull).as("one_sided"))
      .orderBy(col("nationkey"))
  }

  val qFullOuterNationSql: String =
    """WITH c AS (
      |  SELECT c_nationkey nationkey, count(*) n_cust,
      |    round(avg(c_acctbal), 2) avg_cust_bal
      |  FROM customer WHERE c_nationkey % 3 = 0 GROUP BY 1),
      |s AS (
      |  SELECT s_nationkey nationkey, count(*) n_supp
      |  FROM supplier WHERE s_nationkey % 2 = 0 GROUP BY 1)
      |SELECT nationkey,
      |  coalesce(n_cust, 0) AS n_cust, avg_cust_bal,
      |  coalesce(n_supp, 0) AS n_supp,
      |  (n_cust IS NULL OR n_supp IS NULL) AS one_sided
      |FROM c FULL OUTER JOIN s USING (nationkey)
      |ORDER BY nationkey""".stripMargin

  /** TPC-H Q4 adapted to this schema (lineitem carries no
    * commit/receipt dates, so "late" = shipped more than 60 days after
    * the order date): order-priority counts over a two-quarter window,
    * existence-tested against late line items. The semi join carries
    * the equi key PLUS the non-equi lateness predicate — Spark plans
    * the equi part as the join key and evaluates the date arithmetic
    * as a join-side filter, so the orders side still moves once and
    * duplicates from multi-line orders never materialize (EXISTS, not
    * INNER). */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-07-01"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*)::BIGINT AS n_orders
      |FROM orders o
      |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q14 (promotion effect): the share of one year's shipped
    * revenue on PROMO-type parts — a conditional aggregate over the
    * lineitem scan with the part dimension BROADCAST (the dimension is
    * parts-bounded; the fact table never reshuffles). The absolute
    * revenue sums go through the q9-style DECIMAL image (1e8+ at sf1,
    * where plain double sums drift ±cent between engines); the 4-dp
    * share stays double — a ratio's rounding headroom is relative. */
  def q14PromoShare(s: SparkSession, d: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
          sum(rev), 4).as("promo_revenue_pct"),
        // the two absolute sums are 1e8-1e9 at sf1 — decimal-image them
        // (the pct ratio stays double: rounding headroom is relative)
        round(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))
          .cast("decimal(30,10)")), 2).cast("double").as("promo_revenue"),
        round(sum(rev.cast("decimal(30,10)")), 2).cast("double")
          .as("total_revenue"))
  }

  val q14Sql: String =
    """SELECT
      |  round(100.0 * sum(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
      |    / sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue_pct,
      |  CAST(round(sum(CAST(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
      |    AS DECIMAL(30,10))), 2) AS DOUBLE) AS promo_revenue,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(30,10))), 2) AS DOUBLE) AS total_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'""".stripMargin

  /** TPC-H Q10-style returned-item reporting: which customers returned
    * the most revenue in a quarter — the selective-fact + broadcast-dims
    * + top-k report. orders' date filter and lineitem's returnflag
    * filter both push to the scans; customer and nation broadcast; the
    * fact shuffles once on the groupBy key; top-20 is
    * TakeOrderedAndProject. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("acctbal"), col("n_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, n_name,
      |  round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q13-style customer order-count distribution: LEFT OUTER join
    * keeps zero-order customers, then the histogram of per-customer
    * counts — the two-level aggregation shape (fact shuffles once on
    * custkey; the second agg is over |customers| rows collapsing to a
    * handful of buckets). The reference Q13 o_comment exclusion is
    * dropped — the trimmed orders table carries no comment column. */
  def q13OrderDistribution(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** The Q22 "country code" set — the trimmed customer table has no
    * phone column, so the odd nation keys stand in for the seven
    * hard-coded prefixes. */
  private val Q22Nations = Seq(1, 3, 5, 7, 9, 11, 13)

  /** Q22's dormancy cutoff: the literal "never ordered" predicate is
    * VACUOUS on this corpus (every synthetic customer has orders — the
    * ev_km lesson: check the semantics against the corpus, not the
    * textbook), so the anti-join excludes customers with any RECENT
    * order instead — the dormant-account variant a retention team runs.
    * Last-order dates span 1998-02..2001-08 (median 2001-02), so this
    * cutoff leaves a real dormant set at every SF. */
  private val Q22Cutoff = "2000-07-01"

  /** TPC-H Q22-style global sales opportunity: positive-balance
    * customers above the segment average with no recent order — the
    * scalar-subquery (1-row broadcast) + LEFT ANTI join shape. The
    * orders side filters to the recent window (pushed to the scan) and
    * reduces to distinct custkeys before the anti join. */
  def q22SalesOpportunity(s: SparkSession, d: String): DataFrame = {
    val seg = Tables.customer(s, d)
      .filter(col("c_nationkey").isin(Q22Nations: _*))
    val avgBal = seg.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("abal"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(Q22Cutoff).cast("timestamp"))
      .select(col("o_custkey")).distinct()
    seg.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("abal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  val q22Sql: String =
    s"""WITH seg AS (
      |  SELECT * FROM customer WHERE c_nationkey IN (${Q22Nations.mkString(", ")})),
      |ab AS (SELECT avg(c_acctbal) abal FROM seg WHERE c_acctbal > 0.0)
      |SELECT c_nationkey, count(*) AS numcust,
      |  round(sum(c_acctbal), 2) AS totacctbal
      |FROM seg, ab
      |WHERE c_acctbal > abal
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '$Q22Cutoff')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** TPC-H Q8 (national market share): one supplier nation's share of a
    * region's revenue in one part type, per year — the deepest
    * broadcast-dim chain in the suite (part, customer, both nation
    * roles, region all broadcast; the two facts join on orderkey once).
    * Shares are conditional-sum ratios rounded at 4 dp. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val amNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") <= lit("1997-12-31").cast("timestamp"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(amNations), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_6", rev)
          .otherwise(lit(0.0))) / sum(rev), 4).as("mkt_share"),
        round(sum(rev), 2).as("total_revenue"))
      .orderBy(col("o_year"))
  }

  val q8Sql: String =
    """SELECT year(o_orderdate)::INT AS o_year,
      |  round(sum(CASE WHEN sn.n_name = 'NATION_6'
      |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
      |    / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN region ON cn.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <= TIMESTAMP '1997-12-31'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q15 (top supplier): quarterly revenue per supplier, return
    * every supplier AT the maximum — the 1-row broadcast max joined back
    * on the ROUNDED revenue (both engines compare identical 2 dp values,
    * so the tie set is deterministic — the textbook view+equality shape
    * without a second fact scan). */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    // the revenue "view" is suppliers-bounded — materialize it once so
    // the max probe and the equality filter share ONE fact scan (AQE
    // does not reuse the aggregation exchange across the two consumers;
    // measured: without this the lineitem scan runs twice)
    val revenue = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
      .localCheckpoint()
    val mx = revenue.agg(max(col("total_revenue")).as("mr"))
    revenue.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mr"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17-style small-quantity revenue: average yearly revenue lost
    * if small-quantity orders (below 20% of the part's average) moved to
    * scheduled deliveries, for one brand. The textbook p_container
    * predicate is dropped — the trimmed part table has no container
    * column (documented divergence, the q13/q22 class). The per-part
    * threshold is a parts-bounded aggregate joined back broadcast; the
    * corpus spans 7 order years (1995–2001), hence the /7. */
  def q17SmallQuantity(s: SparkSession, d: String): DataFrame = {
    // materialized once: the brand slice is tiny (1/25 of lineitem) and
    // feeds both the threshold aggregate and the probe side — without
    // this the fact scans twice (the q15 lesson)
    val brandLi = q17BrandSliceRaw(s, d).localCheckpoint()
    val thr = brandLi.groupBy(col("l_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_thr"))
    brandLi.join(broadcast(thr), "l_partkey")
      .filter(col("l_quantity") < col("qty_thr"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** [[q17SmallQuantity]]'s brand slice BEFORE materialization —
    * exposed so PlanQualitySpec can pin the brand pushdown and the
    * broadcast dim join on the subtree the checkpoint hides. */
  private[graft] def q17BrandSliceRaw(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#12")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))

  val q17Sql: String =
    """WITH b AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#12'),
      |t AS (
      |  SELECT l_partkey, 0.2::DOUBLE * avg(l_quantity) AS qty_thr
      |  FROM b GROUP BY 1)
      |SELECT round(sum(l_extendedprice) / 7.0::DOUBLE, 2) AS avg_yearly
      |FROM b JOIN t USING (l_partkey)
      |WHERE l_quantity < qty_thr""".stripMargin

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * exceeds 250 (the synthetic per-order p99 is ~262, so the set is
    * real at every SF), with their customers — the
    * aggregate-then-semi-join-the-fact shape: the HAVING relation is
    * orders-bounded and joins back broadcast, the facts shuffle on
    * orderkey once; top-100 is TakeOrderedAndProject. */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      .filter(col("sum_qty") > 250.0)
    big
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        round(col("o_totalprice"), 2).as("totalprice"), col("sum_qty"))
      .orderBy(col("totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      |  FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 250.0)
      |SELECT c_custkey, c_name, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  round(o_totalprice, 2) AS totalprice, sum_qty
      |FROM big JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q19-style disjunctive discounted revenue: an OR of three
    * (brand, size-band, quantity-band) conjunctions — the shape that
    * exercises disjunction pushdown (each disjunct's part predicate
    * prunes the broadcast dim; the common l_partkey join key is what
    * keeps the fact scan single-pass). The textbook shipmode/container
    * legs are dropped — neither column exists in the trimmed tables
    * (documented divergence); brands/bands chosen non-vacuous per
    * disjunct at every SF (probed, the ev_km lesson). */
  def q19DiscountedRevenue(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_brand").isin("Brand#13", "Brand#15", "Brand#25"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("p_brand"))
  }

  val q19Sql: String =
    """SELECT p_brand, count(*)::BIGINT AS n_items,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q20-style dominant-supplier selection — the nested
    * semi-join-with-correlated-aggregate-threshold shape: suppliers
    * qualify when, for some part in a name-predicated slice, THEIR 1997
    * shipped quantity exceeds half the part's total shipped quantity
    * (textbook Q20 compares ps_availqty to half the shipped quantity;
    * the trimmed tables have no partsupp/availqty, so the threshold is
    * re-anchored to the per-part shipped total and the closing nation
    * equality becomes a broadcast dim join emitting n_name — documented
    * divergence, the q13/q17/q22 class; probed non-vacuous at sf0.001
    * and sf0.01: 7 / 63 qualifying suppliers).
    *
    * Plan shape at scale: ONE lineitem scan — the per-(part, supplier)
    * aggregate is the only fact pass, materialized once
    * (parts×suppliers-bounded, the q17 slice pattern: AQE does NOT
    * exchange-reuse it across the two consumers, measured — without
    * the checkpoint the fact scanned twice); its per-part total
    * RE-AGGREGATES that result, the threshold joins back broadcast,
    * and the supplier table is pruned by a LEFT SEMI join on the
    * qualifying supplier set — the semi survives planning
    * (PlanQualitySpec). */
  def q20DominantSupplier(s: SparkSession, d: String): DataFrame = {
    val slice = Tables.part(s, d).filter(col("p_name").like("red %"))
      .select(col("p_partkey"))
    val pair = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(slice), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("q"))
      .localCheckpoint()
    val tot = pair.groupBy(col("l_partkey"))
      .agg(sum(col("q")).as("tq"))
    // integral quantities: the double sums are exact (< 2^53), so the
    // half-total threshold is engine-stable against the DuckDB oracle
    val qual = pair.join(broadcast(tot), "l_partkey")
      .filter(col("q") > lit(0.5) * col("tq"))
      .select(col("l_suppkey"))
    Tables.supplier(s, d)
      .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  val q20Sql: String =
    """WITH slice AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'),
      |pair AS (
      |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
      |  FROM lineitem JOIN slice ON l_partkey = p_partkey
      |  WHERE l_shipdate >= DATE '1997-01-01'
      |    AND l_shipdate < DATE '1998-01-01'
      |  GROUP BY 1, 2),
      |tot AS (SELECT l_partkey, sum(q) AS tq FROM pair GROUP BY 1)
      |SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM pair JOIN tot USING (l_partkey)
      |  WHERE q > 0.5 * tq)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q21-style waiting-supplier count — the EXISTS + NOT-EXISTS
    * double semi/anti on ONE fact: suppliers who were the SOLE late
    * supplier on a multi-supplier finished order. The trimmed lineitem
    * has no commit/receipt dates, so "late" is re-anchored to shipping
    * more than a year after the order date (documented divergence;
    * probed non-vacuous: 106 / 988 waiting pairs at sf0.001 / sf0.01,
    * lateness spread across the 180–730-day lag band).
    *
    * Plan shape at scale: the late (order, supplier) relation is
    * orders-bounded and materialized ONCE (localCheckpoint — it feeds
    * the probe, and re-feeds the anti side); the EXISTS becomes a LEFT
    * SEMI against the only other lineitem scan (equi on orderkey +
    * non-equi supplier inequality), the NOT EXISTS a LEFT ANTI against
    * the materialized late relation itself — two fact scans total,
    * both semi and anti survive planning (PlanQualitySpec), and the
    * final per-supplier count joins supplier broadcast. */
  def q21WaitingSupplier(s: SparkSession, d: String): DataFrame = {
    val late = Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 365)
      .select(col("l_orderkey"), col("l_suppkey"))
      .distinct()
      .localCheckpoint()
    val other = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
    val waiting = late
      .join(other,
        col("l_orderkey") === col("ok") && col("l_suppkey") =!= col("sk"),
        "left_semi")
      .join(late.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2")),
        col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
        "left_anti")
    waiting
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """WITH late AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |    AND date_diff('day', o_orderdate, l_shipdate) > 365)
      |SELECT s_name, count(*)::BIGINT AS numwait
      |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM late l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** TPC-H Q9-style product-type profit by nation and year — the widest
    * feasible join on the trimmed schema (5 tables): a name-predicated
    * part slice drives lineitem, orders supplies the year, supplier →
    * nation labels the profit. The trimmed tables have no partsupp, so
    * the textbook's ps_supplycost is re-anchored to a retail-price cost
    * proxy (amount = l_extendedprice·(1−l_discount) −
    * 0.1·p_retailprice·l_quantity) — documented divergence, the
    * q13/q17/q20 class; probed non-vacuous at sf0.001: 714 slice rows
    * over 10 nations × 7 years ('%bolt%' matches ~2.4% of part).
    *
    * Plan shape at scale: ONE lineitem scan and ONE orders scan — the
    * only big-big join shuffles on orderkey; part (sliced), supplier
    * and nation all broadcast, so the fact never shuffles for a
    * dimension. The groupBy keys are tiny (nation × year), so partial
    * aggregation collapses the shuffle to ~70 rows per task
    * (PlanQualitySpec pins the scan count and the broadcasts). */
  def q9ProductTypeProfit(s: SparkSession, d: String): DataFrame = {
    val slice = Tables.part(s, d).filter(col("p_name").like("%bolt%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val supp = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name"))
    Tables.lineitem(s, d)
      .join(broadcast(slice), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      // decimal-exact accumulation AND decimal-domain rounding: the
      // per-row amount is identical double arithmetic on both engines,
      // but (a) its SUM is 1e8-magnitude at sf1 with ±cent
      // non-associative float error, and (b) these money-shaped
      // amounts sum to values that frequently END at the half-cent
      // boundary (…045), where Spark's double round (shortest-decimal
      // string, HALF_UP) and DuckDB's (binary value, rounds down)
      // disagree systematically — the sf1 probe caught both classes.
      // Summing an exact DECIMAL(30,10) image and rounding IN DECIMAL
      // (HALF_UP == half-away for positive sums on both engines)
      // before the double cast makes the 2-dp value engine-stable at
      // every SF.
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")) -
        lit(0.1) * col("p_retailprice") * col("l_quantity"))
        .cast("decimal(30,10)")), 2).cast("double")
        .as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    """SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
      |  CAST(round(sum(CAST(l_extendedprice*(1-l_discount)
      |            - 0.1*p_retailprice*l_quantity AS DECIMAL(30,10))), 2)
      |       AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%bolt%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q12-style shipping-priority split — the IN-disjunction +
    * two-branch conditional aggregate: for one ship year's lines in a
    * two-value flag slice, count critical-priority vs other orders per
    * flag value. The trimmed lineitem has no l_shipmode or commit/
    * receipt dates, so the textbook's shipmode grouping is re-anchored
    * to l_returnflag ('R','A' — the IN keeps the disjunction shape)
    * and the lateness window to the 1996 ship year — documented
    * divergence, the q21 class; probed non-vacuous at sf0.001: both
    * flags populated, both branches nonzero.
    *
    * Plan shape at scale: ONE lineitem scan and ONE orders scan — the
    * flag + year filters push to the parquet scan, the single shuffle
    * is the orderkey equi-join, and the CASE branches fold into one
    * partial aggregate (two sums in one pass, never two scans). */
  def q12ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("R", "A") &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |           THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
      |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |           THEN 0 ELSE 1 END)::BIGINT AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_returnflag IN ('R','A')
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q9_product_profit" -> (q9ProductTypeProfit _),
    "q12_shipping_priority" -> (q12ShippingPriority _),
    "q8_market_share" -> (q8MarketShare _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q19_discounted_revenue" -> (q19DiscountedRevenue _),
    "q20_dominant_supplier" -> (q20DominantSupplier _),
    "q21_waiting_supplier" -> (q21WaitingSupplier _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q13_order_distribution" -> (q13OrderDistribution _),
    "q22_sales_opportunity" -> (q22SalesOpportunity _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q14_promo_share" -> (q14PromoShare _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q3_top_orders" -> (q3TopOrders _),
    "q5_region_revenue" -> (q5RegionRevenue _),
    "q7_nation_volume" -> (q7NationVolume _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_window_top_orders" -> (qWindowTopOrders _),
    "q_rollup" -> (qRollup _),
    "q_distinct_agg" -> (qDistinctAgg _),
    "q_union_distinct" -> (qUnionDistinct _),
    "q_above_customer_avg" -> (qAboveCustomerAvg _),
    "q_orders_by_month" -> (qOrdersByMonth _),
    "q_intersect" -> (qIntersect _),
    "q_except" -> (qExcept _),
    "q_full_outer" -> (qFullOuterNation _),
  )

  def oracles: Map[String, String] = Map(
    "q9_product_profit" -> q9Sql,
    "q12_shipping_priority" -> q12Sql,
    "q8_market_share" -> q8Sql,
    "q15_top_supplier" -> q15Sql,
    "q17_small_quantity" -> q17Sql,
    "q18_large_orders" -> q18Sql,
    "q19_discounted_revenue" -> q19Sql,
    "q20_dominant_supplier" -> q20Sql,
    "q21_waiting_supplier" -> q21Sql,
    "q10_returned_items" -> q10Sql,
    "q13_order_distribution" -> q13Sql,
    "q22_sales_opportunity" -> q22Sql,
    "q4_order_priority" -> q4Sql,
    "q14_promo_share" -> q14Sql,
    "q1_pricing_summary" -> q1Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q3_top_orders" -> q3Sql,
    "q5_region_revenue" -> q5Sql,
    "q7_nation_volume" -> q7Sql,
    "q_semi_join" -> qSemiJoinSql,
    "q_anti_join" -> qAntiJoinSql,
    "q_window_top_orders" -> qWindowTopOrdersSql,
    "q_rollup" -> qRollupSql,
    "q_distinct_agg" -> qDistinctAggSql,
    "q_union_distinct" -> qUnionDistinctSql,
    "q_above_customer_avg" -> qAboveCustomerAvgSql,
    "q_orders_by_month" -> qOrdersByMonthSql,
    "q_intersect" -> qIntersectSql,
    "q_except" -> qExceptSql,
    "q_full_outer" -> qFullOuterNationSql,
  )
}
