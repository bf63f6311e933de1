package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second relational pack: TPC-H-flavored queries adapted to the testdata
  * schema, covering date arithmetic, LIKE pushdown, OR-of-conjunctions,
  * exists-with-condition, scalar subqueries, and ratio aggregates.
  */
object Relational2 {

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q4-like: orders with any line shipped >90 days after order date. */
  def q4LateOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val late = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > date_add(col("o_orderdate"), 90))
      .select("o_orderkey").distinct()
    t.orders.join(late, "o_orderkey")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS n_late
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND o_orderkey IN (
      |    SELECT o_orderkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q7-like: shipping volume between two nations by year. */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val n1 = t.nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t.nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(rev), 2).as("volume"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
      |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Q9-like: margin (revenue minus retail cost) by nation and year. */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.part.filter(col("p_name").like("%a%")), col("l_partkey") === col("p_partkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      // exact decimal arithmetic: this sum's double value lands within an
      // ulp of a rounding boundary, so engines' summation order flips the
      // rounded cent. Decimal sums are exact and order-independent; the
      // stored doubles sit on a 2dp grid so the decimal cast is stable.
      .agg(sum(
          col("l_extendedprice").cast("decimal(12,2)")
            * (lit(1.0).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)"))
          - col("p_retailprice").cast("decimal(10,2)")
            * col("l_quantity").cast("decimal(6,2)") * lit(0.1).cast("decimal(2,1)"))
        .cast("double").as("margin"))
      .orderBy(col("nation"), col("o_year"))
  }

  val q9Sql: String =
    """SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |             * (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |           - CAST(p_retailprice AS DECIMAL(10,2))
      |             * CAST(l_quantity AS DECIMAL(6,2)) * CAST(0.1 AS DECIMAL(2,1)))
      |       AS DOUBLE) AS margin
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%a%'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q10-like: revenue lost to returns per customer, top 20. */
  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.filter(col("l_returnflag") === "R")
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(rev), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q14-like: promo revenue share (ratio of conditional aggregates). */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") >= lit("1997-09-01") && col("l_shipdate") < lit("1997-10-01"))
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .agg(round(
        sum(when(col("p_type").like("PROMO%"), rev).otherwise(0.0)) * 100.0 / sum(rev), 4)
        .as("promo_share"))
  }

  val q14Sql: String =
    """SELECT round(
      |  sum(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |  * 100.0 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin

  /** Q18-like: orders whose total quantity exceeds a threshold. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.lineitem.groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 120)
    big.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  val q18Sql: String =
    """SELECT c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, total_qty
      |FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 120) big
      |JOIN orders ON big.l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey LIMIT 50""".stripMargin

  /** Q19-like: OR-of-conjunction predicates across join sides. */
  def q19OrPredicates(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity") >= 5) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) && col("l_quantity") >= 10) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) && col("l_quantity") >= 20))
      .agg(round(sum(rev), 2).as("revenue"), count(lit(1)).as("n"))
  }

  val q19Sql: String =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20)""".stripMargin

  /** Q22-like: above-average-balance customers with no orders (scalar
    * subquery + anti join). */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // scalar subquery as a broadcast crossJoin: the threshold stays inside
    // one lazy plan (no driver-side job at plan-build, composable/reusable)
    val avgBal = t.customer.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    t.customer.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(t.orders.select("o_custkey"), col("c_custkey") === col("o_custkey"), "leftanti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_idle"), round(sum(col("c_acctbal")), 2).as("total_bal"))
  }

  val q22Sql: String =
    """SELECT c_nationkey, count(*) AS n_idle, round(sum(c_acctbal), 2) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey""".stripMargin

  /** Q11-like: nations holding a disproportionate share of customer
    * balance (group agg compared against a global-aggregate threshold). */
  def q11Concentration(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pos = t.customer.filter(col("c_acctbal") > 0)
    // global threshold via broadcast crossJoin — lazy, no plan-build job
    val threshold = pos.agg((sum(col("c_acctbal")) * 0.05).as("threshold"))
    pos.groupBy(col("c_nationkey"))
      .agg(round(sum(col("c_acctbal")), 2).as("nation_bal"))
      .crossJoin(broadcast(threshold))
      .filter(col("nation_bal") > col("threshold"))
      .select(col("c_nationkey"), col("nation_bal"))
      .orderBy(col("nation_bal").desc, col("c_nationkey"))
  }

  val q11Sql: String =
    """SELECT c_nationkey, round(sum(c_acctbal), 2) AS nation_bal
      |FROM customer WHERE c_acctbal > 0
      |GROUP BY c_nationkey
      |HAVING round(sum(c_acctbal), 2) >
      |  (SELECT sum(c_acctbal) * 0.05 FROM customer WHERE c_acctbal > 0)
      |ORDER BY nation_bal DESC, c_nationkey""".stripMargin

  /** Q8-like: a nation's market share of STANDARD-part volume sold into
    * EUROPE customers, per order year. Decimal volume sums (exact,
    * order-independent) feed one double division at the end, so the share
    * hash-matches the oracle bit-for-bit. Truly-fixed sides (nation,
    * region) pin as broadcasts; supplier GROWS with SF, so its join is
    * left to AQE (the q5 rule — broadcast only what stays small at 100
    * TB). The two nation roles join under distinct aliases.
    * No partsupp table in the dataset, so the min-cost-supplier family
    * (Q2/Q20) is out of scope by data, not by design. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val vol = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1.0).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)"))
    val cnation = t.nation.select(col("n_nationkey").as("cn_key"),
      col("n_regionkey").as("cn_region"))
    val snation = t.nation.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    t.lineitem
      .join(t.part.filter(col("p_type") === "STANDARD"), col("l_partkey") === col("p_partkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(cnation), col("c_nationkey") === col("cn_key"))
      .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
        col("cn_region") === col("r_regionkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(snation), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(lit(0).cast("decimal(16,4)"))).cast("double") /
        sum(vol).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8Sql: String =
    """SELECT year(o_orderdate) AS o_year,
      |  CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2))
      |         * (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |    ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) /
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |         * (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |  AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q13-like: customer order-count distribution (left join keeps
    * zero-order customers; the double groupBy is two cheap shuffles). */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders.filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN (
      |    SELECT o_custkey, o_orderkey FROM orders
      |    WHERE o_orderpriority <> '1-URGENT') o ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q15-like: the top revenue supplier(s) of 1996Q1. Revenue sums in
    * exact decimal, the max threshold rides a broadcast crossJoin (lazy,
    * no plan-build job), and the decimal equality is exact — no
    * double-tie ambiguity. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val vol = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1.0).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)"))
    val rev = t.lineitem
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
      .groupBy(col("l_suppkey"))
      .agg(sum(vol).as("total_rev"))
    rev.crossJoin(broadcast(rev.agg(max(col("total_rev")).as("max_rev"))))
      .filter(col("total_rev") === col("max_rev"))
      .join(Tables(spark, dir).supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin

  /** Q17-like: revenue impact of below-average-quantity small orders
    * (per-part average via a second aggregation + join back — the same
    * skew-safe two-phase shape as q_doc_freq_score; the avg is an
    * integer-rational division, so the 0.8 threshold compares exactly). */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pl = t.lineitem
      .join(t.part.filter(col("p_type") === "SMALL"), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgs = pl.groupBy(col("l_partkey"))
      .agg((sum(col("l_quantity")).cast("double") / count(lit(1)).cast("double")).as("avg_qty"))
    pl.join(avgs, "l_partkey")
      .filter(col("l_quantity") < lit(0.8) * col("avg_qty"))
      .agg((sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double") / 7.0)
        .as("avg_yearly"))
  }

  val q17Sql: String =
    """WITH pl AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON p_partkey = l_partkey WHERE p_type = 'SMALL'),
      |a AS (SELECT l_partkey,
      |    CAST(sum(l_quantity) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty
      |  FROM pl GROUP BY l_partkey)
      |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM pl JOIN a USING (l_partkey) WHERE l_quantity < 0.8 * avg_qty""".stripMargin

  /** Q16-like: distinct supplier reach per (brand, type-prefix) excluding a
    * brand pattern. */
  def q16SupplierReach(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.part.filter(!col("p_brand").like("Brand#1%")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"))
      .filter(col("n_suppliers") >= 5)
      .orderBy(col("n_suppliers").desc, col("p_brand"), col("p_type"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS n_suppliers
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand NOT LIKE 'Brand#1%'
      |GROUP BY p_brand, p_type
      |HAVING count(DISTINCT l_suppkey) >= 5
      |ORDER BY n_suppliers DESC, p_brand, p_type""".stripMargin

  /** Window-function family: lag/lead/dense_rank/ntile/cume_dist in one
    * partitioned, deterministically-ordered window. */
  def qWindowFamily(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(spark, dir).customer
      .filter(col("c_nationkey") < 5)
      .select(col("c_custkey"), col("c_nationkey"),
        lag(col("c_custkey"), 1).over(w).as("prev_cust"),
        lead(col("c_custkey"), 1).over(w).as("next_cust"),
        dense_rank().over(w).cast("bigint").as("drnk"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        cume_dist().over(w).as("cdist"))
  }

  val qWindowFamilySql: String =
    """SELECT c_custkey, c_nationkey,
      |  lag(c_custkey, 1) OVER w AS prev_cust,
      |  lead(c_custkey, 1) OVER w AS next_cust,
      |  dense_rank() OVER w AS drnk,
      |  ntile(4) OVER w AS quartile,
      |  cume_dist() OVER w AS cdist
      |FROM customer WHERE c_nationkey < 5
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""".stripMargin

  /** Collection functions over token arrays (size/sort/first/last/contains/
    * slice/distinct) with scalar outputs for oracle parity. */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    Tables(spark, dir).documents.select(
      col("doc_id"),
      size(toks).cast("bigint").as("n"),
      size(array_distinct(toks)).cast("bigint").as("n_distinct"),
      element_at(array_sort(array_distinct(toks)), 1).as("first_sorted"),
      element_at(array_sort(array_distinct(toks)), -1).as("last_sorted"),
      array_contains(toks, "spark").as("has_spark"),
      concat_ws(",", slice(array_sort(array_distinct(toks)), 1, 3)).as("top3"))
  }

  val qArrayFuncsSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, toks, list_sort(list_distinct(toks)) AS st FROM t)
      |SELECT doc_id, len(toks) AS n, len(st) AS n_distinct,
      |  st[1] AS first_sorted, st[-1] AS last_sorted,
      |  list_contains(toks, 'spark') AS has_spark,
      |  array_to_string(st[1:3], ',') AS top3
      |FROM s""".stripMargin

  /** Correlated SCALAR subquery through the SQL path — orders costing more
    * than twice their customer's average — exercising Catalyst's subquery
    * decorrelation (RewriteCorrelatedScalarSubquery → agg + join), which
    * the DataFrame-built gates never touch. The comparison is restated in
    * exact integer cents (price·100 longs; cnt·cents vs 2·sum) so no
    * per-group double average decides a row. */
  def qCorrelatedScalar(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderkey
        |FROM orders o
        |WHERE CAST(floor(o_totalprice * 100) AS BIGINT) *
        |      (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |      > 2 * (SELECT sum(CAST(floor(o2.o_totalprice * 100) AS BIGINT))
        |             FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
  }

  val qCorrelatedScalarSql: String =
    """SELECT o_orderkey
      |FROM orders o
      |WHERE CAST(floor(o_totalprice * 100) AS BIGINT) *
      |      (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |      > 2 * (SELECT sum(CAST(floor(o2.o_totalprice * 100) AS BIGINT))
      |             FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin

  /** EXISTS + NOT EXISTS correlated predicates through the SQL path
    * (decorrelated to semi + anti joins): customers who have ordered but
    * never above 400k. */
  def qExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.createOrReplaceTempView("customer")
    t.orders.createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_custkey
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 400000.0)""".stripMargin)
  }

  val qExistsSubquerySql: String =
    """SELECT c_custkey
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 400000.0)""".stripMargin

  /** Correlated LATERAL subquery — per nation, its two wealthiest
    * customers through the SQL front door (the top-n-per-group shape as a
    * lateral join rather than a window; Spark plans a decorrelated
    * rank-filtered join). Deterministic order: (acctbal DESC, custkey). */
  def qLateralTopn(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.nation.createOrReplaceTempView("nation")
    t.customer.createOrReplaceTempView("customer")
    spark.sql(
      """SELECT n.n_name, c.c_custkey, c.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c""".stripMargin)
  }

  val qLateralTopnSql: String =
    """SELECT n.n_name, c.c_custkey, c.c_acctbal
      |FROM nation n,
      |LATERAL (SELECT c_custkey, c_acctbal FROM customer
      |         WHERE c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_correlated_scalar" -> ((qCorrelatedScalar _, Some(qCorrelatedScalarSql))),
    "q_exists_subquery"   -> ((qExistsSubquery _, Some(qExistsSubquerySql))),
    "q_lateral_topn"      -> ((qLateralTopn _, Some(qLateralTopnSql))),
    "q11_concentration" -> ((q11Concentration _, Some(q11Sql))),
    "q16_supplier_reach" -> ((q16SupplierReach _, Some(q16Sql))),
    "q_window_family"   -> ((qWindowFamily _, Some(qWindowFamilySql))),
    "q_array_funcs"     -> ((qArrayFuncs _, Some(qArrayFuncsSql))),
    "q4_late_orders"    -> ((q4LateOrders _, Some(q4Sql))),
    "q7_nation_volume"  -> ((q7NationVolume _, Some(q7Sql))),
    "q8_market_share"   -> ((q8MarketShare _, Some(q8Sql))),
    "q9_profit"         -> ((q9Profit _, Some(q9Sql))),
    "q13_custdist"      -> ((q13CustDist _, Some(q13Sql))),
    "q15_top_supplier"  -> ((q15TopSupplier _, Some(q15Sql))),
    "q17_small_qty"     -> ((q17SmallQty _, Some(q17Sql))),
    "q10_returned"      -> ((q10Returned _, Some(q10Sql))),
    "q14_promo_share"   -> ((q14PromoShare _, Some(q14Sql))),
    "q18_large_orders"  -> ((q18LargeOrders _, Some(q18Sql))),
    "q19_or_predicates" -> ((q19OrPredicates _, Some(q19Sql))),
    "q22_idle_customers" -> ((q22IdleCustomers _, Some(q22Sql))),
  )
}
