package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query core (SURVEY §2.1).
  *
  * Design rules for 100 TB:
  *   - dimension tables (region/nation/supplier, and customer vs lineitem)
  *     are broadcast explicitly so the fact table never shuffles for them;
  *   - aggregates go through partial (map-side) aggregation — plain
  *     groupBy.agg, no distinct-on-fact unless keyed;
  *   - top-k uses orderBy.limit which Spark plans as TakeOrderedAndProject
  *     (per-partition heap + driver merge, no global sort);
  *   - double aggregates are rounded post-agg for oracle hash stability.
  */
object Relational {

  private def disc(c: Column, d: Column): Column = c * (lit(1.0) - d)

  /** TPC-H Q1-style pricing summary: one scan, one shuffle, partial aggs. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir).lineitem
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(disc(col("l_extendedprice"), col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(disc(col("l_extendedprice"), col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 2) AS avg_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: selective dim (customer) broadcast into orders, then
    * one shuffle join with lineitem, agg, top-10 heap. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t.orders.filter(col("o_orderdate") < lit("1998-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = t.lineitem.filter(col("l_shipdate") > lit("1998-03-15"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer (selective dim) broadcasts into orders; orders⋈lineitem is
    // fact⋈fact → keyed shuffle join, AQE-coalesced. Never broadcast a fact.
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(disc(col("l_extendedprice"), col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style 6-way join: all dims broadcast, the only shuffles are
    * lineitem⋈orders (keyed) and the final group-by. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val dims = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_nationkey"), col("n_name"))
    val sup = t.supplier.select(col("s_suppkey"), col("s_nationkey"))
    val ord = t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey")
    // lineitem⋈orders stays a keyed shuffle join (both facts at scale).
    // customer/supplier sides are left unhinted: AQE broadcasts them while
    // they fit and falls back to shuffle joins at 100 TB. Only nation/region
    // (inside `dims`) are force-broadcast — they are always tiny.
    t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .join(sup,
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(disc(col("l_extendedprice"), col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc)
  }

  val q5Sql: String =
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY revenue DESC""".stripMargin

  /** TPC-H Q6-style scalar agg: pure scan+filter+partial-agg, zero joins. */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  val q6Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Filter + projection — the oracle also checks pushdown doesn't change
    * results; plan must show PushedFilters + 3-column ReadSchema. */
  def qFilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"))

  val qFilterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
      |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin

  /** Sort+limit → TakeOrderedAndProject (no global sort at scale). */
  def qSortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  val qSortLimitSql: String =
    """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Distinct = partial-aggregated dropDuplicates. */
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders.select("o_orderstatus", "o_orderpriority").distinct()

  val qDistinctSql: String =
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"

  /** Window rank within partition (single shuffle on the partition key). */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(spark, dir).customer
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("c_acctbal"),
        rank().over(w).cast("bigint").as("rnk"))
      .filter(col("rnk") <= 3)
  }

  val qWindowRankSql: String =
    """SELECT * FROM (
      |  SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal,
      |    rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer) WHERE rnk <= 3""".stripMargin

  /** Union + agg — unionByName keeps schema alignment explicit. */
  def qUnionAll(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val a = t.customer.select(col("c_nationkey").as("nationkey"))
    val b = t.supplier.select(col("s_nationkey").as("nationkey"))
    a.unionByName(b).groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
  }

  val qUnionAllSql: String =
    """SELECT nationkey, count(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
      |GROUP BY nationkey""".stripMargin

  /** Left-semi join (EXISTS): broadcast the filtered probe side. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    t.customer.join(urgent, col("c_custkey") === col("o_custkey"), "leftsemi")
      .select("c_custkey", "c_name")
  }

  val qSemiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin

  /** Left-anti join (NOT EXISTS). */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val f = t.orders.filter(col("o_orderstatus") === "F").select("o_custkey")
    t.customer.join(f, col("c_custkey") === col("o_custkey"), "leftanti")
      .select("c_custkey", "c_name")
  }

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin

  /** Pivot-style conditional aggregation — one pass, no pivot shuffle. */
  def qConditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(when(col("l_linestatus") === "F", col("l_quantity")).otherwise(0.0)), 2).as("qty_f"),
        round(sum(when(col("l_linestatus") === "O", col("l_quantity")).otherwise(0.0)), 2).as("qty_o"),
        count(when(col("l_discount") > 0.05, lit(1))).as("n_discounted"))

  val qConditionalAggSql: String =
    """SELECT l_returnflag,
      |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_f,
      |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_o,
      |  count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** HAVING = agg + post-aggregate filter (Catalyst pushes nothing here;
    * the filter runs on the already-reduced side). */
  def qHaving(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .filter(col("n_orders") >= 12)

  val qHavingSql: String =
    """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY o_custkey HAVING count(*) >= 12""".stripMargin

  /** Multi-stat agg incl. distinct count (Spark plans expand+2-phase). */
  def qAggStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).customer
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        round(min(col("c_acctbal")), 2).as("min_bal"),
        round(max(col("c_acctbal")), 2).as("max_bal"),
        round(stddev_samp(col("c_acctbal")), 2).as("sd_bal"))

  val qAggStatsSql: String =
    """SELECT c_mktsegment, count(*) AS n,
      |  count(DISTINCT c_nationkey) AS n_nations,
      |  round(min(c_acctbal), 2) AS min_bal,
      |  round(max(c_acctbal), 2) AS max_bal,
      |  round(stddev_samp(c_acctbal), 2) AS sd_bal
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  /** Rollup (grouping sets) — single expand + one shuffle. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.nation.join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"))
  }

  val qRollupSql: String =
    """SELECT r_name, n_name, count(*) AS n
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** CUBE: all grouping-set combinations (the rollup sibling — partial
    * aggregation still map-side; the grouping-set expansion multiplies
    * rows by 2^dims BEFORE the exchange, a constant factor). */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
  }

  val qCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** PIVOT: per-user event counts widened by event type — Spark's
    * relational pivot; the oracle states the equivalent conditional
    * aggregation (one groupBy either way, map-side partials). */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("user_id"))
      .pivot(col("event_type"), Seq("view", "click", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  val qPivotSql: String =
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'view') AS view,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'error') AS error
      |FROM events GROUP BY user_id""".stripMargin

  /** UNPIVOT (melt — the pivot dual): per-user wide event counts back to
    * long (user_id, event_type, n) form, dropping the zero-filled cells
    * the pivot manufactured. Map-side row expansion, no shuffle beyond
    * the pivot's own aggregation. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    qPivot(spark, dir)
      .unpivot(Array(col("user_id")),
        Array(col("view"), col("click"), col("purchase"), col("signup"), col("error")),
        "event_type", "n")
      .filter(col("n") > 0)

  val qUnpivotSql: String =
    """WITH p AS (SELECT user_id,
      |  count(*) FILTER (event_type = 'view') AS view,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'error') AS error
      |FROM events GROUP BY user_id)
      |SELECT user_id, event_type, n FROM (
      |  SELECT user_id, 'view' AS event_type, view AS n FROM p
      |  UNION ALL SELECT user_id, 'click', click FROM p
      |  UNION ALL SELECT user_id, 'purchase', purchase FROM p
      |  UNION ALL SELECT user_id, 'signup', signup FROM p
      |  UNION ALL SELECT user_id, 'error', error FROM p)
      |WHERE n > 0""".stripMargin

  /** INTERSECT (set semantics): nations that appear both as customer and
    * supplier home nations — Spark plans a left-semi over distincts. */
  def qIntersect(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_nationkey").as("nationkey"))
      .intersect(t.supplier.select(col("s_nationkey").as("nationkey")))
  }

  val qIntersectSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin

  /** EXCEPT (set semantics): customer nations with no supplier. */
  def qExcept(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_nationkey").as("nationkey"))
      .except(t.supplier.select(col("s_nationkey").as("nationkey")))
  }

  val qExceptSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin

  /** Explicit GROUPING SETS — the general form rollup/cube specialize:
    * per-status totals, per-priority totals, and the grand total, without
    * the cross combinations cube would add. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  val qGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** Group-wise max (top-1 per group) via row_number — the scalable idiom
    * for "correlated max" subqueries. */
  def qGroupwiseMax(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(spark, dir).customer
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_nationkey"), col("c_custkey"), round(col("c_acctbal"), 2).as("best_bal"))
  }

  val qGroupwiseMaxSql: String =
    """SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS best_bal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer) WHERE rn = 1""".stripMargin

  /** Exact percentiles (linear interpolation — same definition as the
    * oracle's quantile_cont), plus a non-binary fraction (p95) carried as
    * an exact integer numerator via order statistics over a value
    * histogram (l_quantity is integral in the data), the technique from
    * qTokenStats: p95_qty_x20 = 20 * p95, BIGINT, no float op anywhere. */
  def qPercentile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    // Two scans by choice: med/p75 in one native aggregate pass, p95 via the
    // histogram pass. Folding med into the histogram would not reduce scan
    // count (p75 is over l_extendedprice, which is non-integral and needs
    // the native aggregate anyway) — it would only trade a join for a join.
    val native = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_extendedprice, 0.75)").as("p75_price"))
    val p95 = intOrderStatNumerator(
      li.select(col("l_returnflag"), col("l_quantity").cast("bigint").as("v")),
      "l_returnflag", 19, 20).withColumnRenamed("px", "p95_qty_x20")
    native.join(p95, "l_returnflag")
  }

  /** Exact (num/den)-quantile numerator per key over df(key, v: bigint):
    * returns (key, px) where px = den * quantile_cont(v, num/den), BIGINT.
    * Histogram order statistics — the shuffle carries (key, v, count), the
    * windows run over distinct values only.
    *
    * Precondition: v must already BE integral — callers cast a column that
    * holds whole numbers (l_quantity, token counts); a fractional input
    * would be silently truncated by that cast and diverge from the oracle.
    * Nulls are dropped here to match quantile_cont, which skips them —
    * unfiltered they would sort below every value and shift every rank. */
  private def intOrderStatNumerator(df: DataFrame, key: String, num: Int, den: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key).orderBy("v")
    // unbounded frame on the same ordered spec: one Window operator, one
    // sort pass over the histogram
    val wAll = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val cum = df.filter(col("v").isNotNull)
      .groupBy(col(key), col("v")).agg(count(lit(1)).as("c"))
      .withColumn("hi", sum(col("c")).over(w))
      .withColumn("lo", col("hi") - col("c"))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("i", expr(s"($num * (n - 1)) div $den"))
      .withColumn("r", expr(s"($num * (n - 1)) % $den"))
      .withColumn("ihi", col("i") + when(col("r") > 0, 1).otherwise(0))
    cum.groupBy(col(key), col("r"))
      .agg(max(when(col("i") >= col("lo") && col("i") < col("hi"), col("v"))).as("vlo"),
        max(when(col("ihi") >= col("lo") && col("ihi") < col("hi"), col("v"))).as("vhi"))
      .select(col(key),
        (col("vlo") * (lit(den.toLong) - col("r")) + col("vhi") * col("r")).cast("bigint").as("px"))
  }

  // med/p75 stay native doubles: quarter-fraction position and weight are
  // exact in IEEE (one formula-dependent rounding remains, which the
  // driver has confirmed green since r5). p95 — the fraction that broke
  // q_token_stats — is all-integer, immune to any engine float internals.
  val qPercentileSql: String =
    """WITH d AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v FROM lineitem),
      |h AS (SELECT l_returnflag, v, count(*) AS c FROM d GROUP BY 1, 2),
      |cum AS (SELECT l_returnflag, v,
      |        sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS hi,
      |        sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) - c AS lo,
      |        sum(c) OVER (PARTITION BY l_returnflag) AS n FROM h),
      |j AS (SELECT cum.*, (19 * (n - 1)) // 20 AS i, (19 * (n - 1)) % 20 AS r,
      |        (19 * (n - 1)) // 20 + (CASE WHEN (19 * (n - 1)) % 20 > 0 THEN 1 ELSE 0 END) AS ihi
      |      FROM cum),
      |p AS (SELECT l_returnflag, r,
      |        max(CASE WHEN i >= lo AND i < hi THEN v END) AS vlo,
      |        max(CASE WHEN ihi >= lo AND ihi < hi THEN v END) AS vhi
      |      FROM j GROUP BY 1, 2),
      |q AS (SELECT l_returnflag,
      |        quantile_cont(l_quantity, 0.5) AS med_qty,
      |        quantile_cont(l_extendedprice, 0.75) AS p75_price
      |      FROM lineitem GROUP BY 1)
      |SELECT q.l_returnflag, q.med_qty, q.p75_price,
      |  CAST(p.vlo * (20 - p.r) + p.vhi * p.r AS BIGINT) AS p95_qty_x20
      |FROM q JOIN p USING (l_returnflag)""".stripMargin

  /** Exact order statistics on a DOUBLE column (l_extendedprice — ~all
    * values distinct, the case [[intOrderStatNumerator]]'s distinct-value
    * histogram must NOT touch: there the histogram IS the corpus).
    * Median and p99 as true stored values via histogram-bracket selection
    * (operators.Quantiles) — no global sort, no corpus window, no
    * percentile_approx. The oracle sorts and indexes: repr-exact parity
    * because the answer is a stored double, never an interpolation. */
  def qOrderStats(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.orderStatistics(
      Tables(spark, dir).lineitem, "l_extendedprice",
      Seq(("p50", 1L, 2L), ("p99", 99L, 100L)))

  val qOrderStatsSql: String =
    """WITH v AS (SELECT l_extendedprice AS v FROM lineitem
      |           WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)),
      |o AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r FROM v),
      |n AS (SELECT count(*) AS c FROM v)
      |SELECT 'p50' AS which, CAST((c - 1) // 2 AS BIGINT) AS rank, v AS value
      |  FROM o, n WHERE r = (c - 1) // 2
      |UNION ALL
      |SELECT 'p99', CAST(99 * (c - 1) // 100 AS BIGINT), v
      |  FROM o, n WHERE r = 99 * (c - 1) // 100
      |ORDER BY which""".stripMargin

  /** name → (query fn, oracle sql) */
  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q1_pricing_summary"  -> ((q1PricingSummary _, Some(q1Sql))),
    "q3_shipping_priority" -> ((q3ShippingPriority _, Some(q3Sql))),
    "q5_local_supplier"   -> ((q5LocalSupplier _, Some(q5Sql))),
    "q6_revenue"          -> ((q6Revenue _, Some(q6Sql))),
    "q_filter_project"    -> ((qFilterProject _, Some(qFilterProjectSql))),
    "q_sort_limit"        -> ((qSortLimit _, Some(qSortLimitSql))),
    "q_distinct"          -> ((qDistinct _, Some(qDistinctSql))),
    "q_window_rank"       -> ((qWindowRank _, Some(qWindowRankSql))),
    "q_union_all"         -> ((qUnionAll _, Some(qUnionAllSql))),
    "q_semi_join"         -> ((qSemiJoin _, Some(qSemiJoinSql))),
    "q_anti_join"         -> ((qAntiJoin _, Some(qAntiJoinSql))),
    "q_conditional_agg"   -> ((qConditionalAgg _, Some(qConditionalAggSql))),
    "q_having"            -> ((qHaving _, Some(qHavingSql))),
    "q_agg_stats"         -> ((qAggStats _, Some(qAggStatsSql))),
    "q_rollup"            -> ((qRollup _, Some(qRollupSql))),
    "q_cube"              -> ((qCube _, Some(qCubeSql))),
    "q_pivot"             -> ((qPivot _, Some(qPivotSql))),
    "q_intersect"         -> ((qIntersect _, Some(qIntersectSql))),
    "q_unpivot"           -> ((qUnpivot _, Some(qUnpivotSql))),
    "q_except"            -> ((qExcept _, Some(qExceptSql))),
    "q_grouping_sets"     -> ((qGroupingSets _, Some(qGroupingSetsSql))),
    "q_groupwise_max"     -> ((qGroupwiseMax _, Some(qGroupwiseMaxSql))),
    "q_percentile"        -> ((qPercentile _, Some(qPercentileSql))),
    "q_order_stats"       -> ((qOrderStats _, Some(qOrderStatsSql))),
  )
}
