package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The relational star-schema family as SPARK SQL text — the spellings
  * a SQL-first warehouse user runs over the registered TPC-H-ish views,
  * completing the SQL entry surface across every domain (graph, events,
  * text, dedup, ML, and now relational). Each spelling is pinned to its
  * [[Sales]] DataFrame twin by GraphSqlSpec's sweep: canonicalized
  * physical-plan EQUALITY plus result agreement, so SQL users inherit
  * the exact plans — broadcast dims, narrow pre-projected shuffles,
  * TakeOrderedAndProject top-k merges, hash semi/anti joins — with no
  * second plan to maintain.
  *
  * Spelling disciplines (the [[graft.text.TextSql]] rules, plus the
  * relational ones):
  *  - money literals carry the `D` suffix (`1.0`/`100.0`/`0.5` alone
  *    parse as DECIMAL in Spark SQL and would change the cents
  *    arithmetic, not just the plan);
  *  - broadcast intent is a `/*+ BROADCAST(name) */` hint in the query
  *    block whose FROM holds the relation the DSL wrapped in
  *    `broadcast(...)` (Spark only parses hints directly after SELECT);
  *  - the DSL's narrowing pre-projections (`.select` before a join)
  *    are written as subqueries so the analyzed tree — and therefore
  *    every optimizer decision downstream — is the same;
  *  - `LEFT SEMI JOIN` / `LEFT ANTI JOIN` are spelled directly (the
  *    EXISTS/NOT-EXISTS rewrites land in the same place, but the
  *    direct form keeps the analyzed trees identical, not just the
  *    optimized ones).
  */
object SalesSql {

  /** Register the relational fixture tables for the SQL entries. */
  def registerSales(spark: SparkSession, sfDir: String): Unit =
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region",
      "part").foreach { t =>
      graft.Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** SQL twin of `Sales.revCents` — identical IEEE op order, double
    * literals suffixed so nothing parses as DECIMAL. */
  private val revCents =
    "CAST(floor(l_extendedprice * (1.0D - l_discount) * 100.0D + 0.5D) AS BIGINT)"
  private val baseCents =
    "CAST(floor(l_extendedprice * 100.0D + 0.5D) AS BIGINT)"
  private val qtyLong =
    "CAST(floor(l_quantity + 0.5D) AS BIGINT)"

  /** Spark-SQL twin of [[Sales.pricingSummary]]. */
  def pricingSummarySparkSql(cutoff: String = Sales.PricingCutoff): String =
    s"""SELECT l_returnflag, l_linestatus, sum_qty, sum_base_cents,
       |  sum_disc_cents, n_items,
       |  (sum_qty * 1000000L) div n_items AS avg_qty_millionths
       |FROM (
       |  SELECT l_returnflag, l_linestatus,
       |    sum($qtyLong) AS sum_qty,
       |    sum($baseCents) AS sum_base_cents,
       |    sum($revCents) AS sum_disc_cents,
       |    count(1) AS n_items
       |  FROM lineitem
       |  WHERE l_shipdate <= to_timestamp('$cutoff')
       |  GROUP BY l_returnflag, l_linestatus
       |)""".stripMargin

  /** Spark-SQL twin of [[Sales.orderSizes]]. */
  def orderSizesSparkSql: String =
    s"""SELECT n_lines, count(1) AS n_orders
       |FROM (
       |  SELECT l_orderkey, count(1) AS n_lines
       |  FROM lineitem GROUP BY l_orderkey
       |)
       |GROUP BY n_lines""".stripMargin

  /** Spark-SQL twin of [[Sales.brandRevenue]] — no broadcast hint by
    * design: the part dim grows with the corpus, and both spellings
    * leave the broadcast-vs-shuffle call to the planner's threshold. */
  def brandRevenueSparkSql: String =
    s"""SELECT p_brand, sum(cents) AS revenue_cents, sum(qty) AS sum_qty,
       |  count(1) AS n_items
       |FROM (
       |  SELECT l_partkey, $revCents AS cents, $qtyLong AS qty
       |  FROM lineitem
       |)
       |JOIN (SELECT p_partkey, p_brand FROM part)
       |  ON l_partkey = p_partkey
       |GROUP BY p_brand""".stripMargin

  /** Spark-SQL twin of [[Sales.segmentRevenue]]. */
  def segmentRevenueSparkSql: String =
    s"""SELECT c_mktsegment, sum(order_cents) AS revenue_cents,
       |  sum(order_items) AS n_items, count(1) AS n_orders
       |FROM (
       |  SELECT c_mktsegment, o_orderkey, sum(cents) AS order_cents,
       |    count(1) AS order_items
       |  FROM (
       |    SELECT l_orderkey, $revCents AS cents FROM lineitem
       |  )
       |  JOIN (SELECT o_orderkey, o_custkey FROM orders)
       |    ON l_orderkey = o_orderkey
       |  JOIN (SELECT c_custkey, c_mktsegment FROM customer)
       |    ON o_custkey = c_custkey
       |  GROUP BY c_mktsegment, o_orderkey
       |)
       |GROUP BY c_mktsegment""".stripMargin

  /** Spark-SQL twin of [[Sales.customersWithoutOrders]]. */
  def customersWithoutOrdersSparkSql: String =
    s"""SELECT c_mktsegment, count(1) AS n_customers
       |FROM (
       |  SELECT c_custkey, c_mktsegment FROM customer
       |)
       |LEFT ANTI JOIN (SELECT o_custkey FROM orders)
       |  ON c_custkey = o_custkey
       |GROUP BY c_mktsegment""".stripMargin

  /** Spark-SQL twin of [[Sales.lateOrderPriority]]. */
  def lateOrderPrioritySparkSql(lateDays: Int = Sales.LateDays): String =
    s"""SELECT o_orderpriority, count(1) AS n_orders
       |FROM orders
       |LEFT SEMI JOIN lineitem
       |  ON o_orderkey = l_orderkey
       |  AND l_shipdate > o_orderdate + INTERVAL $lateDays DAYS
       |GROUP BY o_orderpriority""".stripMargin

  /** Spark-SQL twin of [[Sales.salesRollup]]. */
  def salesRollupSparkSql: String =
    s"""SELECT /*+ BROADCAST(supplier), BROADCAST(nation), BROADCAST(region) */
       |  r_name, n_name, grouping_id() AS lvl, count(1) AS n_items,
       |  sum($revCents) AS revenue_cents
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** Spark-SQL twin of [[Sales.topSuppliersPerRegion]]. */
  def topSuppliersPerRegionSparkSql(k: Int = Sales.TopK): String =
    s"""SELECT * FROM (
       |  SELECT r_name, s_suppkey, s_name, revenue_cents,
       |    CAST(row_number() OVER (PARTITION BY r_name
       |      ORDER BY revenue_cents DESC, s_suppkey) AS BIGINT) AS rk
       |  FROM (
       |    SELECT /*+ BROADCAST(supplier), BROADCAST(nation), BROADCAST(region) */
       |      r_name, s_suppkey, s_name, sum($revCents) AS revenue_cents
       |    FROM lineitem
       |    JOIN supplier ON l_suppkey = s_suppkey
       |    JOIN nation ON s_nationkey = n_nationkey
       |    JOIN region ON n_regionkey = r_regionkey
       |    GROUP BY r_name, s_suppkey, s_name
       |  )
       |)
       |WHERE rk <= $k""".stripMargin

  /** Spark-SQL twin of [[Sales.shippingPriority]]. */
  def shippingPrioritySparkSql(k: Int = Sales.PriorityTopK): String =
    s"""SELECT /*+ BROADCAST(c) */ l_orderkey, sum(cents) AS revenue_cents
       |FROM (
       |  SELECT l_orderkey, $revCents AS cents FROM lineitem
       |  WHERE l_shipdate > to_timestamp('${Sales.PriorityDate}')
       |)
       |JOIN (
       |  SELECT o_orderkey, o_custkey FROM orders
       |  WHERE o_orderdate < to_timestamp('${Sales.PriorityDate}')
       |) ON l_orderkey = o_orderkey
       |JOIN (
       |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       |) c ON o_custkey = c_custkey
       |GROUP BY l_orderkey
       |ORDER BY revenue_cents DESC, l_orderkey ASC
       |LIMIT $k""".stripMargin

  /** Spark-SQL twin of [[Sales.returnedRevenue]]. */
  def returnedRevenueSparkSql(k: Int = Sales.ReturnedTopK): String =
    s"""SELECT c_custkey, c_name, c_mktsegment, revenue_cents
       |FROM (
       |  SELECT o_custkey AS c_custkey, sum(cents) AS revenue_cents
       |  FROM (
       |    SELECT l_orderkey, $revCents AS cents FROM lineitem
       |    WHERE l_returnflag = 'R'
       |  )
       |  JOIN (
       |    SELECT o_orderkey, o_custkey FROM orders
       |    WHERE o_orderdate >= to_timestamp('1999-10-01 00:00:00')
       |      AND o_orderdate < to_timestamp('2000-01-01 00:00:00')
       |  ) ON l_orderkey = o_orderkey
       |  GROUP BY o_custkey
       |  ORDER BY revenue_cents DESC, c_custkey ASC
       |  LIMIT $k
       |)
       |JOIN (SELECT c_custkey, c_name, c_mktsegment FROM customer)
       |  USING (c_custkey)""".stripMargin

  /** Spark-SQL twin of [[Sales.localSupplierVolume]]. */
  def localSupplierVolumeSparkSql: String =
    s"""SELECT /*+ BROADCAST(s), BROADCAST(nation), BROADCAST(r) */
       |  n_name, sum(cents) AS revenue_cents
       |FROM (
       |  SELECT l_orderkey, l_suppkey, $revCents AS cents FROM lineitem
       |)
       |JOIN (
       |  SELECT o_orderkey, o_custkey FROM orders
       |  WHERE o_orderdate >= to_timestamp('1999-01-01 00:00:00')
       |    AND o_orderdate < to_timestamp('2000-01-01 00:00:00')
       |) ON l_orderkey = o_orderkey
       |JOIN (
       |  SELECT s_suppkey, s_nationkey FROM supplier
       |) s ON l_suppkey = s_suppkey
       |JOIN (
       |  SELECT c_custkey, c_nationkey FROM customer
       |) ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN (
       |  SELECT * FROM region WHERE r_name = 'ASIA'
       |) r ON n_regionkey = r_regionkey
       |GROUP BY n_name""".stripMargin
}
