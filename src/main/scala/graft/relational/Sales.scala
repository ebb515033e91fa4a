package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Star-schema analytics over the TPC-H-ish fixture tables — the
  * relational query surface (grouping sets, windowed top-k, semi-joins,
  * multi-way star joins) a warehouse user expects next to the
  * graph/text/event operators. Everything follows the engine-wide exact
  * discipline: money is integer CENTS via `floor(x·100 + 0.5)` (the
  * [[graft.events.Events]] valueCents spelling — both engines run the
  * identical IEEE ops, where `round()` half-even/half-away semantics
  * diverge), quantities are integral doubles floored the same way, and
  * averages are exact integer millionths.
  *
  * Scale shape, shared by all five: `nation`/`region` are constant-size
  * dimensions and ALWAYS broadcast; `supplier` is broadcast here and
  * stays broadcastable far up the scale curve (TPC-H sf10k has 100M
  * suppliers ≈ a few GB — borderline; the spelling degrades to a
  * shuffle join automatically if the broadcast threshold says no);
  * `customer`/`orders` joins run as shuffle equi-joins on their keys —
  * at 100 TB those dims are fact-sized and co-partitioning, not
  * broadcast, is the plan. Aggregations are all partial-agg shuffles on
  * low-cardinality keys.
  */
object Sales {

  /** Exact integer cents of the discounted line price:
    * floor(extprice·(1−disc)·100 + 0.5), the engine-wide money
    * discipline. */
  private val revCents: Column =
    floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0)
      + lit(0.5)).cast("long")

  private val baseCents: Column =
    floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")

  /** SQL twin of [[revCents]] — identical op order. */
  private val revCentsSql =
    "CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)"
  private val baseCentsSql =
    "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"

  /** Revenue by region and nation with ROLLUP — the grouping-sets
    * operator surface: one pass emits the (region, nation) cells, the
    * per-region subtotals, and the grand total, tagged by
    * `grouping_id` (`lvl` 0 = cell, 1 = region subtotal, 3 = grand
    * total) so subtotal rows can't be confused with a NULL dimension
    * value. Catalyst expands the rollup into a single Expand +
    * partial-agg — one shuffle for all three granularities, vs three
    * scans if a client issued the levels separately.
    *
    * Scale shape: lineitem → supplier is the only fact-side join and
    * the supplier/nation/region chain broadcasts; the aggregate keys
    * are ≤ |regions|·|nations| cells ×3 grouping levels. */
  def salesRollup(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(grouping_id().as("lvl"),
        count(lit(1)).as("n_items"),
        sum(revCents).as("revenue_cents"))
      .select(col("r_name"), col("n_name"), col("lvl"), col("n_items"),
        col("revenue_cents"))

  /** Oracle twin of [[salesRollup]]. */
  def salesRollupSql: String =
    s"""SELECT r_name, n_name,
       |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS lvl,
       |  CAST(count(*) AS BIGINT) AS n_items,
       |  CAST(sum($revCentsSql) AS BIGINT) AS revenue_cents
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY r_name, n_name, lvl, n_items, revenue_cents""".stripMargin

  /** Per-region revenue leaders — the windowed top-k every BI layer
    * asks for: suppliers ranked by revenue within their region,
    * top [[TopK]] kept. `row_number` over (revenue DESC, s_suppkey) —
    * the key tie-break makes the cut deterministic, the engine-wide
    * requirement for an oracle-gated ranking.
    *
    * Scale shape: one partial-agg shuffle to (region, supplier) cells
    * (≤ |suppliers| rows — the window never sees raw lineitem), then
    * the rank window partitions by region. At extreme supplier counts
    * the top-k-per-group rewrite (partial top-k per partition before
    * the window) applies; at any realistic |suppliers| the grouped
    * relation is already small. */
  def topSuppliersPerRegion(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame, k: Int = TopK): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("r_name")
      .orderBy(col("revenue_cents").desc, col("s_suppkey"))
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("s_suppkey"), col("s_name"))
      .agg(sum(revCents).as("revenue_cents"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Rows kept per region by [[topSuppliersPerRegion]]. */
  val TopK: Int = 3

  /** Oracle twin of [[topSuppliersPerRegion]]. */
  def topSuppliersPerRegionSql(k: Int = TopK): String =
    s"""WITH cells AS (
       |  SELECT r_name, s_suppkey, s_name,
       |    CAST(sum($revCentsSql) AS BIGINT) AS revenue_cents
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  GROUP BY r_name, s_suppkey, s_name
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY r_name
       |    ORDER BY revenue_cents DESC, s_suppkey) AS BIGINT) AS rk
       |  FROM cells
       |)
       |SELECT r_name, s_suppkey, s_name, revenue_cents, rk
       |FROM ranked WHERE rk <= $k
       |ORDER BY r_name, s_suppkey, s_name, revenue_cents, rk""".stripMargin

  /** Ship-date cutoff for [[pricingSummary]] — a literal the planner
    * pushes into the parquet scan (plan-audited). */
  val PricingCutoff: String = "2000-01-01 00:00:00"

  /** The TPC-H Q1 shape — per (returnflag, linestatus) over lines
    * shipped before [[PricingCutoff]]: quantities, base and discounted
    * cents, counts, and the exact-millionths average quantity. The
    * workhorse scan-heavy aggregate every warehouse benches first; the
    * cutoff exercises timestamp predicate pushdown into the scan.
    *
    * Scale shape: scan + filter-at-scan + one partial-agg shuffle to
    * ≤ |flags|·|statuses| groups — the optimal plan for this query at
    * any scale; nothing else to choose. */
  def pricingSummary(lineitem: DataFrame,
      cutoff: String = PricingCutoff): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit(cutoff)))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(floor(col("l_quantity") + lit(0.5)).cast("long")).as("sum_qty"),
        sum(baseCents).as("sum_base_cents"),
        sum(revCents).as("sum_disc_cents"),
        count(lit(1)).as("n_items"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_base_cents"), col("sum_disc_cents"), col("n_items"),
        expr("(sum_qty * 1000000L) div n_items").as("avg_qty_millionths"))

  /** Oracle twin of [[pricingSummary]]. */
  def pricingSummarySql(cutoff: String = PricingCutoff): String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
       |  CAST(sum($baseCentsSql) AS BIGINT) AS sum_base_cents,
       |  CAST(sum($revCentsSql) AS BIGINT) AS sum_disc_cents,
       |  CAST(count(*) AS BIGINT) AS n_items,
       |  CAST((sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) * 1000000)
       |    // count(*) AS BIGINT) AS avg_qty_millionths
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '$cutoff'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus, sum_qty, sum_base_cents,
       |  sum_disc_cents, n_items, avg_qty_millionths""".stripMargin

  /** Days after order date that makes a shipment "late" for
    * [[lateOrderPriority]]. */
  val LateDays: Int = 60

  /** The TPC-H Q4 shape — orders with at least one line shipped more
    * than [[LateDays]] days after the order date, counted per order
    * priority: the EXISTS/semi-join operator surface, with a compound
    * condition (key equality + a cross-table range predicate) that must
    * stay a HASH semi-join on the key, never a nested loop (the range
    * term rides as a join filter).
    *
    * Scale shape: one orderkey-keyed LEFT SEMI shuffle join (both
    * sides hash-partition on the key; the semi stops each order at its
    * first late line, so nothing fans out), then a ≤|priorities|
    * partial agg. */
  def lateOrderPriority(orders: DataFrame, lineitem: DataFrame,
      lateDays: Int = LateDays): DataFrame =
    orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  /** Oracle twin of [[lateOrderPriority]]. */
  def lateOrderPrioritySql(lateDays: Int = LateDays): String =
    s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
       |FROM orders
       |WHERE EXISTS (
       |  SELECT 1 FROM lineitem
       |  WHERE l_orderkey = o_orderkey
       |    AND l_shipdate > o_orderdate + INTERVAL $lateDays DAY)
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority, n_orders""".stripMargin

  /** Revenue by customer market segment — the three-table star join
    * (lineitem → orders → customer) resolved to the segment rollup,
    * with the exact distinct-order count per segment.
    *
    * Scale shape: both joins are shuffle equi-joins on their
    * fact-sized keys (orders and customer grow with the corpus — at
    * 100 TB neither broadcasts; co-partitioning on
    * orderkey/custkey is the plan, and AQE handles the skewed
    * customers). The distinct-order count collapses via the two-level
    * (segment, orderkey) partial agg, never a full-row distinct. */
  def segmentRevenue(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), revCents.as("cents"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderkey"))
      .agg(sum(col("cents")).as("order_cents"),
        count(lit(1)).as("order_items"))
      .groupBy(col("c_mktsegment"))
      .agg(sum("order_cents").as("revenue_cents"),
        sum("order_items").as("n_items"),
        count(lit(1)).as("n_orders"))

  /** Revenue and volume per part brand — the fact-to-growing-dimension
    * join (`part` scales with the corpus, unlike nation/region): a
    * SHUFFLE equi-join on the part key, deliberately not broadcast —
    * at 100 TB `part` is hundreds of millions of rows, and the
    * partkey hash partitioning (plus AQE for the popular-part skew) is
    * the plan that survives. Both sides pre-project to the joined
    * columns so the shuffle carries 3 columns, not the tables.
    *
    * Scale shape: one key-partitioned shuffle join + one ≤|brands|
    * partial agg. */
  def brandRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.select(col("l_partkey"), revCents.as("cents"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("qty"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum("cents").as("revenue_cents"),
        sum("qty").as("sum_qty"),
        count(lit(1)).as("n_items"))

  /** Lines-per-order distribution — the order-size histogram (the
    * [[graft.graph.GraphPatterns]] degree-histogram idiom on the fact
    * table): how many orders carry n lines, the one-glance shape check
    * before sizing any per-order window or pack.
    *
    * Scale shape: two chained partial-agg shuffles, the second over
    * ≤ max-lines-per-order groups. */
  def orderSizes(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
      .groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"))

  /** Oracle twin of [[orderSizes]]. */
  def orderSizesSql: String =
    s"""SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
       |FROM (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
       |      FROM lineitem GROUP BY l_orderkey)
       |GROUP BY n_lines
       |ORDER BY n_lines, n_orders""".stripMargin

  /** Customers who never ordered, counted per market segment — the
    * LEFT ANTI join surface (the NOT EXISTS every warehouse audit
    * runs): `customer` minus the order-holding key set, rolled up to
    * ≤\|segments\| rows. The anti join carries only the 8-byte custkey
    * on its probe side.
    *
    * Scale shape: one custkey-keyed anti shuffle join (the orders side
    * pre-projects to the bare key — a semi/anti build side never needs
    * payload columns) + one tiny partial agg. */
  def customersWithoutOrders(customer: DataFrame,
      orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"), col("c_mktsegment"))
      .join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))

  /** Oracle twin of [[customersWithoutOrders]]. */
  def customersWithoutOrdersSql: String =
    s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
       |FROM customer
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM orders WHERE o_custkey = c_custkey)
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment, n_customers""".stripMargin

  /** Oracle twin of [[brandRevenue]]. */
  def brandRevenueSql: String =
    s"""SELECT p_brand,
       |  CAST(sum($revCentsSql) AS BIGINT) AS revenue_cents,
       |  CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
       |  CAST(count(*) AS BIGINT) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand
       |ORDER BY p_brand, revenue_cents, sum_qty, n_items""".stripMargin

  /** Oracle twin of [[segmentRevenue]]. */
  def segmentRevenueSql: String =
    s"""WITH per_order AS (
       |  SELECT c_mktsegment, o_orderkey,
       |    CAST(sum($revCentsSql) AS BIGINT) AS order_cents,
       |    CAST(count(*) AS BIGINT) AS order_items
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  GROUP BY c_mktsegment, o_orderkey
       |)
       |SELECT c_mktsegment,
       |  CAST(sum(order_cents) AS BIGINT) AS revenue_cents,
       |  CAST(sum(order_items) AS BIGINT) AS n_items,
       |  CAST(count(*) AS BIGINT) AS n_orders
       |FROM per_order GROUP BY c_mktsegment
       |ORDER BY c_mktsegment, revenue_cents, n_items, n_orders""".stripMargin

  /** Cutoff date for [[shippingPriority]]: orders placed before it,
    * lines shipped after it — the "booked but not yet delivered" window,
    * mid-range at every fixture SF. */
  val PriorityDate: String = "1998-06-01 00:00:00"

  /** Top unshipped orders kept by [[shippingPriority]]. */
  val PriorityTopK: Int = 10

  /** The TPC-H Q3 shape — the top-[[PriorityTopK]] highest-revenue
    * orders from one market segment that were booked before
    * [[PriorityDate]] but still shipping after it. The canonical
    * 3-table selective star join: both date predicates and the segment
    * equality push into their scans (plan-audited), the dimension side
    * (customer, filtered) broadcasts, and the global top-k runs as
    * TakeOrderedAndProject — per-partition top-k then a k-row merge on
    * the driver, NEVER a single-partition global sort (the same reason
    * [[graft.ml.TopKAgg]] exists; `orderBy.limit` is the built-in that
    * already does it right). Ties break on o_orderkey for determinism.
    *
    * Scale shape: lineitem scan (filtered) ⋈ shuffle on orderkey with
    * the filtered orders ⋈ broadcast customer, one partial-agg shuffle
    * to ≤|qualifying orders| groups, then the k-row merge. At 100 TB
    * the orders side co-partitions on the join key; nothing here sorts
    * the corpus. */
  def shippingPriority(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, k: Int = PriorityTopK): DataFrame =
    lineitem.filter(col("l_shipdate") > to_timestamp(lit(PriorityDate)))
      .select(col("l_orderkey"), revCents.as("cents"))
      .join(orders.filter(col("o_orderdate") < to_timestamp(lit(PriorityDate)))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("cents")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey").asc)
      .limit(k)

  /** Oracle twin of [[shippingPriority]]. */
  def shippingPrioritySql(k: Int = PriorityTopK): String =
    s"""WITH top AS (
       |  SELECT l_orderkey,
       |    CAST(sum($revCentsSql) AS BIGINT) AS revenue_cents
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  WHERE l_shipdate > TIMESTAMP '$PriorityDate'
       |    AND o_orderdate < TIMESTAMP '$PriorityDate'
       |    AND c_mktsegment = 'BUILDING'
       |  GROUP BY l_orderkey
       |  ORDER BY revenue_cents DESC, l_orderkey
       |  LIMIT $k
       |)
       |SELECT l_orderkey, revenue_cents FROM top
       |ORDER BY l_orderkey, revenue_cents""".stripMargin

  /** Top customers kept by [[returnedRevenue]]. */
  val ReturnedTopK: Int = 20

  /** The TPC-H Q10 shape — the customers who returned the most revenue
    * in one order quarter: returned lines (`l_returnflag = 'R'` — pushed
    * to the lineitem scan) joined through their quarter's orders to the
    * customer dim, rolled up per customer, global top-[[ReturnedTopK]]
    * as TakeOrderedAndProject (the [[shippingPriority]] merge shape,
    * ties on c_custkey). The churn-triage report every returns desk
    * runs; the third selective star completing the Q1/Q3/Q4/Q5 set.
    *
    * Scale shape: filtered lineitem ⋈ filtered orders on orderkey (one
    * shuffle), custkey rollup (one partial-agg shuffle), then the
    * customer-dim attach runs on the ≤|customers| aggregate relation —
    * joining the dim AFTER the rollup, not before, keeps the fact-side
    * shuffle rows narrow (orderkey+cents, no names riding through). */
  def returnedRevenue(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, k: Int = ReturnedTopK): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revCents.as("cents"))
      .join(orders.filter(col("o_orderdate") >= to_timestamp(lit("1999-10-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("2000-01-01 00:00:00")))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(col("cents")).as("revenue_cents"))
      // top-k BEFORE the dim attach, mirroring the oracle's `top` CTE:
      // the inner join then rides on exactly k rows, and a custkey
      // missing from the customer dim can never shift which k survive.
      .orderBy(col("revenue_cents").desc, col("c_custkey").asc)
      .limit(k)
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        Seq("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("revenue_cents"))

  /** Oracle twin of [[returnedRevenue]]. */
  def returnedRevenueSql(k: Int = ReturnedTopK): String =
    s"""WITH top AS (
       |  SELECT o_custkey AS c_custkey,
       |    CAST(sum($revCentsSql) AS BIGINT) AS revenue_cents
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_returnflag = 'R'
       |    AND o_orderdate >= TIMESTAMP '1999-10-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
       |  GROUP BY o_custkey
       |  ORDER BY revenue_cents DESC, c_custkey
       |  LIMIT $k
       |)
       |SELECT c_custkey, c_name, c_mktsegment, revenue_cents
       |FROM top JOIN customer USING (c_custkey)
       |ORDER BY c_custkey, c_name, c_mktsegment, revenue_cents""".stripMargin

  /** The TPC-H Q5 shape — revenue by nation from orders where the
    * customer and the line's supplier sit in the SAME nation, for one
    * region and a one-year order window. The canonical 6-table star:
    * the c_nationkey = s_nationkey equality is the interesting join
    * condition (locality, not a key-to-key edge), expressed here by
    * routing both sides through their broadcast nation dims and
    * equating the keys. Constant-size dims (nation, region) broadcast
    * always; supplier broadcasts at fixture scale and degrades to a
    * shuffle join on its key automatically when it outgrows the
    * threshold.
    *
    * Scale shape: ONE shuffle each for lineitem⋈orders (orderkey) and
    * the custkey attach; everything else broadcast; final partial-agg
    * rollup to ≤|nations| rows. */
  def localSupplierVolume(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_suppkey"), revCents.as("cents"))
      .join(orders.filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("2000-01-01 00:00:00")))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("cents")).as("revenue_cents"))

  /** Oracle twin of [[localSupplierVolume]]. */
  def localSupplierVolumeSql: String =
    s"""SELECT n_name,
       |  CAST(sum($revCentsSql) AS BIGINT) AS revenue_cents
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
       |  AND r_name = 'ASIA'
       |GROUP BY n_name
       |ORDER BY n_name, revenue_cents""".stripMargin
}
