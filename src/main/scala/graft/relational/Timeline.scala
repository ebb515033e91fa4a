package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over the orders fact — the calendar-rollup /
  * trend / cohort-scoring family every revenue dashboard runs next to
  * the star-schema queries in [[Sales]]. Everything keeps the
  * engine-wide exact discipline: money is integer cents via
  * `floor(x·100 + 0.5)`, rates and growth are exact integer millionths
  * via `div`, and days are integer epoch-days via
  * `unix_micros(ts) div 86_400_000_000` — both engines run the
  * identical int64 ops, so the oracles hash-match bit-for-bit.
  *
  * Scale shape, shared by the family: the fact collapses FIRST — one
  * partial-agg shuffle to calendar cells or per-customer rollups —
  * and every window then runs over the collapsed relation. The only
  * unpartitioned (single-partition) window in the family is
  * [[revenueTrend]]'s lag/frame pass, and its input is the MONTHLY
  * cell relation: ≤ 12·|years| rows at ANY corpus size (the
  * [[graft.text.TextAnalysis.lengthQuartiles]] bounded-relation
  * discipline — nothing corpus-sized is ever globally sorted).
  * [[revenueRunning]]'s cumulative window partitions by customer and
  * scales with the key space.
  */
object Timeline {

  /** Exact integer cents of an order's total — the engine-wide money
    * discipline on `o_totalprice`. */
  private val ordCents: Column =
    floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
  private[relational] val ordCentsSql =
    "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"

  /** Monthly revenue cells: per (year, month) of the order date —
    * order count, exact revenue cents, and the distinct buying
    * customers. The calendar rollup every finance view starts from.
    *
    * Scale shape: one partial-agg shuffle to ≤ 12·|years| cells; the
    * distinct-customer count rides Spark's two-phase distinct
    * expansion on the same shuffle keys (never a full-row distinct). */
  def revenueMonthly(orders: DataFrame): DataFrame =
    orders.select(year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        ordCents.as("cents"), col("o_custkey"))
      .groupBy(col("o_year"), col("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("cents")).as("revenue_cents"),
        countDistinct(col("o_custkey")).as("n_customers"))

  /** The STREAM face of [[revenueMonthly]]: the same calendar cells
    * minus the distinct-customer count — counts and sums are
    * streamable aggregates (bounded per-cell state, complete/update
    * mode), while an EXACT distinct is not (its state is per
    * (cell, customer), unbounded in the key space); a live dashboard
    * pairs these cells with the KMV/HLL sketch family
    * ([[graft.events.Events.hourlyUserSketches]] is the discipline)
    * when it needs live uniques. Batch-equivalence across triggers is
    * spec-pinned (the mixture-inventory stream-face contract). */
  def revenueMonthlyCells(orders: DataFrame): DataFrame =
    orders.select(year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        ordCents.as("cents"))
      .groupBy(col("o_year"), col("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("cents")).as("revenue_cents"))

  /** Oracle twin of [[revenueMonthly]]. */
  def revenueMonthlySql: String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
       |  CAST(count(*) AS BIGINT) AS n_orders,
       |  CAST(sum($ordCentsSql) AS BIGINT) AS revenue_cents,
       |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
       |FROM orders
       |GROUP BY 1, 2
       |ORDER BY o_year, o_month, n_orders, revenue_cents, n_customers""".stripMargin

  /** Month-over-month trend over the [[revenueMonthly]] cells: previous
    * month's cents (lag), the delta, exact growth millionths (NULL on
    * the first month), and the trailing-3-month floor-average (frame
    * sum div frame count — both exact int64). The lag/frame window
    * orders the WHOLE cell relation, which is safe precisely because
    * that relation is calendar-bounded (≤ 12·|years| rows forever — see
    * the object doc); the same spelling over a per-key series would
    * partition by the key first.
    *
    * Growth is sign-factored — `±((|delta|·10⁶) div prev)` — because
    * the two engines' bare integer divisions DISAGREE on negatives
    * (Spark `div` truncates toward zero, DuckDB `//` floors toward
    * −∞); dividing the magnitude and reapplying the sign pins both to
    * round-toward-zero. */
  def revenueTrend(orders: DataFrame): DataFrame = {
    val w = Window.orderBy(col("o_year"), col("o_month"))
    val w3 = w.rowsBetween(-2, Window.currentRow)
    revenueMonthly(orders)
      .select(col("o_year"), col("o_month"), col("revenue_cents"))
      .withColumn("prev_cents", lag(col("revenue_cents"), 1).over(w))
      .withColumn("delta_cents", col("revenue_cents") - col("prev_cents"))
      .withColumn("growth_millionths",
        when(col("prev_cents").isNull || col("prev_cents") === 0,
          lit(null).cast("long"))
          .when(col("delta_cents") < 0,
            -expr("(abs(delta_cents) * 1000000L) div prev_cents"))
          .otherwise(expr("(delta_cents * 1000000L) div prev_cents")))
      .withColumn("sum3", sum(col("revenue_cents")).over(w3))
      .withColumn("cnt3", count(lit(1)).over(w3))
      .withColumn("ma3_cents", expr("sum3 div cnt3"))
      .drop("sum3", "cnt3")
  }

  /** Oracle twin of [[revenueTrend]]. */
  def revenueTrendSql: String =
    s"""WITH cells AS (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    CAST(month(o_orderdate) AS BIGINT) AS o_month,
       |    CAST(sum($ordCentsSql) AS BIGINT) AS revenue_cents
       |  FROM orders GROUP BY 1, 2
       |), t AS (
       |  SELECT o_year, o_month, revenue_cents,
       |    lag(revenue_cents, 1) OVER w AS prev_cents,
       |    CAST((sum(revenue_cents) OVER f) // (count(*) OVER f)
       |      AS BIGINT) AS ma3_cents
       |  FROM cells
       |  WINDOW w AS (ORDER BY o_year, o_month),
       |    f AS (ORDER BY o_year, o_month
       |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       |)
       |SELECT o_year, o_month, revenue_cents, prev_cents,
       |  revenue_cents - prev_cents AS delta_cents,
       |  CASE WHEN prev_cents IS NULL OR prev_cents = 0 THEN NULL
       |    WHEN revenue_cents - prev_cents < 0
       |      THEN -((abs(revenue_cents - prev_cents) * 1000000) // prev_cents)
       |    ELSE ((revenue_cents - prev_cents) * 1000000) // prev_cents
       |  END AS growth_millionths,
       |  ma3_cents
       |FROM t
       |ORDER BY o_year, o_month, revenue_cents, prev_cents, delta_cents,
       |  growth_millionths, ma3_cents""".stripMargin

  /** Scoring anchor for [[customerRfm]] recency: 2002-01-01 as epoch
    * days — strictly after every fixture order date, embedded as the
    * SAME literal in both engines. */
  val AnchorDay: Long = 11688L

  /** RFM band edges — FIXED business thresholds (the
    * [[graft.graph.GraphPatterns]] degree-histogram exact-CASE-ladder
    * discipline), not data-driven quantiles: fixed bands are a pure
    * projection after the per-customer rollup — scale-free, exactly
    * reproducible, and stable across corpus snapshots (a marketing
    * mart's usual choice). When bands must be data-driven, the
    * value-histogram + prefix-sum spelling of
    * [[graft.text.TextAnalysis.lengthQuartiles]] computes exact
    * quartile thresholds without ever sorting the corpus; a global
    * `ntile` window would be the one spelling that cannot scale (it
    * funnels every customer through one partition). */
  val RDays: (Int, Int, Int) = (365, 730, 1095)
  val FOrders: (Int, Int, Int) = (13, 10, 8)
  val MCents: (Long, Long, Long) = (300000000L, 240000000L, 180000000L)

  /** Per-customer RFM scoring over orders: recency in exact epoch-days
    * from [[AnchorDay]], frequency (order count), monetary (exact total
    * cents), the three 1–4 band scores from the fixed ladders, and the
    * composite `rfm_score = 100·r + 10·f + m`.
    *
    * Scale shape: one per-customer partial-agg shuffle, then a pure
    * projection — no window, no sort, nothing global. */
  def customerRfm(orders: DataFrame): DataFrame = {
    def ladder(c: Column, hi: Column => Column,
        b4: Column, b3: Column, b2: Column): Column =
      when(hi(b4), lit(4L)).when(hi(b3), lit(3L)).when(hi(b2), lit(2L))
        .otherwise(lit(1L))
    val r = ladder(col("r_days"), b => col("r_days") <= b,
      lit(RDays._1), lit(RDays._2), lit(RDays._3))
    val f = ladder(col("f_orders"), b => col("f_orders") >= b,
      lit(FOrders._1), lit(FOrders._2), lit(FOrders._3))
    val m = ladder(col("m_cents"), b => col("m_cents") >= b,
      lit(MCents._1), lit(MCents._2), lit(MCents._3))
    // o_orderdate ships as TIMESTAMP_NTZ — datediff against the epoch
    // DATE is the timezone-free day count both engines agree on
    // (unix_micros would reject the NTZ type outright)
    orders.select(col("o_custkey").as("c_custkey"),
        expr("cast(datediff(o_orderdate, DATE '1970-01-01') as bigint)")
          .as("day"),
        ordCents.as("cents"))
      .groupBy(col("c_custkey"))
      .agg(max(col("day")).as("last_day"),
        count(lit(1)).as("f_orders"),
        sum(col("cents")).as("m_cents"))
      .select(col("c_custkey"),
        (lit(AnchorDay) - col("last_day")).as("r_days"),
        col("f_orders"), col("m_cents"))
      .withColumn("r_bucket", r)
      .withColumn("f_bucket", f)
      .withColumn("m_bucket", m)
      .withColumn("rfm_score",
        col("r_bucket") * 100L + col("f_bucket") * 10L + col("m_bucket"))
  }

  /** Oracle twin of [[customerRfm]]. */
  def customerRfmSql: String = {
    def lad(v: String, op: String, b4: Long, b3: Long, b2: Long) =
      s"""CASE WHEN $v $op $b4 THEN 4 WHEN $v $op $b3 THEN 3
         |    WHEN $v $op $b2 THEN 2 ELSE 1 END""".stripMargin
    s"""WITH per_c AS (
       |  SELECT o_custkey AS c_custkey,
       |    CAST(max(date_diff('day', DATE '1970-01-01',
       |      CAST(o_orderdate AS DATE))) AS BIGINT) AS last_day,
       |    CAST(count(*) AS BIGINT) AS f_orders,
       |    CAST(sum($ordCentsSql) AS BIGINT) AS m_cents
       |  FROM orders GROUP BY o_custkey
       |), scored AS (
       |  SELECT c_custkey, $AnchorDay - last_day AS r_days, f_orders, m_cents
       |  FROM per_c
       |), banded AS (
       |  SELECT c_custkey, r_days, f_orders, m_cents,
       |    CAST(${lad("r_days", "<=", RDays._1, RDays._2, RDays._3)} AS BIGINT) AS r_bucket,
       |    CAST(${lad("f_orders", ">=", FOrders._1, FOrders._2, FOrders._3)} AS BIGINT) AS f_bucket,
       |    CAST(${lad("m_cents", ">=", MCents._1, MCents._2, MCents._3)} AS BIGINT) AS m_bucket
       |  FROM scored
       |)
       |SELECT c_custkey, r_days, f_orders, m_cents, r_bucket, f_bucket,
       |  m_bucket, r_bucket * 100 + f_bucket * 10 + m_bucket AS rfm_score
       |FROM banded
       |ORDER BY c_custkey, r_days, f_orders, m_cents, r_bucket, f_bucket,
       |  m_bucket, rfm_score""".stripMargin
  }

  /** Order→ship latency percentiles per order priority — the
    * fulfillment-latency report (p25/p50/p75/p95 plus min/max of the
    * days between order date and each line's ship date), spelled as
    * [[graft.text.TextAnalysis.lengthQuartiles]]' exact value-histogram
    * + prefix sums, NOT an engine percentile function: "smallest v with
    * k·cum(v) ≥ q·total" is pure int64 and both engines agree exactly
    * (p95 uses 20·cum ≥ 19·total on the same cells).
    *
    * Scale shape: one orderkey-keyed fact⋈fact shuffle (the same
    * co-partitioning the star joins pay — bucketed layout makes it
    * free, SalesLayoutSpec), then the corpus collapses to
    * (priority, latency-day) cells — a relation bounded by
    * |priorities| × |distinct day latencies| (a few thousand at ANY
    * corpus size; day-granular latency is what makes the exact
    * spelling scale-free). The cumulative window and the picks run
    * over that bounded relation only. */
  def shipLatencyQuartiles(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val cells = lineitem
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        expr("cast(datediff(l_shipdate, o_orderdate) as bigint)").as("v"))
      .groupBy(col("o_orderpriority"), col("v"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("o_orderpriority").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("o_orderpriority")
    cells
      .withColumn("cum", sum("n").over(wCum))
      .withColumn("total", sum("n").over(wAll))
      .groupBy("o_orderpriority").agg(
        max("total").as("n_lines"),
        min("v").as("min_days"),
        min(when(col("cum") * 4 >= col("total"), col("v"))).as("p25_days"),
        min(when(col("cum") * 2 >= col("total"), col("v"))).as("p50_days"),
        min(when(col("cum") * 4 >= col("total") * 3, col("v"))).as("p75_days"),
        min(when(col("cum") * 20 >= col("total") * 19, col("v"))).as("p95_days"),
        max("v").as("max_days"))
      .select(col("o_orderpriority"), col("n_lines"), col("min_days"),
        col("p25_days"), col("p50_days"), col("p75_days"), col("p95_days"),
        col("max_days"))
  }

  /** Oracle twin of [[shipLatencyQuartiles]]. */
  def shipLatencyQuartilesSql: String =
    s"""WITH cells AS (
       |  SELECT o_orderpriority,
       |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
       |      CAST(l_shipdate AS DATE)) AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2
       |), c AS (
       |  SELECT o_orderpriority, v, n,
       |    CAST(sum(n) OVER (PARTITION BY o_orderpriority ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(sum(n) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS total
       |  FROM cells
       |)
       |SELECT o_orderpriority,
       |  max(total) AS n_lines,
       |  min(v) AS min_days,
       |  min(CASE WHEN cum * 4 >= total THEN v END) AS p25_days,
       |  min(CASE WHEN cum * 2 >= total THEN v END) AS p50_days,
       |  min(CASE WHEN cum * 4 >= total * 3 THEN v END) AS p75_days,
       |  min(CASE WHEN cum * 20 >= total * 19 THEN v END) AS p95_days,
       |  max(v) AS max_days
       |FROM c GROUP BY o_orderpriority
       |ORDER BY o_orderpriority, n_lines, min_days, p25_days, p50_days,
       |  p75_days, p95_days, max_days""".stripMargin

  /** Per-customer running revenue: each order's exact cents, the
    * cumulative total, and the order's 1-based index in the customer's
    * history — the lifetime-value curve at order grain. Ordering is
    * (o_orderdate, o_orderkey): the key tie-break makes the cumulative
    * sums deterministic even with same-day orders (the engine-wide
    * requirement for an oracle-gated window).
    *
    * Scale shape: ONE window pass partitioned by customer — each
    * customer's history sorts inside its hash partition, no global
    * sort; output is order-grain (same cardinality as the input). */
  def revenueRunning(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), ordCents.as("order_cents"))
      .withColumn("cum_cents",
        sum(col("order_cents")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("order_idx", row_number().over(w).cast("long"))
      .select(col("o_orderkey"), col("o_custkey"), col("order_cents"),
        col("cum_cents"), col("order_idx"))
  }

  /** Oracle twin of [[revenueRunning]]. */
  def revenueRunningSql: String =
    s"""SELECT o_orderkey, o_custkey,
       |  $ordCentsSql AS order_cents,
       |  CAST(sum($ordCentsSql) OVER (PARTITION BY o_custkey
       |    ORDER BY o_orderdate, o_orderkey
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_cents,
       |  CAST(row_number() OVER (PARTITION BY o_custkey
       |    ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_idx
       |FROM orders
       |ORDER BY o_orderkey, o_custkey, order_cents, cum_cents, order_idx""".stripMargin
}
