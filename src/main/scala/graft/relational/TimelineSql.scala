package graft.relational

/** The time-series and maintenance families as SPARK SQL text — the
  * [[SalesSql]] discipline (plan-equality-pinned spellings over the
  * registered relational views) extended to [[Timeline]] and
  * [[Warehouse]]'s checkpoint-free operators. Each spelling is swept by
  * GraphSqlSpec: canonicalized physical-plan EQUALITY with the
  * DataFrame twin plus result agreement.
  *
  * Nested-projection spellings mirror what CollapseProject does to the
  * DSL's `withColumn` chains: a subquery per chain layer, so both
  * sides collapse to the same tree (the `corpus_histogram` lesson).
  */
object TimelineSql {

  import Timeline.ordCentsSql

  /** Spark-SQL twin of [[Timeline.revenueMonthly]]. */
  def revenueMonthlySparkSql: String =
    s"""SELECT o_year, o_month, count(1) AS n_orders,
       |  sum(cents) AS revenue_cents,
       |  count(DISTINCT o_custkey) AS n_customers
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    CAST(month(o_orderdate) AS BIGINT) AS o_month,
       |    $ordCentsSql AS cents, o_custkey
       |  FROM orders
       |)
       |GROUP BY o_year, o_month""".stripMargin

  /** Spark-SQL twin of [[Timeline.customerRfm]]. */
  def customerRfmSparkSql: String = {
    def lad(v: String, op: String, b: (Long, Long, Long)) =
      s"""CASE WHEN $v $op ${b._1}L THEN 4L WHEN $v $op ${b._2}L THEN 3L
         |      WHEN $v $op ${b._3}L THEN 2L ELSE 1L END""".stripMargin
    val r = lad("r_days", "<=",
      (Timeline.RDays._1.toLong, Timeline.RDays._2.toLong,
        Timeline.RDays._3.toLong))
    val f = lad("f_orders", ">=",
      (Timeline.FOrders._1.toLong, Timeline.FOrders._2.toLong,
        Timeline.FOrders._3.toLong))
    val m = lad("m_cents", ">=", Timeline.MCents)
    s"""SELECT c_custkey, r_days, f_orders, m_cents, r_bucket, f_bucket,
       |  m_bucket, r_bucket * 100L + f_bucket * 10L + m_bucket AS rfm_score
       |FROM (
       |  SELECT c_custkey, r_days, f_orders, m_cents,
       |    $r AS r_bucket,
       |    $f AS f_bucket,
       |    $m AS m_bucket
       |  FROM (
       |    SELECT c_custkey, ${Timeline.AnchorDay}L - last_day AS r_days,
       |      f_orders, m_cents
       |    FROM (
       |      SELECT c_custkey, max(day) AS last_day, count(1) AS f_orders,
       |        sum(cents) AS m_cents
       |      FROM (
       |        SELECT o_custkey AS c_custkey,
       |          cast(datediff(o_orderdate, DATE '1970-01-01') as bigint)
       |            AS day,
       |          $ordCentsSql AS cents
       |        FROM orders
       |      )
       |      GROUP BY c_custkey
       |    )
       |  )
       |)""".stripMargin
  }

  /** Spark-SQL twin of [[Timeline.revenueRunning]]. */
  def revenueRunningSparkSql: String =
    s"""SELECT o_orderkey, o_custkey, order_cents, cum_cents, order_idx
       |FROM (
       |  SELECT o_orderkey, o_custkey, o_orderdate, order_cents,
       |    sum(order_cents) OVER (PARTITION BY o_custkey
       |      ORDER BY o_orderdate, o_orderkey
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
       |    CAST(row_number() OVER (PARTITION BY o_custkey
       |      ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_idx
       |  FROM (
       |    SELECT o_orderkey, o_custkey, o_orderdate,
       |      $ordCentsSql AS order_cents
       |    FROM orders
       |  )
       |)""".stripMargin

  /** Spark-SQL twin of [[Warehouse.referentialAudit]]. */
  def referentialAuditSparkSql: String = {
    def edge(rel: String, childT: String, childK: String, parentT: String,
        parentK: String) =
      s"""SELECT '$rel' AS rel, n_rows, n_orphans,
         |  (n_orphans * 1000000L) div greatest(n_rows, 1L) AS orphan_millionths
         |FROM (
         |  SELECT count(1) AS n_rows,
         |    count(CASE WHEN $parentK IS NULL THEN 1 END) AS n_orphans
         |  FROM $childT
         |  LEFT JOIN (SELECT DISTINCT $parentK FROM $parentT) ON $childK = $parentK
         |)""".stripMargin
    s"""${edge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey")}
       |UNION ALL
       |${edge("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey")}
       |UNION ALL
       |${edge("orders->customer", "orders", "o_custkey", "customer", "c_custkey")}""".stripMargin
  }

  /** Spark-SQL twin of [[Timeline.shipLatencyQuartiles]] — one nested
    * select per WINDOW node (the cum and total windows have different
    * specs, so CollapseWindow keeps them separate in the DSL too). */
  def shipLatencyQuartilesSparkSql: String =
    s"""SELECT o_orderpriority,
       |  max(total) AS n_lines,
       |  min(v) AS min_days,
       |  min(CASE WHEN cum * 4 >= total THEN v END) AS p25_days,
       |  min(CASE WHEN cum * 2 >= total THEN v END) AS p50_days,
       |  min(CASE WHEN cum * 4 >= total * 3 THEN v END) AS p75_days,
       |  min(CASE WHEN cum * 20 >= total * 19 THEN v END) AS p95_days,
       |  max(v) AS max_days
       |FROM (
       |  SELECT o_orderpriority, v, n, cum,
       |    sum(n) OVER (PARTITION BY o_orderpriority) AS total
       |  FROM (
       |    SELECT o_orderpriority, v, n,
       |      sum(n) OVER (PARTITION BY o_orderpriority ORDER BY v
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM (
       |      SELECT o_orderpriority, v, count(1) AS n
       |      FROM (
       |        SELECT o_orderpriority,
       |          cast(datediff(l_shipdate, o_orderdate) as bigint) AS v
       |        FROM (
       |          SELECT l_orderkey, l_shipdate FROM lineitem
       |        )
       |        JOIN (
       |          SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders
       |        ) ON l_orderkey = o_orderkey
       |      )
       |      GROUP BY o_orderpriority, v
       |    )
       |  )
       |)
       |GROUP BY o_orderpriority""".stripMargin

  /** Spark-SQL twin of [[SkewJoin.saltedOrderRollup]]. */
  def saltedOrderRollupSparkSql: String =
    s"""SELECT l_orderkey, sum(pn) AS n_lines, sum(pc) AS order_cents
       |FROM (
       |  SELECT l_orderkey, _salt, count(1) AS pn, sum(cents) AS pc
       |  FROM (
       |    SELECT l_orderkey, cents,
       |      pmod(xxhash64(l_orderkey, cents), ${SkewJoin.Salts}) AS _salt
       |    FROM (
       |      SELECT l_orderkey, $revCentsLineSql AS cents FROM lineitem
       |    )
       |  )
       |  GROUP BY l_orderkey, _salt
       |)
       |GROUP BY l_orderkey""".stripMargin

  private val revCentsLineSql =
    "CAST(floor(l_extendedprice * (1.0D - l_discount) * 100.0D + 0.5D) AS BIGINT)"

  /** Spark-SQL twin of [[Timeline.revenueTrend]] — the layering mirrors
    * the DSL's WINDOW-node boundaries (lag first, then the projection
    * chain, then the frame pair in ONE select so CollapseWindow and the
    * single-layer spelling land on the same Window node), and the inner
    * relation is the FULL monthly rollup projected down, so column
    * pruning fires identically on both sides. */
  def revenueTrendSparkSql: String =
    s"""SELECT o_year, o_month, revenue_cents, prev_cents, delta_cents,
       |  growth_millionths, sum3 div cnt3 AS ma3_cents
       |FROM (
       |  SELECT o_year, o_month, revenue_cents, prev_cents, delta_cents,
       |    growth_millionths,
       |    sum(revenue_cents) OVER f AS sum3,
       |    count(1) OVER f AS cnt3
       |  FROM (
       |    SELECT o_year, o_month, revenue_cents, prev_cents, delta_cents,
       |      CASE WHEN prev_cents IS NULL OR prev_cents = 0L
       |          THEN CAST(NULL AS BIGINT)
       |        WHEN delta_cents < 0L
       |          THEN -((abs(delta_cents) * 1000000L) div prev_cents)
       |        ELSE (delta_cents * 1000000L) div prev_cents END
       |        AS growth_millionths
       |    FROM (
       |      SELECT o_year, o_month, revenue_cents, prev_cents,
       |        revenue_cents - prev_cents AS delta_cents
       |      FROM (
       |        SELECT o_year, o_month, revenue_cents,
       |          lag(revenue_cents, 1) OVER (ORDER BY o_year, o_month)
       |            AS prev_cents
       |        FROM (
       |          SELECT o_year, o_month, revenue_cents
       |          FROM (
       |            SELECT o_year, o_month, count(1) AS n_orders,
       |              sum(cents) AS revenue_cents,
       |              count(DISTINCT o_custkey) AS n_customers
       |            FROM (
       |              SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |                CAST(month(o_orderdate) AS BIGINT) AS o_month,
       |                $ordCentsSql AS cents, o_custkey
       |              FROM orders
       |            )
       |            GROUP BY o_year, o_month
       |          )
       |        )
       |      )
       |    )
       |  )
       |  WINDOW f AS (ORDER BY o_year, o_month
       |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       |)""".stripMargin
}
