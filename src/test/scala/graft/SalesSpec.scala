package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.relational.Sales

class SalesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val ts0 = java.sql.Timestamp.valueOf("1999-01-01 00:00:00")
  private val tsLate = java.sql.Timestamp.valueOf("2001-06-01 00:00:00")

  private def region = Seq((0, "AMERICA"), (1, "ASIA"))
    .toDF("r_regionkey", "r_name")
  private def nation = Seq((0, "US", 0), (1, "JP", 1))
    .toDF("n_nationkey", "n_name", "n_regionkey")
  private def supplier = Seq((10L, "s10", 0), (11L, "s11", 1), (12L, "s12", 1))
    .toDF("s_suppkey", "s_name", "s_nationkey")

  // (orderkey, suppkey, qty, extprice, discount, flag, status, shipdate)
  private def li(rows: (Long, Long, Double, Double, Double, String, String,
      java.sql.Timestamp)*) =
    rows.toSeq.toDF("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_returnflag", "l_linestatus", "l_shipdate")

  test("salesRollup golden: cells, region subtotals, grand total, exact cents") {
    // s10 (US/AMERICA): 100.00 at 10% = 9000c; s11 (JP/ASIA): 50.00 → 5000c,
    // s12 (JP/ASIA): 25.50 → 2550c
    val out = Sales.salesRollup(li(
        (1L, 10L, 1.0, 100.0, 0.10, "N", "O", ts0),
        (2L, 11L, 1.0, 50.0, 0.0, "N", "O", ts0),
        (3L, 12L, 1.0, 25.5, 0.0, "N", "O", ts0)),
        supplier, nation, region)
      .collect().map(r => (Option(r.getAs[String]("r_name")),
        Option(r.getAs[String]("n_name")), r.getAs[Long]("lvl")) ->
        ((r.getAs[Long]("n_items"), r.getAs[Long]("revenue_cents")))).toMap
    assert(out((Some("AMERICA"), Some("US"), 0L)) === ((1L, 9000L)))
    assert(out((Some("ASIA"), Some("JP"), 0L)) === ((2L, 7550L)))
    assert(out((Some("AMERICA"), None, 1L)) === ((1L, 9000L)))
    assert(out((Some("ASIA"), None, 1L)) === ((2L, 7550L)))
    assert(out((None, None, 3L)) === ((3L, 16550L)))
    assert(out.size === 5)
  }

  test("topSuppliersPerRegion: rank per region, key tie-break, top-k cut") {
    // ASIA: s11 3000c, s12 3000c (tie → s11 rk1 by key), plus nothing else;
    // AMERICA: s10 alone
    val out = Sales.topSuppliersPerRegion(li(
        (1L, 10L, 1.0, 10.0, 0.0, "N", "O", ts0),
        (2L, 11L, 1.0, 30.0, 0.0, "N", "O", ts0),
        (3L, 12L, 1.0, 30.0, 0.0, "N", "O", ts0)),
        supplier, nation, region, k = 1)
      .collect().map(r => r.getAs[String]("r_name") ->
        ((r.getAs[Long]("s_suppkey"), r.getAs[Long]("rk")))).toMap
    assert(out("AMERICA") === ((10L, 1L)))
    assert(out("ASIA") === ((11L, 1L)))
  }

  test("pricingSummary: cutoff filters rows; sums and millionths are exact") {
    val out = Sales.pricingSummary(li(
        (1L, 10L, 3.0, 10.0, 0.0, "N", "O", ts0),
        (2L, 10L, 5.0, 20.0, 0.5, "N", "O", ts0),
        (3L, 10L, 99.0, 999.0, 0.0, "N", "O", tsLate), // past cutoff: dropped
        (4L, 10L, 2.0, 10.0, 0.0, "R", "F", ts0)))
      .collect().map(r => (r.getAs[String]("l_returnflag"),
        r.getAs[String]("l_linestatus")) ->
        ((r.getAs[Long]("sum_qty"), r.getAs[Long]("sum_base_cents"),
          r.getAs[Long]("sum_disc_cents"), r.getAs[Long]("n_items"),
          r.getAs[Long]("avg_qty_millionths")))).toMap
    assert(out(("N", "O")) === ((8L, 3000L, 2000L, 2L, 4000000L)))
    assert(out(("R", "F")) === ((2L, 1000L, 1000L, 1L, 2000000L)))
    assert(out.size === 2)
  }

  test("lateOrderPriority: an order counts once however many late lines it has") {
    val orders = Seq(
      (1L, "1-URGENT", ts0), (2L, "1-URGENT", ts0), (3L, "5-LOW", ts0))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    // order 1: two late lines (one count); order 2: on-time; order 3: late
    val out = Sales.lateOrderPriority(orders, li(
        (1L, 10L, 1.0, 1.0, 0.0, "N", "O", tsLate),
        (1L, 10L, 1.0, 1.0, 0.0, "N", "O", tsLate),
        (2L, 10L, 1.0, 1.0, 0.0, "N", "O", ts0),
        (3L, 10L, 1.0, 1.0, 0.0, "N", "O", tsLate)))
      .collect().map(r => r.getAs[String]("o_orderpriority") ->
        r.getAs[Long]("n_orders")).toMap
    assert(out === Map("1-URGENT" -> 1L, "5-LOW" -> 1L))
  }

  test("brandRevenue golden: per-brand cents, quantities, item counts") {
    val part = Seq((1000L, "Brand#11"), (1001L, "Brand#22"))
      .toDF("p_partkey", "p_brand")
    val lineitem = Seq(
      (1L, 1000L, 2.0, 10.0, 0.0), (2L, 1000L, 3.0, 20.0, 0.5),
      (3L, 1001L, 1.0, 7.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount")
    val out = Sales.brandRevenue(lineitem, part)
      .collect().map(r => r.getAs[String]("p_brand") ->
        ((r.getAs[Long]("revenue_cents"), r.getAs[Long]("sum_qty"),
          r.getAs[Long]("n_items")))).toMap
    assert(out("Brand#11") === ((2000L, 5L, 2L)))
    assert(out("Brand#22") === ((700L, 1L, 1L)))
  }

  test("orderSizes golden: lines-per-order histogram covers every order once") {
    val out = Sales.orderSizes(li(
        (1L, 10L, 1.0, 1.0, 0.0, "N", "O", ts0),
        (1L, 10L, 1.0, 1.0, 0.0, "N", "O", ts0),
        (2L, 10L, 1.0, 1.0, 0.0, "N", "O", ts0),
        (3L, 10L, 1.0, 1.0, 0.0, "N", "O", ts0)))
      .collect().map(r => r.getAs[Long]("n_lines") ->
        r.getAs[Long]("n_orders")).toMap
    assert(out === Map(1L -> 2L, 2L -> 1L))
  }

  test("customersWithoutOrders: anti join per segment; ordering customers drop out") {
    val customer = Seq((1L, "BUILDING"), (2L, "BUILDING"), (3L, "MACHINERY"),
        (4L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq((100L, 1L), (101L, 1L), (102L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val out = Sales.customersWithoutOrders(customer, orders)
      .collect().map(r => r.getAs[String]("c_mktsegment") ->
        r.getAs[Long]("n_customers")).toMap
    assert(out === Map("BUILDING" -> 1L, "MACHINERY" -> 1L))
  }

  test("returnedRevenue: only R-flag lines in the quarter count; dim attaches after the rollup") {
    val tsQ = java.sql.Timestamp.valueOf("1999-11-15 00:00:00")
    val tsOut = java.sql.Timestamp.valueOf("1999-05-01 00:00:00")
    val orders = Seq((1L, 100L, tsQ), (2L, 101L, tsQ), (3L, 100L, tsOut))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val customer = Seq((100L, "c100", "BUILDING"), (101L, "c101", "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
    val out = Sales.returnedRevenue(li(
        (1L, 10L, 1.0, 10.0, 0.0, "R", "O", ts0),   // counts: 1000 cents
        (1L, 10L, 1.0, 5.0, 0.0, "N", "O", ts0),    // not returned
        (2L, 10L, 1.0, 2.0, 0.0, "R", "O", ts0),    // counts: 200 cents
        (3L, 10L, 1.0, 7.0, 0.0, "R", "O", ts0)),   // order outside quarter
        orders, customer, k = 10)
      .collect().map(r => (r.getAs[Long]("c_custkey"),
        r.getAs[String]("c_name"), r.getAs[String]("c_mktsegment"),
        r.getAs[Long]("revenue_cents")))
    assert(out.toSeq === Seq((100L, "c100", "BUILDING", 1000L),
      (101L, "c101", "MACHINERY", 200L)))
  }

  test("segmentRevenue: per-segment cents, item and DISTINCT order counts") {
    val orders = Seq((1L, 100L), (2L, 100L), (3L, 200L))
      .toDF("o_orderkey", "o_custkey")
    val customer = Seq((100L, "BUILDING"), (200L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val out = Sales.segmentRevenue(li(
        (1L, 10L, 1.0, 10.0, 0.0, "N", "O", ts0),
        (1L, 10L, 1.0, 5.0, 0.0, "N", "O", ts0),
        (2L, 10L, 1.0, 2.0, 0.0, "N", "O", ts0),
        (3L, 10L, 1.0, 7.0, 0.0, "N", "O", ts0)),
        orders, customer)
      .collect().map(r => r.getAs[String]("c_mktsegment") ->
        ((r.getAs[Long]("revenue_cents"), r.getAs[Long]("n_items"),
          r.getAs[Long]("n_orders")))).toMap
    assert(out("BUILDING") === ((1700L, 3L, 2L)))
    assert(out("MACHINERY") === ((700L, 1L, 1L)))
  }
}
