package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.relational.Timeline

class TimelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // (orderkey, custkey, totalprice, orderdate)
  private def orders(rows: (Long, Long, Double, java.sql.Timestamp)*) =
    rows.toSeq.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")

  test("revenueMonthly golden: cells, exact cents, distinct customers") {
    val out = Timeline.revenueMonthly(orders(
        (1L, 1L, 100.0, ts("1999-01-10 00:00:00")),
        (2L, 1L, 50.0, ts("1999-01-20 00:00:00")),
        (3L, 2L, 25.5, ts("1999-02-01 00:00:00"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_orders"), r.getAs[Long]("revenue_cents"),
          r.getAs[Long]("n_customers")))).toMap
    assert(out((1999L, 1L)) === ((2L, 15000L, 1L)))
    assert(out((1999L, 2L)) === ((1L, 2550L, 1L)))
    assert(out.size === 2)
  }

  test("revenueTrend: lag, negative growth truncates toward zero, ma3 floor-average") {
    // months: 300c, 100c, 250c → growths: null, -(200e6 div 300)=-666666
    // (floor would say -666667), +150e6 div 100 = 1500000;
    // ma3: 300, 200, 216 (650 div 3)
    val out = Timeline.revenueTrend(orders(
        (1L, 1L, 3.0, ts("1999-01-10 00:00:00")),
        (2L, 1L, 1.0, ts("1999-02-10 00:00:00")),
        (3L, 1L, 2.5, ts("1999-03-10 00:00:00"))))
      .orderBy("o_year", "o_month").collect()
    assert(out.map(_.getAs[Long]("revenue_cents")).toSeq === Seq(300L, 100L, 250L))
    assert(out(0).isNullAt(out(0).fieldIndex("growth_millionths")))
    assert(out(1).getAs[Long]("growth_millionths") === -666666L)
    assert(out(2).getAs[Long]("growth_millionths") === 1500000L)
    assert(out.map(_.getAs[Long]("ma3_cents")).toSeq === Seq(300L, 200L, 216L))
  }

  test("customerRfm: band edges are inclusive; composite score composes") {
    // cust 1: last order exactly AnchorDay-365 → r_days=365 → r_bucket 4;
    // 13 orders → f_bucket 4; total ≥ 3e8 cents → m_bucket 4 → score 444.
    // cust 2: one tiny ancient order → 1/1/1 → 111.
    val day365 = java.time.LocalDate.ofEpochDay(Timeline.AnchorDay - 365)
    val manyOrders = (1 to 13).map(i =>
      (100L + i, 1L, 250000.0, ts(s"$day365 00:00:00")))
    val out = Timeline.customerRfm(orders(
        manyOrders :+ (999L, 2L, 0.01, ts("1995-01-01 00:00:00")): _*))
      .collect().map(r => r.getAs[Long]("c_custkey") ->
        ((r.getAs[Long]("r_days"), r.getAs[Long]("f_orders"),
          r.getAs[Long]("m_cents"), r.getAs[Long]("rfm_score")))).toMap
    assert(out(1L)._1 === 365L)
    assert(out(1L)._2 === 13L)
    assert(out(1L)._3 === 13L * 25000000L)
    assert(out(1L)._4 === 444L)
    assert(out(2L)._4 === 111L)
  }

  test("revenueMonthlyCells streams: complete-mode micro-batches equal the batch rollup") {
    // the relational family's stream face — pinned against the batch
    // build across two triggers that OVERLAP on a month, so the second
    // trigger must revise a live cell, not just append one
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val b1 = Seq((1L, 1L, 100.0, "1999-01-10 00:00:00"),
      (2L, 2L, 50.0, "1999-02-10 00:00:00"))
    val b2 = Seq((3L, 1L, 25.5, "1999-02-20 00:00:00"),
      (4L, 3L, 10.0, "1999-03-01 00:00:00"))
    val src = MemoryStream[(Long, Long, Double, String)]
    val name = s"rev_cells_${System.nanoTime()}"
    val q = Timeline.revenueMonthlyCells(
        src.toDF().toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
          .withColumn("o_orderdate",
            org.apache.spark.sql.functions.to_timestamp($"d")))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      src.addData(b1: _*)
      q.processAllAvailable()
      src.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table(name).collect().map(_.toSeq).toSet
    val batch = Timeline.revenueMonthlyCells(
        orders((b1 ++ b2).map { case (ok, ck, p, d) => (ok, ck, p, ts(d)) }: _*))
      .collect().map(_.toSeq).toSet
    assert(live === batch)
    // and the overlapped February cell really aggregates across triggers
    assert(live.exists(s => s(0) == 1999L && s(1) == 2L && s(2) == 2L))
  }

  test("shipLatencyQuartiles golden: percentile-disc lower semantics, p95 pick") {
    // one priority, 20 lines with latencies 1..20 days → p25=5, p50=10,
    // p75=15, p95=19 (smallest v with 20·cum ≥ 19·total), min=1, max=20
    val ord = Seq((1L, "1-URGENT",
      java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = (1 to 20).map(d =>
        (1L, java.sql.Timestamp.valueOf(f"1999-01-${1 + d}%02d 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
    val out = Timeline.shipLatencyQuartiles(li, ord).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_lines") === 20L)
    assert(r.getAs[Long]("min_days") === 1L)
    assert(r.getAs[Long]("p25_days") === 5L)
    assert(r.getAs[Long]("p50_days") === 10L)
    assert(r.getAs[Long]("p75_days") === 15L)
    assert(r.getAs[Long]("p95_days") === 19L)
    assert(r.getAs[Long]("max_days") === 20L)
  }

  test("revenueRunning: cumulative per customer, same-day ties break on orderkey") {
    val d = ts("1999-01-10 00:00:00")
    val out = Timeline.revenueRunning(orders(
        (2L, 1L, 2.0, d), (1L, 1L, 1.0, d), (3L, 2L, 5.0, d)))
      .collect().map(r => r.getAs[Long]("o_orderkey") ->
        ((r.getAs[Long]("cum_cents"), r.getAs[Long]("order_idx")))).toMap
    assert(out(1L) === ((100L, 1L)))   // orderkey 1 first despite same day
    assert(out(2L) === ((300L, 2L)))
    assert(out(3L) === ((500L, 1L)))
  }
}
