package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.relational.{Sales, Warehouse}

class WarehouseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val d = java.sql.Timestamp.valueOf("1999-01-01 00:00:00")

  test("referentialAudit: orphan counts and exact millionth rates per edge") {
    val lineitem = Seq((1L, 10L), (2L, 10L), (3L, 99L), (4L, 98L))
      .toDF("l_orderkey", "l_partkey")
    val orders = Seq((1L, 7L), (2L, 7L), (5L, 8L)).toDF("o_orderkey", "o_custkey")
    val customer = Seq(Tuple1(7L)).toDF("c_custkey")
    val part = Seq(Tuple1(10L)).toDF("p_partkey")
    val out = Warehouse.referentialAudit(lineitem, orders, customer, part)
      .collect().map(r => r.getAs[String]("rel") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_orphans"),
          r.getAs[Long]("orphan_millionths")))).toMap
    // lineitem 3,4 have no order → 2/4 orphans = 500000 millionths
    assert(out("lineitem->orders") === ((4L, 2L, 500000L)))
    // parts 99, 98 missing → 2/4
    assert(out("lineitem->part") === ((4L, 2L, 500000L)))
    // custkey 8 missing → 1/3 = 333333 (div floors the positive)
    assert(out("orders->customer") === ((3L, 1L, 333333L)))
  }

  test("audit hardening: duplicate parent keys don't inflate, empty child rates 0") {
    // orders carries orderkey 1 TWICE — membership probe semantics:
    // lineitem->orders must still report 4 child rows, not 5
    val lineitem = Seq((1L, 10L), (2L, 10L), (3L, 99L), (4L, 98L))
      .toDF("l_orderkey", "l_partkey")
    val orders = Seq((1L, 7L), (1L, 7L), (2L, 7L), (5L, 8L))
      .toDF("o_orderkey", "o_custkey")
    val customer = Seq(Tuple1(7L)).toDF("c_custkey")
    val part = Seq(Tuple1(10L)).toDF("p_partkey")
    val out = Warehouse.referentialAudit(lineitem, orders, customer, part)
      .collect().map(r => r.getAs[String]("rel") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_orphans"),
          r.getAs[Long]("orphan_millionths")))).toMap
    assert(out("lineitem->orders") === ((4L, 2L, 500000L)))
    // and the gate face: 4 child rows in, 4 verdicts out despite the dup
    val gated = Warehouse.orphanGate(lineitem, "l_orderkey",
      orders, "o_orderkey")
    assert(gated.count() === 4L)
    // empty child snapshot: rate is 0, never NULL (guarded division)
    val empty = lineitem.filter($"l_orderkey" < 0L)
    val audit0 = Warehouse.referentialAudit(empty, orders, customer, part)
      .collect().map(r => r.getAs[String]("rel") ->
        r.getAs[Long]("orphan_millionths")).toMap
    assert(audit0("lineitem->orders") === 0L)
    assert(audit0("lineitem->part") === 0L)
  }

  test("orphanGate streams: per-row verdicts across triggers equal the batch flags") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val parent = Seq(Tuple1(10L), Tuple1(11L)).toDF("o_orderkey")
    val b1 = Seq((1L, 10L), (2L, 99L))
    val b2 = Seq((3L, 11L), (4L, 98L))
    val src = MemoryStream[(Long, Long)]
    val name = s"orphan_gate_${System.nanoTime()}"
    val q = Warehouse.orphanGate(
        src.toDF().toDF("line_id", "l_orderkey"), "l_orderkey",
        parent, "o_orderkey")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      src.addData(b1: _*)
      q.processAllAvailable()
      src.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table(name).collect()
      .map(r => r.getAs[Long]("line_id") -> r.getAs[Boolean]("ref_ok")).toMap
    val batch = Warehouse.orphanGate(
        (b1 ++ b2).toDF("line_id", "l_orderkey"), "l_orderkey",
        parent, "o_orderkey")
      .collect()
      .map(r => r.getAs[Long]("line_id") -> r.getAs[Boolean]("ref_ok")).toMap
    assert(live === batch)
    assert(live === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("incrementalRollup: stored ⊕ batch equals the whole-fact rollup on every cell") {
    val region = Seq((0, "AMERICA"), (1, "ASIA")).toDF("r_regionkey", "r_name")
    val nation = Seq((0, "US", 0), (1, "JP", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((10L, "s10", 0), (11L, "s11", 1))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    def li(rows: (Long, Long, Double, Double)*) =
      rows.toSeq.map { case (ok, sk, p, disc) => (ok, sk, p, disc, d) }
        .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
          "l_shipdate")
    val whole = li((1L, 10L, 100.0, 0.1), (2L, 11L, 50.0, 0.0),
      (9L, 11L, 25.5, 0.0), (19L, 10L, 10.0, 0.0))
    val stored = whole.filter($"l_orderkey" % 10 =!= 9)
    val batch = whole.filter($"l_orderkey" % 10 === 9)
    val merged = Warehouse.incrementalRollup(stored, batch,
      supplier, nation, region)
    val direct = Sales.salesRollup(whole, supplier, nation, region)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (Option(r.getAs[String]("r_name")),
        Option(r.getAs[String]("n_name")), r.getAs[Long]("lvl")) ->
        ((r.getAs[Long]("n_items"), r.getAs[Long]("revenue_cents")))).toMap
    assert(key(merged) === key(direct))
    // and the batch really contributed (the split is not degenerate)
    assert(batch.count() === 2L)
  }
}
